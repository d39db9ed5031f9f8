package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-hygiene pass a training pipeline runs before
  * comparing or ingesting a table: per-column null counts and distinct
  * cardinalities in ONE aggregation job (Spark plans the multiple DISTINCT
  * aggregates with a single expand + shuffle; no per-column jobs). */
object Profile {

  /** (column, n_nulls, n_distinct) per column. `exact = false` swaps
    * `countDistinct` for HLL `approx_count_distinct` — the 100 TB setting;
    * exact is what makes the driver query oracle-checkable. */
  def columnProfile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val cols = df.columns.toSeq
    val exprs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"__nd_$c"))
    } :+ count(lit(1)).as("__total")
    val r = df.agg(exprs.head, exprs.tail: _*).first()
    import df.sparkSession.implicits._
    cols.map { c =>
      (c, r.getAs[Long]("__total") - r.getAs[Long](s"__nn_$c"), r.getAs[Long](s"__nd_$c"))
    }.toDF("column", "n_nulls", "n_distinct")
  }
}
