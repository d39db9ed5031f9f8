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

  /** Numeric distribution profile: per column, null count, min/max, and
    * DISCONTINUOUS percentiles — `percentile_disc` returns an order
    * statistic (an actual element of the column), so the result is exact
    * and engine-mirrorable; interpolated percentiles blend two doubles
    * with engine-specific operand order and are not. `exact = false`
    * swaps in `approx_percentile` (t-digest) — the 100 TB setting, where
    * a full sort per column is not on the table.
    *
    * Shape: the table unpivots to (column, v) pairs (`stack` — codegen'd,
    * keeps NULL values) and aggregates BY COLUMN NAME. A single global agg
    * would funnel every partial percentile state into ONE final reduce task
    * (`percentile_disc` keeps a value→count map per column, and merging the
    * per-partition partials of all columns ran single-threaded — it
    * dominated the sf0.1 profile query at ~13s); grouping by column name
    * computes each column's order statistics in its own task, cols-way
    * parallel, with identical results. Percentiles must map to distinct
    * integer percent labels (p25, p50, ...). */
  def numericProfile(df: DataFrame, cols: Seq[String],
      percentiles: Seq[Double] = Seq(0.25, 0.5, 0.75),
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val labels = percentiles.map(p => s"p${math.round(p * 100)}")
    require(labels.distinct.size == labels.size,
      s"percentiles must have distinct percent labels, got $labels")
    val stackExpr = s"stack(${cols.length}, " + cols.map(c =>
      s"'${c.replace("'", "''")}', CAST(`$c` AS DOUBLE)").mkString(", ") +
      ") AS (column, v)"
    val aggExprs = Seq(
      count(lit(1)).as("__total"),
      count(col("v")).as("__n"),
      min(col("v")).as("__min"),
      max(col("v")).as("__max")) ++
      percentiles.zipWithIndex.map { case (p, i) =>
        (if (exact) expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)")
        else expr(s"approx_percentile(v, $p)")).as(s"__p$i")
      }
    val byCol = df.selectExpr(stackExpr)
      .groupBy("column")
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect().map(r => r.getString(0) -> r).toMap
    // min/max/percentile aggregates return SQL NULL for an all-NULL (or
    // empty) column; getAs[Double] would silently unbox that to 0.0, so
    // read via isNullAt and emit a real null cell (the schema already
    // marks these fields nullable). An empty input produces no groups at
    // all — those columns get the same all-NULL row with zero counts.
    def numOrNull(r: org.apache.spark.sql.Row, name: String): Any = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) null else r.getDouble(i)
    }
    val rows = cols.map { c =>
      byCol.get(c) match {
        case Some(r) =>
          org.apache.spark.sql.Row.fromSeq(
            Seq(c, r.getAs[Long]("__total") - r.getAs[Long]("__n"),
              numOrNull(r, "__min"), numOrNull(r, "__max")) ++
              percentiles.indices.map(i => numOrNull(r, s"__p$i")))
        case None =>
          org.apache.spark.sql.Row.fromSeq(
            Seq(c, 0L, null, null) ++ percentiles.indices.map(_ => null))
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      Seq(
        org.apache.spark.sql.types.StructField("column",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_nulls",
          org.apache.spark.sql.types.LongType, nullable = false)) ++
        ("min" +: "max" +: labels).map(n =>
          org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.DoubleType)))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }
}
