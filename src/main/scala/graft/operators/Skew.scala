package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers for joins and aggregations at scale.
  *
  * AQE's skew-join splitting (on by default in Spark 4) handles most skew at
  * runtime; explicit salting remains necessary when one side has pathological
  * hot keys AND the other side must be replicated (e.g. a hot-key equi-join
  * where broadcast is too large). These helpers make that pattern a one-liner
  * instead of hand-rolled boilerplate.
  */
object Skew {

  /** Inner equi-join with `factor`-way salting: the left (skewed) side gets
    * a random salt in [0, factor); the right side is replicated `factor`
    * times via an exploded salt column, so every (key, salt) bucket joins
    * 1/factor of the hot key's rows. Output columns = left ++ right minus
    * duplicate keys, like a plain `join(right, keys)`. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      factor: Int = 8): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltCol = Utils.tempColumnName(left, right)
    val salted = left.withColumn(saltCol, (rand(seed = 42) * factor).cast("int"))
    val replicated = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ saltCol).drop(saltCol)
  }

  /** Two-phase (partial → final) aggregation for skewed group keys: first
    * aggregate on (key, salt), then re-aggregate on key. `partialAggs` maps
    * an input column to its partial aggregate; `finalAggs` merges partials.
    * For algebraic aggregates (sum/count/min/max) pass the same function
    * twice. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      factor: Int,
      partialAggs: Seq[(Column, String)],
      finalAggs: Seq[(String => Column, String)]): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltCol = Utils.tempColumnName(df)
    val salted = df.withColumn(saltCol, (rand(seed = 42) * factor).cast("int"))
    val partialCols = partialAggs.map { case (c, n) => c.as(n) }
    val partial = salted
      .groupBy((keys :+ saltCol).map(col): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val finalCols = finalAggs.map { case (f, n) => f(n).as(n) }
    partial.groupBy(keys.map(col): _*).agg(finalCols.head, finalCols.tail: _*)
  }
}
