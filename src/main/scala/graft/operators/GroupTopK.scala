package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Generic per-group exact top-k — the scale-correct replacement for
  * `row_number().over(Window.partitionBy(group))` whenever only the k best
  * rows per group are wanted (best documents per language, best candidates
  * per query, k inspection samples per domain).
  *
  * The window formulation shuffles and SORTS the entire stream with
  * parallelism collapsed to the number of groups; this one runs the
  * bounded-heap [[graft.functions.TopKByScore]] aggregate instead: map-side
  * partial top-k in each partition, then ≤ k×partitions tiny
  * (score, id) rows shuffle per group. Same design as the multi-query ANN
  * path ([[Ann.bruteForceTopKJoin]]), exposed as a reusable operator.
  *
  * Determinism: exact top-k under the total order (score desc, id asc),
  * independent of input order and partitioning — so results are
  * oracle-checkable against a SQL `row_number` mirror. */
object GroupTopK {

  /** The k best ids per group by (`scoreCol` desc, `idCol` asc). Returns
    * one row per kept id: (groupCols*, rank, id, score), rank 1-based.
    * Rows with NULL score or id are skipped (never ranked).
    *
    * Precision contract: the score is compared (and returned) AS DOUBLE —
    * long/decimal scores keep exact ordering only up to 2^53; beyond that,
    * values closer than one double ulp tie and rank by id instead. Pre-scale
    * such scores (or rank on a transformed key) if that matters. */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String],
      scoreCol: String, idCol: String, k: Int): DataFrame = {
    require(groupCols.nonEmpty, "topKPerGroup needs at least one group column")
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(VectorFunctions.topKByScore(
        col(scoreCol).cast("double"), col(idCol).cast("long"), k).as("tk"))
    agged
      .select(groupCols.map(col) :+ posexplode(col("tk")).as(Seq("r", "e")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("r") + 1).cast("long").as("rank"),
        col("e.id").as(idCol),
        col("e.score").as(scoreCol)): _*)
  }

  /** Deterministic k-row sample PER GROUP: the k rows with the smallest
    * md5 key hash — reproducible across runs, engines, and partitionings
    * (the "show me k documents from every domain" pass, without a window
    * sort and without randomness). The 48-bit hash prefix is exact in
    * double, so heap ordering is bit-stable; ranked by (hash asc, id asc).
    * Returns (groupCols*, rank, id). */
  def hashSampleKPerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: String, k: Int): DataFrame = {
    val negHash: Column =
      -Dedup.md5Long48(col(idCol).cast("string").cast("binary")).cast("double")
    // collision-free temp name: a user column literally named __graft_neg_hash
    // must not be silently overwritten by the sampling key
    val hashCol = Utils.tempColumnName(df)
    topKPerGroup(df.withColumn(hashCol, negHash), groupCols, hashCol, idCol, k)
      .drop(hashCol)
  }
}
