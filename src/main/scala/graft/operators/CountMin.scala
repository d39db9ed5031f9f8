package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketch (Cormode & Muthukrishnan, J. Algorithms '05)
  * as a tiny mergeable relation, built with ordinary hash aggregation.
  *
  * The sketch is a `depth × width` grid of counters. Each token increments
  * one counter per row, chosen by the row's hash function; a point estimate
  * is the MINIMUM of the token's `depth` counters, which never
  * undercounts and overcounts by at most `e·N/width` with probability
  * `1 − e^−depth` (collision mass in a row is ≤ N/width in expectation).
  *
  * Spark shape: the counter grid IS a DataFrame of `(row, bucket, cnt)`
  * with at most `depth × width` rows. Building it is a single scan — the
  * `posexplode` fans each token to its `depth` (row, bucket) cells inside
  * one codegen stage, and the hash aggregate's map-side partial combine
  * collapses every task's output to ≤ `depth × width` rows before the
  * shuffle, so shuffle traffic is O(partitions · depth · width) regardless
  * of data volume — the property that makes the sketch a 100 TB operator
  * (and trivially mergeable: sketches of two corpora merge by summing
  * matching cells, proven in CountMinSpec). Point estimation broadcasts
  * the grid (a few thousand rows) to the key side, so an estimate over any
  * key set is one broadcast hash join + a `min` aggregate.
  *
  * The hash family is the portable md5 pair family
  * ([[Dedup.md5HashPair]]): row `i` maps a token with hash
  * `(a + (i+1)·b) mod width`, where `a`/`b` are 48-bit longs from one md5
  * digest — exact integer arithmetic any engine reproduces bit-for-bit,
  * which is what lets a probabilistic data structure be hash-checked
  * against a DuckDB mirror (q_sketch_countmin): not "approximately right"
  * but the identical grid and the identical estimates.
  *
  * Complements [[HeavyHitters]] (Misra-Gries): MG candidates answer "which
  * tokens are frequent", the CM grid answers point queries for ANY key
  * after the fact, at fixed memory chosen up front.
  */
object CountMin {

  /** The `depth` (row, bucket) cells of one token value, as an array column
    * aligned with `posexplode` (pos = row index). */
  private def bucketCells(token: Column, depth: Int, width: Int): Column = {
    val (a, b) = Dedup.md5HashPair(token)
    array((0 until depth).map(i =>
      pmod(a + lit((i + 1).toLong) * b, lit(width.toLong))): _*)
  }

  /** Build the counter grid: one row per touched cell, `(row, bucket,
    * cnt)`, at most `depth × width` rows total. One scan; map-side combine
    * bounds the shuffle by the grid size, not the data size. */
  def sketch(tokens: DataFrame, tokenCol: String, depth: Int, width: Int): DataFrame =
    tokens
      .select(posexplode(bucketCells(col(tokenCol), depth, width)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Merge grids built on disjoint corpora: cells sum, absent cells pass
    * through — `sketch(A ∪ B) ≡ merge(sketch(A), sketch(B))` exactly. */
  def merge(left: DataFrame, right: DataFrame): DataFrame =
    left.unionByName(right)
      .groupBy("row", "bucket")
      .agg(sum(col("cnt")).as("cnt"))

  /** Join-cardinality estimate from two grids built with the same shape
    * and family (Cormode & Muthukrishnan §4.2): per row, the inner product
    * `Σ_bucket cntA·cntB` never undercounts `|A ⋈ B| = Σ_key nA·nB`
    * (collisions only add cross terms, expected excess ≤ |A|·|B|/width);
    * the min over `depth` rows is the estimate. Grids are `depth × width`
    * rows — the join-size forecast costs two sketch scans and a
    * broadcast-sized join of the grids, never touching the join itself:
    * the shape a planner can afford BEFORE committing to a shuffle. All
    * integer, so the estimate is engine-exact and oracle-checkable. */
  def joinSizeEstimate(gridA: DataFrame, gridB: DataFrame): DataFrame =
    gridA.select(col("row"), col("bucket"), col("cnt").as("cnt_a"))
      .join(gridB.select(col("row"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("row", "bucket")) // absent cells contribute zero products
      .groupBy("row")
      .agg(sum(col("cnt_a") * col("cnt_b")).as("ip"))
      .agg(min(col("ip")).as("est"))

  /** Point estimates for a key set: min over the key's `depth` cells.
    * The grid broadcasts (≤ depth × width rows); keys never shuffle. A key
    * whose cell is absent from the grid was never observed (cnt 0). */
  def estimate(
      grid: DataFrame,
      keys: DataFrame,
      keyCol: String,
      depth: Int,
      width: Int): DataFrame = {
    val cells = keys
      .select(col(keyCol), posexplode(bucketCells(col(keyCol), depth, width)).as(Seq("row", "bucket")))
    cells
      .join(broadcast(grid), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
