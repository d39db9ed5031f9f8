package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge DataFrames. Connected components live
  * in [[Dedup]] (duplicate clustering); this hosts rank propagation.
  *
  * PageRank here is FIXED-POINT: ranks are scaled BIGINTs and every step is
  * integer arithmetic (floor divisions, exact integer sums). The textbook
  * double formulation is NOT engine-reproducible — Σ of incoming
  * contributions is accumulation-order-dependent, so two runs (or two
  * engines) disagree in the last ulps and the disagreement compounds per
  * iteration. Integer sums are associative-commutative, so the scaled
  * ranks are a pure function of the graph, bit-identical everywhere —
  * which is what makes a 5-iteration distributed PageRank hash-checkable
  * against a SQL oracle.
  */
object Graph {

  val DefaultScale = 1000000000L

  /** Scaled-integer PageRank over directed `edges` (cols `src`, `dst`;
    * duplicates are deduplicated). Returns (node, rank_scaled).
    *
    * rank₀ = scale; rankᵢ₊₁(v) = base + (num · Σ_{u→v} rankᵢ(u) DIV deg(u))
    * DIV den, with base = ((den − num) · scale) DIV den. Dangling-node mass
    * is dropped (standard practice for ranking use; the totals therefore
    * shrink slightly per iteration — rankings are unaffected).
    *
    * Scale shape per iteration: one shuffle of the rank table onto the
    * edge partitioning (the degree-annotated edge list is partitioned by
    * src ONCE and cached through [[Dedup.cacheShared]]) + one groupBy(dst)
    * with map-side combine — the classic Pregel superstep cost. Lineage is
    * truncated every few iterations via localCheckpoint so long runs don't
    * accumulate a nested plan.
    */
  def pageRankScaled(edges: DataFrame, iters: Int,
      dampingNum: Long = 85, dampingDen: Long = 100,
      scale: Long = DefaultScale,
      checkpointEvery: Int = 8): DataFrame = Dedup.newCacheScope {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // join on src reuses the distinct/groupBy exchange — ed is partitioned
    // by src, which is exactly what each iteration's rank join needs
    val ed = Dedup.cacheShared(e.join(deg, "src"))
    val nodes = Dedup.cacheShared(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct())
    val base = ((dampingDen - dampingNum) * scale) / dampingDen
    var ranks = nodes.withColumn("r", lit(scale))
    for (i <- 1 to iters) {
      val contrib = ed.join(ranks, col("src") === col("node"))
        .selectExpr("dst", "r DIV outdeg AS c")
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .selectExpr("node", s"$base + ($dampingNum * coalesce(s, 0L)) DIV $dampingDen AS r")
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_scaled"))
  }
}
