package graft

import graft.operators.Graph

/** Fixed-point PageRank semantics. */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference: the same integer recurrence, adjacency maps. */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = Graph.DefaultScale): Map[Long, Long] = {
    val es = edges.distinct
    val out = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val base = (15L * scale) / 100L
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(n => n -> (base + (85L * in.getOrElse(n, 0L)) / 100L)).toMap
    }
    r
  }

  private val cycleWithTail = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), // cycle
    (4L, 1L),                     // tail feeding the cycle
    (1L, 4L))

  test("pageRankScaled matches the driver-side integer reference") {
    val edges = cycleWithTail.toDF("src", "dst")
    val got = Graph.pageRankScaled(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(cycleWithTail, 4))
    // node 1 has two feeders (3 and 4); it must outrank the single-feed nodes
    assert(got(1L) > got(2L) && got(1L) > got(4L))
  }

  test("zero iterations returns the uniform initial rank") {
    val got = Graph.pageRankScaled(cycleWithTail.toDF("src", "dst"), iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(Graph.DefaultScale))
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("duplicate edges do not double-count; result is partitioning-invariant") {
    val dup = cycleWithTail ++ cycleWithTail
    val a = Graph.pageRankScaled(dup.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.pageRankScaled(cycleWithTail.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("symmetrize equals an explicit bidirectional union (disjoint domains)") {
    // even ids on one side, odd on the other — reversal cannot collide
    val oneWay = Seq((0L, 1L), (0L, 3L), (2L, 1L), (2L, 1L))
    val both = oneWay.distinct.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val viaFlag = Graph.pageRankScaled(oneWay.toDF("src", "dst"), 3, symmetrize = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaUnion = Graph.pageRankScaled(both.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFlag == viaUnion)
  }

  test("pageRankScaled: symmetrize fast path equals the hinted-large shuffle path") {
    // assumeSmallGraph = Some(true) takes the r17 dst-partitioned
    // broadcast fast path; Some(false) keeps the classic shuffle-join
    // supersteps — both must produce the identical integer fixed point
    val oneWay = Seq((0L, 1L), (0L, 3L), (2L, 1L), (2L, 3L), (4L, 1L))
    def run(hint: Boolean): Map[Long, Long] =
      Graph.pageRankScaled(oneWay.toDF("src", "dst"), 4, symmetrize = true,
        assumeSmallGraph = Some(hint))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run(true)
    assert(fast == run(false))
    // and against the non-symmetrize reference on the explicit union
    val both = oneWay.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    assert(fast == refPageRank(both, 4))
  }

  test("personalizedPageRankScaled: symmetrize fast path equals union + hinted-large paths") {
    val oneWay = Seq((0L, 1L), (2L, 1L), (2L, 3L))
    val both = oneWay.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val seeds = Seq(0L, 99L).toDF("node") // 99 outside the graph — ignored
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = asMap(Graph.personalizedPageRankScaled(
      oneWay.toDF("src", "dst"), seeds, 3, symmetrize = true,
      assumeSmallGraph = Some(true)))
    // hinted-large symmetrize: classic shuffle supersteps
    assert(fast == asMap(Graph.personalizedPageRankScaled(
      oneWay.toDF("src", "dst"), seeds, 3, symmetrize = true,
      assumeSmallGraph = Some(false))))
    // explicit bidirectional union through the directed path
    assert(fast == asMap(Graph.personalizedPageRankScaled(
      both.toDF("src", "dst"), seeds, 3)))
  }

  test("minLabelPropagation: symmetrize fast path equals the hinted-large path") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    def run(hint: Option[Boolean]): Map[Long, Long] =
      Graph.minLabelPropagation(edges, 2, symmetrize = true,
        assumeSmallGraph = hint)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run(Some(true))
    assert(fast == run(Some(false)))
    assert(fast == run(None)) // measured small ⇒ fast path, same labels
  }

  test("sink node keeps receiving rank but contributes nothing (dropped mass)") {
    val edges = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst") // 2 is a sink
    val got = Graph.pageRankScaled(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(Seq((1L, 2L), (3L, 2L)), 2))
    assert(got(2L) > got(1L))
  }

  test("kHopDistances: min-hop labels, unreachable nodes absent") {
    import spark.implicits._
    // path 1-2-3-4 plus a shortcut 1-3 and an island 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (9L, 9L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val sources = Seq(1L).toDF("node")
    val got = Graph.kHopDistances(edges, sources, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 reached at dist 1 via the shortcut, not 2; island 9 unreachable
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("kHopDistances: maxHops 0 returns the source set only") {
    import spark.implicits._
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.kHopDistances(edges, Seq(1L, 5L).toDF("node"), 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 5L -> 0L))
  }

  test("kHopDistances: symmetrize + both gating strategies reproduce the caller-union shuffle form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // diamond 1-2-3-4 with shortcut 1-3, disconnected pair 6-7, and a
    // reversal collision (2,1) against forward (1,2) — symmetrize must
    // tolerate the duplicate edge it produces
    val oneDir = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L), (6L, 7L), (2L, 1L))
      .toDF("src", "dst")
    val both = oneDir.union(oneDir.select(col("dst").as("src"), col("src").as("dst")))
    val sources = Seq(1L).toDF("node")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // old shape: caller-side union, no broadcasts (forced shuffle joins)
    val base = asMap(Graph.kHopDistances(both, sources, 3,
      assumeSmallFrontier = Some(false)))
    // new shape: internal symmetrize, measured gating (default)
    assert(asMap(Graph.kHopDistances(oneDir, sources, 3, symmetrize = true)) == base)
    // hinted-broadcast path (zero sizing counts)
    assert(asMap(Graph.kHopDistances(oneDir, sources, 3, symmetrize = true,
      assumeSmallFrontier = Some(true))) == base)
    assert(base == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
  }

  test("kHopDistances: empty-frontier short-circuit leaves the reach set unchanged") {
    import spark.implicits._
    // diameter 1 from the source; maxHops far past exhaustion
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.kHopDistances(edges, Seq(1L).toDF("node"), 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L))
    // hinted path never measures, so it cannot short-circuit — same result
    val hinted = Graph.kHopDistances(edges, Seq(1L).toDF("node"), 10,
      assumeSmallFrontier = Some(true))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hinted == got)
  }

  test("minLabelPropagation: radius-i neighborhood min per step") {
    import spark.implicits._
    // path 1-2-3-4-5 plus isolated pair 8-9 (one direction; symmetrized)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    def labels(iters: Int): Map[Long, Long] =
      Graph.minLabelPropagation(edges, iters, symmetrize = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0 supersteps: every node keeps its own label
    assert(labels(0) == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 8L -> 8L, 9L -> 9L))
    // 1 superstep: each node takes the min over its radius-1 neighborhood
    assert(labels(1) == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L, 8L -> 8L, 9L -> 8L))
    // 3 supersteps: min over the radius-3 neighborhood (5 sees back to 2)
    assert(labels(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 8L -> 8L, 9L -> 8L))
    // diameter supersteps: converged to connected components
    assert(labels(4) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("personalizedPageRankScaled: teleport only to seeds, hand-computed fixed point") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    // seed 99 is outside the graph — ignored by the node join
    val seeds = Seq(1L, 99L).toDF("node")
    def ranks(iters: Int): Map[Long, Long] =
      Graph.personalizedPageRankScaled(edges, seeds, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r0: scale on the seed, zero elsewhere
    assert(ranks(0) == Map(1L -> 1000000000L, 2L -> 0L, 3L -> 0L))
    // iter 1: seed keeps only its teleport base (15% of scale); node 2
    // receives 85% of the seed's full mass; node 3 receives nothing yet
    assert(ranks(1) == Map(1L -> 150000000L, 2L -> 850000000L, 3L -> 0L))
    // iter 2: the mass keeps diffusing — 85% of each upstream rank
    assert(ranks(2) == Map(1L -> 150000000L, 2L -> 127500000L, 3L -> 722500000L))
    // empty seed set ⇒ no teleport source ⇒ everything decays to zero
    val none = Graph.personalizedPageRankScaled(edges,
      Seq.empty[Long].toDF("node"), 2)
      .collect().map(r => r.getLong(1)).toSet
    assert(none == Set(0L))
  }

  test("minLabelPropagation: plan size stays bounded at deep iteration counts") {
    import spark.implicits._
    // HashMin reads `labels` twice per superstep, so without per-superstep
    // materialization the logical plan doubles each iteration — 2^12
    // duplicated subtrees by iters = 12. The per-superstep localCheckpoint
    // truncates lineage to a LogicalRDD, so the FINAL frame's plan must be
    // one superstep deep regardless of iters: a node count far below what
    // even two chained supersteps of the full pipeline would produce.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    val deep = Graph.minLabelPropagation(edges, iters = 12, symmetrize = true)
    val planNodes = deep.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planNodes < 64,
      s"expected a lineage-truncated (single-superstep) plan, got $planNodes nodes")
    // and the deep run still converges to connected components
    val got = deep.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("minLabelPropagation: directed edges only push labels downstream") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Graph.minLabelPropagation(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 never receives anything; 3 reaches 1's label after 2 steps
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val one = Graph.minLabelPropagation(edges, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
