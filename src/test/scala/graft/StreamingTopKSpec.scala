package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingTopK

class StreamingTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def runStream(
      batches: Seq[Seq[(String, Long)]], k: Int, capacity: Int,
      name: String): Seq[StreamingTopK.TopKRow] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val out = StreamingTopK.topKPerGroup(
      input.toDF().toDF("g", "item"), "g", "item", k, capacity)(spark)
    val run = s"${name}_${java.util.UUID.randomUUID().toString.take(8)}"
    val ckpt = s"target/ckpt_topk_$run"
    val q = out.toDF().writeStream.format("memory").queryName(s"topk_$run")
      .outputMode("update").option("checkpointLocation", ckpt).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(s"topk_$run").as[StreamingTopK.TopKRow].collect().toSeq
  }

  test("exact regime: final emission equals the batch top-k across micro-batches") {
    val b1 = Seq.fill(5)(("click", 1L)) ++ Seq.fill(3)(("click", 2L)) ++
      Seq.fill(1)(("view", 9L))
    val b2 = Seq.fill(4)(("click", 2L)) ++ Seq.fill(2)(("click", 3L)) ++
      Seq.fill(6)(("view", 8L))
    val rows = runStream(Seq(b1, b2), k = 2, capacity = 100, "exact")
    // final emission per group = max events_seen
    val finalRows = rows.groupBy(_.group).flatMap { case (_, rs) =>
      val mx = rs.map(_.events_seen).max; rs.filter(_.events_seen == mx)
    }.toSeq
    val click = finalRows.filter(_.group == "click").sortBy(_.rank)
    // totals: user2=7, user1=5, user3=2 -> top2 = (2,7),(1,5); no evictions -> err 0
    assert(click.map(r => (r.rank, r.item, r.n, r.err)) ==
      Seq((1, 2L, 7L, 0L), (2, 1L, 5L, 0L)))
    val view = finalRows.filter(_.group == "view").sortBy(_.rank)
    assert(view.map(r => (r.item, r.n)) == Seq((8L, 6L), (9L, 1L)))
    assert(view.head.events_seen == 7L)
    // intermediate (batch-1) click emission saw only 8 events
    assert(rows.filter(r => r.group == "click" && r.events_seen == 8L).nonEmpty)
  }

  test("bounded regime: Space-Saving invariants hold under eviction") {
    // 1 group, capacity 3, many distinct items; heavy item must survive
    val heavy = Seq.fill(50)(("g", 100L))
    val noise = (1L to 30L).map(i => ("g", i))
    val rows = runStream(Seq(heavy ++ noise), k = 3, capacity = 3, "evict")
    val mx = rows.map(_.events_seen).max
    val fin = rows.filter(_.events_seen == mx)
    assert(mx == 80L)
    // state bounded: at most capacity items emitted
    assert(fin.size <= 3)
    // guaranteed-present: true freq 50 > N/capacity = 80/3
    val h = fin.find(_.item == 100L).get
    // upper bound >= true count, lower bound (n - err) <= true count
    assert(h.n >= 50L && h.n - h.err <= 50L)
    // every counter's overestimation is bounded by N/capacity rounded up
    assert(fin.forall(r => r.err <= mx / 3 + 1))
  }

  test("replay determinism: identical input yields identical emission history") {
    val b = Seq.tabulate(40)(i => ("g", (i % 7).toLong))
    val r1 = runStream(Seq(b, b), 3, 4, "det1").map(r =>
      (r.group, r.events_seen, r.rank, r.item, r.n, r.err)).sorted
    val r2 = runStream(Seq(b, b), 3, 4, "det2").map(r =>
      (r.group, r.events_seen, r.rank, r.item, r.n, r.err)).sorted
    assert(r1 == r2)
  }
}
