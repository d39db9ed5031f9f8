package graft

import org.apache.spark.sql.functions._

import graft.operators.{RangeJoin, TimeSeries}

/** Bucketed band/interval joins and trailing event-time features. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("band join equals the brute-force inequality join, each pair once") {
    val rnd = new scala.util.Random(11)
    val ls = Seq.tabulate(400)(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(100000).toLong, i.toLong))
    val rs = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(100000).toLong, (1000 + i).toLong))
    val l = ls.toDF("k", "ts_us", "id")
    val r = rs.toDF("k", "ts_us", "id")
    val w = 1234L
    val got = RangeJoin.bandJoin(l, r, Seq("k"), "ts_us", w)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    val expected = for {
      (lk, lt, li) <- ls; (rk, rt, ri) <- rs
      if lk == rk && math.abs(lt - rt) <= w
    } yield (li, ri)
    assert(got.sorted.toSeq == expected.sorted) // exact multiset: no dup pairs
  }

  test("band join crosses bucket boundaries and is inclusive at the edge") {
    val l = Seq((1L, 999L, 1L), (1L, 1000L, 2L)).toDF("k", "ts_us", "id")
    val r = Seq((1L, 1999L, 10L), (1L, 2000L, 11L)).toDF("k", "ts_us", "id")
    val got = RangeJoin.bandJoin(l, r, Seq("k"), "ts_us", 1000L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // |999-1999|=1000 ✓, |999-2000|=1001 ✗, |1000-1999|=999 ✓, |1000-2000|=1000 ✓
    assert(got == Set((1L, 10L), (2L, 10L), (2L, 11L)))
  }

  test("interval join matches points to covering intervals exactly once") {
    val pts = Seq((1L, 5L, 1L), (1L, 25L, 2L), (1L, 55L, 3L), (2L, 5L, 4L))
      .toDF("k", "ts_us", "id")
    val ivs = Seq(
      (1L, 0L, 30L, 100L),   // covers ts 5 and 25
      (1L, 25L, 60L, 101L),  // covers 25 (inclusive lo) and 55
      (1L, 90L, 95L, 102L),  // covers nothing
      (2L, 50L, 10L, 103L))  // empty (hi < lo) → dropped
      .toDF("k", "lo_us", "hi_us", "iid")
    val got = RangeJoin.intervalJoin(pts, ivs, Seq("k"), "ts_us",
      "lo_us", "hi_us", bucketWidthMicros = 10L)
      .select("p_id", "i_iid").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got.sorted.toSeq == Seq((1L, 100L), (2L, 100L), (2L, 101L), (3L, 101L)))
  }

  test("interval join rejects runaway spans before exploding them") {
    val pts = Seq((1L, 5L, 1L)).toDF("k", "ts_us", "id")
    val ivs = Seq((1L, 0L, 10000000L, 100L)).toDF("k", "lo_us", "hi_us", "iid")
    val e = intercept[Exception] {
      RangeJoin.intervalJoin(pts, ivs, Seq("k"), "ts_us", "lo_us", "hi_us",
        bucketWidthMicros = 10L, maxBuckets = 16).collect()
    }
    assert(e.getMessage.contains("widen bucketWidthMicros")
      || Option(e.getCause).exists(_.getMessage.contains("widen bucketWidthMicros")))
  }

  test("keyless band join: global time-band pairing without equi-keys") {
    val l = Seq((100L, 1L), (5000L, 2L)).toDF("ts_us", "id")
    val r = Seq((600L, 10L), (4000L, 11L), (9000L, 12L)).toDF("ts_us", "id")
    val got = RangeJoin.bandJoin(l, r, keyCols = Nil, "ts_us", 1000L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 11L))) // |5000-4000|=1000 inclusive
  }

  test("keyless interval join matches covering intervals") {
    val p = Seq((5L, 1L), (45L, 2L)).toDF("ts_us", "id")
    val i = Seq((0L, 10L, 100L), (40L, 50L, 101L), (60L, 70L, 102L))
      .toDF("lo_us", "hi_us", "iid")
    val got = RangeJoin.intervalJoin(p, i, Nil, "ts_us", "lo_us", "hi_us",
      bucketWidthMicros = 8L)
      .select("p_id", "i_iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 101L)))
  }

  test("trailing features equal a brute-force computation") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(500)(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(5000).toLong, i.toLong,
        (rnd.nextInt(100) + 1).toDouble))
    val ev = rows.toDF("user_id", "s", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("s") * 1000000L))
    val horizon = 600L
    val got = TimeSeries.trailingFeatures(ev, "user_id", "ts", "event_id",
      "value", horizon)
      .select("event_id", "trailing_n", "trailing_sum", "gap_us")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    val byKey = rows.groupBy(_._1)
    rows.foreach { case (k, s, id, _) =>
      val peers = byKey(k)
      val inFrame = peers.filter(p => p._2 <= s && p._2 >= s - horizon)
      val (n, sm, gap) = got(id)
      assert(n == inFrame.size, s"event $id trailing_n")
      assert(math.abs(sm - inFrame.map(_._4).sum) < 1e-6, s"event $id trailing_sum")
      val before = peers.filter(p => p._2 < s || (p._2 == s && p._3 < id))
        .sortBy(p => (p._2, p._3))
      assert(gap == before.lastOption.map(p => (s - p._2) * 1000000L),
        s"event $id gap")
    }
  }

  test("band join and trailing features plan no nested-loop joins") {
    val rj = OpsPack.eventsRangeJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!rj.contains("BroadcastNestedLoopJoin") && !rj.contains("CartesianProduct"), rj)
    val tf = OpsPack.eventsTrailing(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!tf.contains("Join"), tf)
  }
}
