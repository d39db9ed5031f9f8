package graft

import graft.operators.Profile

/** Histogram + correlation profiling. */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("equiWidthHistogram bins cover the range; max lands in the last bin") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val bins = Profile.equiWidthHistogram(df, "v", 10)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(bins.keySet == (0L to 9L).toSet)
    assert(bins(0L)._3 == 10L)            // 0..9
    assert(bins(9L)._3 == 11L)            // 90..100: max clamps into bin 9
    assert(bins(0L)._1 == 0.0 && bins(9L)._2 == 100.0)
    // adjacent bins share edges
    assert(bins(3L)._2 == bins(4L)._1)
  }

  test("equiWidthHistogram degenerate and empty inputs") {
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val r = Profile.equiWidthHistogram(const, "v", 4).collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L && r(0).getLong(3) == 3L)
    assert(Profile.equiWidthHistogram(Seq.empty[Double].toDF("v"), "v", 4)
      .collect().isEmpty)
  }

  test("outlierProfile counts rows beyond the 1.5-IQR Tukey fences") {
    // 1..20 plus two gross outliers
    val df = ((1 to 20).map(_.toDouble) ++ Seq(-100.0, 500.0, 600.0)).toDF("v")
    val r = Profile.outlierProfile(df, Seq("v")).collect()(0)
    // percentile_disc over 23 sorted values: p25 = rank ceil(0.25*23)=6 -> 5.0
    // (values -100,1..20,500,600); p75 = rank ceil(0.75*23)=18 -> 17.0
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 17.0)
    val iqr = 17.0 - 5.0
    assert(r.getDouble(3) == 5.0 - 1.5 * iqr && r.getDouble(4) == 17.0 + 1.5 * iqr)
    assert(r.getLong(5) == 1L) // -100 below
    assert(r.getLong(6) == 2L) // 500, 600 above
  }

  test("correlationMatrix matches hand-computed Pearson") {
    // y = 2x exactly -> corr 1; z anti-correlated with x -> corr -1
    val df = Seq((1.0, 2.0, 3.0), (2.0, 4.0, 2.0), (3.0, 6.0, 1.0))
      .toDF("x", "y", "z")
    val m = Profile.correlationMatrix(df, Seq("x", "y", "z"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(m(("x", "y")) - 1.0) < 1e-12)
    assert(math.abs(m(("x", "z")) + 1.0) < 1e-12)
    assert(math.abs(m(("y", "z")) + 1.0) < 1e-12)
    assert(m.size == 3)
  }

  test("correlationMatrix constant column yields NULL coefficient") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("x", "c")
    val r = Profile.correlationMatrix(df, Seq("x", "c")).collect()(0)
    assert(r.isNullAt(2))
  }

  test("correlationMatrix agrees with Spark's corr() on random-ish data") {
    val df = (1 to 50).map(i => (i.toDouble, (i * i % 13).toDouble)).toDF("a", "b")
    val ours = Profile.correlationMatrix(df, Seq("a", "b")).collect()(0).getDouble(2)
    val ref = df.stat.corr("a", "b")
    assert(math.abs(ours - ref) < 1e-9)
  }

  test("chi2Drift: identical slices give zero cells, values match textbook doubles") {
    val a = Seq.fill(30)("x").map(Tuple1(_)) ++ Seq.fill(10)("y").map(Tuple1(_))
    val b = Seq.fill(20)("x").map(Tuple1(_)) ++ Seq.fill(20)("y").map(Tuple1(_))
    val dfA = a.toDF("cat")
    val dfB = b.toDF("cat")
    // identical slices: every contribution exactly 0
    val same = Profile.chi2Drift(dfA, dfA, "cat").collect()
    assert(same.forall(_.getDouble(4) == 0.0))
    // textbook (o-e)^2/e per cell, computed in plain doubles
    val got = Profile.chi2Drift(dfA, dfB, "cat")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    def cell(oA: Double, oB: Double, rA: Double, rB: Double): Double = {
      val n = rA + rB; val c = oA + oB
      val eA = rA * c / n; val eB = rB * c / n
      (oA - eA) * (oA - eA) / eA + (oB - eB) * (oB - eB) / eB
    }
    assert(math.abs(got("x") - cell(30, 20, 40, 40)) < 1e-9)
    assert(math.abs(got("y") - cell(10, 20, 40, 40)) < 1e-9)
  }

  test("chi2Drift: category absent on one side contributes its full mass") {
    val dfA = Seq("x", "x", "z").map(Tuple1(_)).toDF("cat")
    val dfB = Seq("x", "x", "x").map(Tuple1(_)).toDF("cat")
    val rows = Profile.chi2Drift(dfA, dfB, "cat")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(rows("z")._1 == 1L && rows("z")._2 == 0L)
    // z: o_a=1,o_b=0,R=3/3,C=1,N=6 -> e=0.5 each -> chi2 = .25/.5*2 = 1.0
    assert(math.abs(rows("z")._3 - 1.0) < 1e-12)
  }

  test("equiDepthHistogram: exact quartile boundaries, near-equal depths") {
    import spark.implicits._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = Profile.equiDepthHistogram(df, "v", buckets = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // percentile_disc boundaries at ranks 25/50/75 -> buckets (,25],(25,50],...
    assert(got(0L) == ((25L, 1.0, 25.0)))
    assert(got(1L) == ((25L, 26.0, 50.0)))
    assert(got(2L) == ((25L, 51.0, 75.0)))
    assert(got(3L) == ((25L, 76.0, 100.0)))
  }

  test("selectRanks matches a driver-side sort on mixed data (ties, skew, tiny buckets)") {
    // deliberately small bucket count so targets span several buckets AND
    // the dominant-tie shortcut (pure bucket) and the sort path both fire
    val rnd = new scala.util.Random(7)
    val colA = Seq.fill(400)(rnd.nextInt(50).toDouble)         // heavy ties
    val colB = Seq.fill(300)(rnd.nextDouble() * 1e6)           // near-continuous
    val colC = Seq.fill(200)(42.0)                             // constant column
    val stacked = (colA.map(("a", _)) ++ colB.map(("b", _)) ++ colC.map(("c", _)))
      .toDF("column", "v")
    val ranks = Map(
      "a" -> Seq(1L, 100L, 200L, 400L),
      "b" -> Seq(1L, 150L, 300L),
      "c" -> Seq(1L, 99L, 200L))
    val stats = Map(
      "a" -> ((colA.min, colA.max)),
      "b" -> ((colB.min, colB.max)),
      "c" -> ((42.0, 42.0)))
    val got = Profile.selectRanks(stacked, ranks, stats, buckets = 8)
    val sortedByCol = Map("a" -> colA.sorted, "b" -> colB.sorted, "c" -> colC.sorted)
    ranks.foreach { case (c, ks) => ks.foreach { k =>
      assert(got((c, k)) == sortedByCol(c)(k.toInt - 1), s"col $c rank $k")
    } }
  }

  test("numericProfile rank pass is partitioned by (column, bucket) — parallel sort") {
    // near-continuous values so the sort phase actually runs (no pure-bucket
    // shortcut), then pin that the recorded plan partitions the window by
    // BOTH keys — the 100 TB guarantee that no task sorts a whole column
    val df = (1 to 5000).map(i => (i * 37 % 4999 + i / 1000.0, i * 73 % 4999 + i / 2000.0))
      .toDF("x", "y")
    val out = Profile.numericProfile(df, Seq("x", "y"), Seq(0.25, 0.5, 0.75))
    assert(out.count() == 2)
    val plan = Profile.lastRankSelectionPlan
    assert(plan.isDefined, "sort phase did not run (all targets resolved by shortcut)")
    assert(plan.get.contains("__b"), plan.get.take(2000))
    // the window's required distribution is (column, __b) — the exchange
    // hashes both, so parallelism scales with hit buckets, not columns
    assert(plan.get.contains("hashpartitioning(column"), plan.get.take(2000))
  }

  test("equiDepthHistogram: ties collapse into the lower bucket; empty ok") {
    import spark.implicits._
    val tied = Seq(1.0, 1.0, 1.0, 1.0, 9.0, 9.0).toDF("v")
    val got = Profile.equiDepthHistogram(tied, "v", buckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // boundaries (rank 2, 4) = (1, 1): all 1.0s in bucket 0, 9.0s above both
    assert(got(0L) == 4L && got(2L) == 2L && got.size == 2)
    assert(Profile.equiDepthHistogram(
      Seq.empty[Double].toDF("v"), "v", 4).count() == 0L)
  }

  test("thresholdsByGroup: each group's exact rank-k order statistic") {
    import spark.implicits._
    val df = Seq(
      // group a: 0..8 → p75 rank ceil(27/4) = 7 → 6.0
      ("a", Option(1.0)), ("a", Option(2.0)), ("a", Option(3.0)),
      ("a", Option(4.0)), ("a", Option(5.0)), ("a", Option(6.0)),
      ("a", Option(7.0)), ("a", Option(8.0)), ("a", Option(0.0)),
      // group b: all ties → pure-bucket shortcut, threshold = the value
      ("b", Option(4.0)), ("b", Option(4.0)), ("b", Option(4.0)),
      // group c: singleton → rank clamps to 1
      ("c", Option(9.0)),
      // NULL group and NULL value are excluded
      (null.asInstanceOf[String], Option(99.0)), ("a", Option.empty[Double])
    ).toDF("g", "v")
    val got = Profile.thresholdsByGroup(df, "g", "v", 3, 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // group a has 9 non-NULL values (1..8 plus the 0.0) → rank ceil(27/4)=7 → 6.0
    assert(got("a") == ((9L, 6.0)))
    assert(got("b") == ((3L, 4.0)))
    assert(got("c") == ((1L, 9.0)))
    assert(got.size == 3) // no NULL-group row
    // reference check against a full per-group sort for a sweep of ranks
    val ref = Seq("a" -> Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0))
    ref.foreach { case (g, sorted) =>
      val n = sorted.length
      val k = math.max(1L, (3L * n + 3) / 4)
      assert(got(g)._2 == sorted((k - 1).toInt))
    }
  }

  test("thresholdsByGroup: empty input and p=0/p=1 bounds") {
    import spark.implicits._
    val empty = Seq.empty[(String, Double)].toDF("g", "v")
    assert(Profile.thresholdsByGroup(empty, "g", "v", 1, 2).count() == 0L)
    val df = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("x", 4.0)).toDF("g", "v")
    // p=0 clamps to rank 1 (min); p=1 is rank n (max)
    val lo = Profile.thresholdsByGroup(df, "g", "v", 0, 4).collect()(0).getDouble(2)
    val hi = Profile.thresholdsByGroup(df, "g", "v", 4, 4).collect()(0).getDouble(2)
    assert(lo == 1.0 && hi == 4.0)
  }

  test("ksStatistic: exact scaled deviation, ties included, bucket-partitioned ranks") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 2.0, 3.0, 10.0).toDF("x")
    val b = Seq(2.0, 4.0, 4.0, 5.0).toDF("y")
    val ks = Profile.ksStatistic(a, "x", b, "y", buckets = 4)
    val got = ks.first()
    // hand reference: dev(v) = |cnt_a(≤v)·n_b − cnt_b(≤v)·n_a| over distinct v
    // v=1:4, v=2:7, v=3:11, v=4:1, v=5:4, v=10:0 → max 11 at v=3
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getDouble(3))
      == ((5L, 4L, 11L, 3.0)))
    // the running ranks are computed within value-range buckets (parallel),
    // never as one global-order window
    val plan = ks.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__b"),
      s"expected bucket-partitioned rank windows:\n$plan")
    // brute-force sweep across bucket counts — bucketing must not change values
    for (bk <- Seq(1, 2, 7, 1024)) {
      val r = Profile.ksStatistic(a, "x", b, "y", buckets = bk).first()
      assert(r.getLong(2) == 11L && r.getDouble(3) == 3.0, s"buckets=$bk")
    }
    // degenerate: identical constant distributions → zero deviation
    val c1 = Seq(7.0, 7.0).toDF("x")
    val c2 = Seq(7.0).toDF("y")
    val z = Profile.ksStatistic(c1, "x", c2, "y").first()
    assert(z.getLong(2) == 0L)
    // empty side rejected with a clear message
    intercept[IllegalArgumentException] {
      Profile.ksStatistic(Seq.empty[Double].toDF("x"), "x", b, "y").first()
    }
  }

  test("ksStatisticByGroup: per-group KS equals the per-group global computation") {
    import spark.implicits._
    val a = Seq(("g1", 1.0), ("g1", 2.0), ("g1", 2.0), ("g1", 3.0), ("g1", 10.0),
      ("g2", 5.0), ("g2", 6.0), ("g3", 1.0)).toDF("g", "x")
    val b = Seq(("g1", 2.0), ("g1", 4.0), ("g1", 4.0), ("g1", 5.0),
      ("g2", 5.0), ("g2", 6.0)).toDF("g", "y")
    val got = Profile.ksStatisticByGroup(a, "x", b, "y", "g", buckets = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // g1 is the single-group ksStatistic fixture: max 11 at v=3
    assert(got("g1") == ((5L, 4L, 11L, 3.0)))
    // g2: identical distributions → deviation 0; smallest value reports
    assert(got("g2") == ((2L, 2L, 0L, 5.0)))
    // g3 has no side-2 rows → no two-sample statistic → omitted
    assert(!got.contains("g3") && got.size == 2)
    // values invariant across bucket counts — including the buckets=1
    // degenerate the high-group-cardinality guard scales down to
    for (bk <- Seq(1, 1024)) {
      val again = Profile.ksStatisticByGroup(a, "x", b, "y", "g", buckets = bk)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
      assert(again == Map("g1" -> 11L, "g2" -> 0L), s"buckets=$bk")
    }
  }

  test("ksStatisticTagged / ksStatisticByGroupTagged: one-scan tagged form ≡ two-frame form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // one frame holding both samples: side 2 ⇔ flag; NULL flag ⇒ neither
    val tagged = Seq(
      (Some(false), "g1", 1.0), (Some(false), "g1", 2.0), (Some(false), "g1", 2.0),
      (Some(false), "g1", 3.0), (Some(false), "g1", 10.0),
      (Some(true), "g1", 2.0), (Some(true), "g1", 4.0), (Some(true), "g1", 4.0),
      (Some(true), "g1", 5.0),
      (Some(false), "g2", 5.0), (Some(false), "g2", 6.0),
      (Some(true), "g2", 5.0), (Some(true), "g2", 6.0),
      (Some(false), "g3", 1.0),
      (None, "g1", 99.0)) // NULL side: in neither sample
      .toDF("s2", "g", "v")
    val asTwo1 = tagged.where(!col("s2")).select("g", "v")
    val asTwo2 = tagged.where(col("s2")).select("g", "v")
    // global: tagged ≡ ksStatistic(where(!s2), where(s2)) — one scan, not two
    val g1t = tagged.where(col("g") === "g1")
    val one = Profile.ksStatisticTagged(g1t, "v", col("s2"), buckets = 4).first()
    val two = Profile.ksStatistic(
      g1t.where(!col("s2")), "v", g1t.where(col("s2")), "v", buckets = 4).first()
    assert((one.getLong(0), one.getLong(1), one.getLong(2), one.getDouble(3))
      == ((two.getLong(0), two.getLong(1), two.getLong(2), two.getDouble(3))))
    assert(one.getLong(2) == 11L && one.getDouble(3) == 3.0)
    // grouped: identical rows, including the omitted one-sided group g3
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val gotTagged = asMap(
      Profile.ksStatisticByGroupTagged(tagged, "v", "g", col("s2"), buckets = 3))
    val gotTwo = asMap(
      Profile.ksStatisticByGroup(asTwo1, "v", asTwo2, "v", "g", buckets = 3))
    assert(gotTagged == gotTwo)
    assert(gotTagged("g1") == ((5L, 4L, 11L, 3.0)) && !gotTagged.contains("g3"))
  }

  test("ksStatisticByGroup bounds its driver collect: buckets scale down as groups grow") {
    // groups·buckets never exceeds the driver cap; tiny group counts keep
    // the full requested resolution
    assert(Profile.ksEffectiveBuckets(1024, 1) == 1024)
    assert(Profile.ksEffectiveBuckets(1024, 4096) == 1024) // 4M/4096 = exactly 1024
    assert(Profile.ksEffectiveBuckets(1024, 8192) == 512)
    assert(Profile.ksEffectiveBuckets(1024, 1 << 22) == 1)
    assert(Profile.ksEffectiveBuckets(1024, Int.MaxValue) == 1) // never zero
    // whenever scaling (not the floor-at-1) decides, groups·buckets ≤ cap —
    // at the floor the collect degenerates to ≤ one row per group, the same
    // bound the stats probe already pays
    val cap = Profile.KsMaxDriverRows
    for (g <- Seq(1, 100, 10000, 1 << 21, 1 << 22)) {
      val eff = Profile.ksEffectiveBuckets(1024, g)
      if (eff > 1) assert(g.toLong * eff <= cap, s"groups=$g exceeds the driver cap")
    }
  }
}
