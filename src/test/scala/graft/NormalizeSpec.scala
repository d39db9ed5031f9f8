package graft

import graft.operators.Normalize

/** Group-wise normalization semantics. */
class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    ("a", 1.0), ("a", 2.0), ("a", 3.0),
    ("b", 5.0), ("b", 5.0), // zero variance
    ("c", 7.0))             // single row
    .toDF("g", "v")

  test("zscore matches the closed form; degenerate groups emit NULL") {
    val got = Normalize.zscoreByGroup(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val a = got.filter(_._1 == "a").sortBy(_._2).map(_._3)
    // mean 2, population std sqrt(2/3)
    val std = math.sqrt(2.0 / 3.0)
    assert(a.flatten.zip(Seq(-1.0 / std, 0.0, 1.0 / std))
      .forall { case (x, e) => math.abs(x - e) < 1e-12 })
    assert(got.filter(r => r._1 == "b" || r._1 == "c").forall(_._3.isEmpty))
  }

  test("minmax scales into [0,1]; constant groups emit NULL") {
    val got = Normalize.minMaxByGroup(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(got.contains(("a", 1.0, Some(0.0))) &&
      got.contains(("a", 2.0, Some(0.5))) &&
      got.contains(("a", 3.0, Some(1.0))))
    assert(got.filter(r => r._1 == "b" || r._1 == "c").forall(_._3.isEmpty))
  }

  test("stats side joins back as a broadcast") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_quantity")
    val plan = Normalize.zscoreByGroup(docs, Seq("l_returnflag"), "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("percent-rank normalization: ties share ranks; singletons get 0") {
    val d = Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0), ("c", 7.0))
      .toDF("g", "v")
    val got = Normalize.percentRankByGroup(d, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got(("a", 10.0)) == 0.0)
    assert(got(("a", 20.0)) == 1.0 / 3.0) // tie pair shares rank 2 of 4
    assert(got(("a", 30.0)) == 1.0)
    assert(got(("c", 7.0)) == 0.0)        // single-row group
  }

  test("zscore is invariant under repartitioning (exact decimal moments)") {
    val base = Normalize.zscoreByGroup(df, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.get(2))).toSet
    val re = Normalize.zscoreByGroup(df.repartition(7), Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.get(2))).toSet
    assert(base == re)
  }

  test("winsorize clips to exact percentile_disc boundaries per group") {
    import spark.implicits._
    // group a: 1..10 → p10 boundary = 1 (cume 0.1 at v=1), p90 = 9
    val rows = (1 to 10).map(i => ("a", i.toDouble)) ++ Seq(("b", 5.0))
    val out = Normalize.winsorizeByGroup(rows.toDF("g", "v"), Seq("g"), "v",
        pLo = 0.1, pHi = 0.9)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 1.0)) == 1.0)   // at the low boundary, not below
    assert(out(("a", 10.0)) == 9.0)  // clipped down to p90
    assert(out(("a", 5.0)) == 5.0)   // interior untouched
    assert(out(("b", 5.0)) == 5.0)   // single-row group: lo = hi = value
  }

  test("winsorize passes NULL values through instead of clipping to the floor") {
    import spark.implicits._
    // greatest/least skip NULLs, so an unguarded clip would turn a missing
    // value into the p-low order statistic
    val rows = ((1 to 10).map(i => ("a", Some(i.toDouble))) :+ ("a", None))
    val out = Normalize.winsorizeByGroup(rows.toDF("g", "v"), Seq("g"), "v",
        pLo = 0.1, pHi = 0.9)
      .collect().map(r => Option(r.get(1)) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.collect { case (None, c) => c }.toSeq == Seq(None))
    assert(out.collect { case (Some(10.0), c) => c }.toSeq == Seq(Some(9.0)))
  }
}
