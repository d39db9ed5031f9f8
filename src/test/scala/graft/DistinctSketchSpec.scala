package graft

import org.apache.spark.sql.functions._
import graft.operators.DistinctSketch

class DistinctSketchSpec extends SparkTestBase {
  import spark.implicits._

  private val m = 64

  test("registers are per-bucket max ranks; duplicates never move them") {
    val vals = (1 to 500).map(i => s"v$i")
    val df = (vals ++ vals ++ vals).toDF("v") // 3x duplication
    val once = DistinctSketch.registers(vals.toDF("v"), "v", m)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    val tripled = DistinctSketch.registers(df, "v", m)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(once.sameElements(tripled)) // idempotent under multiplicity
    assert(once.forall { case (b, r) => b >= 0 && b < m && r >= 1 && r <= 48 })
  }

  test("merge equals registers of the union, including overlapping values") {
    val a = (1 to 300).map(i => s"x$i").toDF("v")
    val b = (200 to 600).map(i => s"x$i").toDF("v") // overlap 200..300
    val merged = DistinctSketch.merge(
      DistinctSketch.registers(a, "v", m),
      DistinctSketch.registers(b, "v", m))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    val whole = DistinctSketch.registers(a.unionByName(b), "v", m)
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(merged.sameElements(whole))
  }

  test("estimate lands within the HLL error envelope and sum_pow is exact") {
    val n = 20000
    val df = (1 to n).map(i => s"item-$i").toDF("v")
    val regs = DistinctSketch.registers(df, "v", m)
    val row = DistinctSketch.estimate(regs, m).collect().head
    // recompute S from the register table driver-side: must match exactly
    val rm = regs.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val s = (0 until m).map(b => 1L << (48 - rm.getOrElse(b.toLong, 0))).sum
    assert(row.getAs[Long]("sum_pow") == s)
    assert(row.getAs[Long]("zero_buckets") == (m - rm.size).toLong)
    val est = row.getAs[Double]("est")
    // standard error 1.04/sqrt(64) ~ 13%; allow 4 sigma
    assert(math.abs(est - n) / n < 0.52, s"est $est vs $n")
  }

  test("register build plan is one hash aggregate — no join, no window") {
    val df = (1 to 1000).map(i => s"t$i").toDF("v")
    val plan = DistinctSketch.registers(df, "v", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
  }

  test("grouped registers equal per-group global registers; estimates match") {
    import spark.implicits._
    // cardinalities in the raw estimator's valid regime (n ≳ m): the
    // portable estimator deliberately omits the small-range linear-counting
    // correction (it needs ln(), which is not bit-portable across engines)
    val df = ((1 to 300).map(i => ("a", s"x$i")) ++
      (1 to 400).map(i => ("b", s"y${i % 200}"))).toDF("g", "v")
    val grouped = DistinctSketch.registersByGroup(df, Seq("g"), "v", m)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (g <- Seq("a", "b")) {
      val solo = DistinctSketch.registers(df.where($"g" === g), "v", m)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(solo == grouped.collect { case ((`g`, b), r) => b -> r })
    }
    val est = DistinctSketch.estimateByGroup(
      DistinctSketch.registersByGroup(df, Seq("g"), "v", m), Seq("g"), m)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est")).toMap
    assert(math.abs(est("a") - 300) / 300 < 0.52)
    assert(math.abs(est("b") - 200) / 200 < 0.52)
  }
}
