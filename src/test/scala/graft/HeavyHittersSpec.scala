package graft

import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** A skewed stream: token "t<i>" appears i times (i = 1..60), so totals
    * and thresholds are known in closed form. N = 1830. */
  private def skewed = {
    val rows = (1 to 60).flatMap(i => Seq.fill(i)(s"t$i"))
    // deliberately many partitions so per-partition summaries must merge
    spark.createDataset(rows).repartition(7).toDF("token")
  }

  test("heavy hitters are exact vs a plain groupBy at every threshold") {
    val toks = skewed
    val naive = toks.groupBy("token").agg(count(lit(1)).as("freq"))
    for (denom <- Seq(40L, 100L)) {
      val total = 1830L
      val expected = naive.where(col("freq") * denom >= total)
        .orderBy(col("freq").desc, col("token"))
        .as[(String, Long)].collect().toSeq
      val got = HeavyHitters.heavyHitters(toks, "token", denom, capacity = denom.toInt)
        .orderBy(col("freq").desc, col("token"))
        .as[(String, Long)].collect().toSeq
      assert(got == expected, s"denom=$denom")
      assert(got.nonEmpty)
    }
  }

  test("candidate summaries are complete above N/(capacity+1) with tiny capacity") {
    // capacity 5 over the skewed stream: guarantee says every token with
    // count > 1830/6 = 305 must appear — none qualify, but the top token
    // (60 occurrences) should still usually survive; assert only the
    // PROVEN property: per-partition lower bounds never exceed true counts,
    // and the summary is bounded by capacity × partitions.
    val summaries = HeavyHitters.candidateSummaries(skewed, "token", capacity = 5)
      .groupBy("token").agg(sum("lower_bound").as("lb"))
    val trueCounts = skewed.groupBy("token").agg(count(lit(1)).as("freq"))
    val joined = summaries.join(trueCounts, "token")
      .where(col("lb") > col("freq"))
    assert(joined.count() == 0, "lower bound exceeded a true count")
    assert(summaries.count() <= 5L * 7L + 7L)
  }

  test("recount plan: broadcast left-semi join, never a sort-merge join") {
    val plan = HeavyHitters.heavyHitters(skewed, "token", 40L, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("empty input yields empty result") {
    val empty = spark.emptyDataset[String].toDF("token")
    assert(HeavyHitters.heavyHitters(empty, "token", 10L, 16).count() == 0)
  }

  test("all-identical stream returns the single token with its exact count") {
    val toks = spark.createDataset(Seq.fill(100)("x")).repartition(3).toDF("token")
    val got = HeavyHitters.heavyHitters(toks, "token", 2L, 8)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 100L)))
  }
}
