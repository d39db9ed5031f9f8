package graft

import graft.operators._
import graft.sources.Bucketing

/** Bucketed-table compare: the join consumes the tables' bucket
  * partitioning, so the whole compare plans with ZERO exchanges. */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed inputs + assume-hints give an exchange-free compare") {
    val a = (1 to 200).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "v")
    val b = (3 to 202).map(i => (i.toLong, s"name_$i", if (i % 7 == 0) i * 2.5 else i * 1.5))
      .toDF("id", "name", "v")
    Bucketing.writeBucketed(a, "graft_bucket_a", Seq("id"), buckets = 4)
    Bucketing.writeBucketed(b, "graft_bucket_b", Seq("id"), buckets = 4)
    val ta = spark.table("graft_bucket_a")
    val tb = spark.table("graft_bucket_b")
    val c = new SparkCompare(spark, ta, tb, CompareConfig(
      joinColumns = Seq("id"),
      assumeKeysUnique = Some(true), assumeKeysNullFree = Some(true)))
    // correctness first
    assert(c.intersectCount == 198)
    assert(c.df1UnqCount == 2 && c.df2UnqCount == 2)
    val vStat = c.columnStats.find(_.column == "v").get
    assert(vStat.unequalCnt == (3 to 202).count(i => i % 7 == 0 && i <= 200))
    // plan shape: no Exchange anywhere — both sides scan bucketed files
    // already hash-partitioned on the join key
    val plan = c.intersectRows.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected exchange-free plan, got:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
    spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
  }
}
