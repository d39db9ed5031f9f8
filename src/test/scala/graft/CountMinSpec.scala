package graft

import org.apache.spark.sql.functions._
import graft.operators.CountMin

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  test("estimates never undercount and are exact for collision-free keys") {
    val tokens = (Seq.fill(100)("alpha") ++ Seq.fill(40)("beta") ++
      Seq.fill(7)("gamma") ++ Seq.fill(1)("delta")).toDF("token")
    val grid = CountMin.sketch(tokens, "token", depth, width)
    // grid never exceeds the configured shape and holds the full mass per row
    val cells = grid.collect()
    assert(cells.length <= depth * width)
    val perRow = grid.groupBy("row").agg(sum("cnt").as("m")).collect()
    assert(perRow.length == depth && perRow.forall(_.getAs[Long]("m") == 148L))
    val truth = Map("alpha" -> 100L, "beta" -> 40L, "gamma" -> 7L, "delta" -> 1L)
    val est = CountMin.estimate(grid, tokens.distinct(), "token", depth, width)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("est")).toMap
    truth.foreach { case (t, n) => assert(est(t) >= n, s"undercount on $t") }
    // 4 keys in a 4x64 grid: overwhelmingly collision-free -> exact
    assert(est == truth)
  }

  test("unseen keys estimate to their cells' collision mass (0 when empty)") {
    val tokens = Seq.fill(5)("only").toDF("token")
    val grid = CountMin.sketch(tokens, "token", depth, width)
    val est = CountMin.estimate(grid, Seq("never").toDF("token"), "token", depth, width)
      .collect().head.getAs[Long]("est")
    assert(est == 0L || est == 5L) // 5 only if all 4 rows collide — impossible here
    assert(est == 0L)
  }

  test("merge of disjoint-corpus grids equals the grid of the union") {
    val a = (1 to 50).map(i => s"tok${i % 7}").toDF("token")
    val b = (1 to 80).map(i => s"tok${i % 11}").toDF("token")
    val merged = CountMin.merge(
      CountMin.sketch(a, "token", depth, width),
      CountMin.sketch(b, "token", depth, width))
      .orderBy("row", "bucket").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val whole = CountMin.sketch(a.unionByName(b), "token", depth, width)
      .orderBy("row", "bucket").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(merged.sameElements(whole))
  }

  test("join-size estimate never undercounts and is exact without collisions") {
    // A: key i repeated i times (i=1..5); B: each key once plus strangers
    val a = (1 to 5).flatMap(i => Seq.fill(i)(s"k$i")).toDF("token")
    val b = ((1 to 5).map(i => s"k$i") ++ Seq("x", "y")).toDF("token")
    val w = 4096 // 7 keys in 4096 buckets: collision-free whp
    val ga = CountMin.sketch(a, "token", depth, w)
    val gb = CountMin.sketch(b, "token", depth, w)
    val est = CountMin.joinSizeEstimate(ga, gb).collect().head.getAs[Long]("est")
    val truth = (1 to 5).map(_.toLong).sum // each key i contributes i*1
    assert(est >= truth)
    assert(est == truth)
    // self-join size of A: sum i^2
    val self = CountMin.joinSizeEstimate(ga, ga).collect().head.getAs[Long]("est")
    assert(self == (1 to 5).map(i => i.toLong * i).sum)
  }

  test("estimate plan broadcasts the grid — no shuffle on the key side") {
    val tokens = (1 to 1000).map(i => s"t${i % 13}").toDF("token")
    val grid = CountMin.sketch(tokens, "token", depth, width)
    val plan = CountMin.estimate(grid, tokens.distinct(), "token", depth, width)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"grid join should broadcast:\n$plan")
  }
}
