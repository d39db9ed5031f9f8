package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Wagner-Fischer, for brute-force ground truth. */
  private def ed(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def brute(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (i1, s1) <- strs; (i2, s2) <- strs if i1 < i2
      d = ed(s1, s2) if d <= k
    } yield (i1, i2, d)).toSet

  private def run(strs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.selfJoin(strs.toDF("id", "s"), "id", "s", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("complete on an adversarial mixed-length set (insertions, deletions, shifts)") {
    // crafted around the shift bound: edits early in the string displace
    // later segments, which is exactly what the ±k probe window covers
    val strs = Seq(
      "abcdefgh", "Xabcdefgh", "bcdefgh", "abXcdeYgh", "abcdefghXY",
      "zabcdefg", "abcdefij", "ab", "a", "", "abcdefgh", // dup text, distinct id
      "hgfedcba", "aabbccdd", "abccdefgh", "acdefgh", "abcdffgh"
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (k <- 1 to 3)
      assert(run(strs.filter(_._2.nonEmpty), k) == brute(strs.filter(_._2.nonEmpty), k),
        s"mismatch at k=$k")
  }

  test("random fuzz: blocked result equals brute force") {
    val rnd = new scala.util.Random(42)
    val alpha = "abc" // tiny alphabet -> dense near-pairs
    val strs = (0L until 60L).map(i =>
      (i, (0 until (3 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(3))).mkString))
    for (k <- 1 to 2)
      assert(run(strs, k) == brute(strs, k), s"fuzz mismatch at k=$k")
  }

  test("dictionary linkage maps class sizes back and self-pairs never appear") {
    val df = Seq("red bolt", "red bolt", "red bolt", "red colt", "blue bolt", "green dress")
      .toDF("v")
    val out = FuzzyJoin.linkValues(df, "v", 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    assert(out.forall { case (a, b, _, _, _) => a < b })
    val m = out.map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    // "red bolt" (n=3) vs "red colt" (n=1): one substitution
    assert(m(("red bolt", "red colt")) == ((1, 3L, 1L)))
    // "blue bolt" vs "red bolt": ed 3 > k — absent
    assert(!m.contains(("blue bolt", "red bolt")))
    assert(m.contains(("red colt", "red bolt")) == false)
  }

  test("plan has no cartesian product and no nested-loop join") {
    val df = (0L until 100L).map(i => (i, s"str$i")).toDF("id", "s")
    val plan = FuzzyJoin.selfJoin(df, "id", "s", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
