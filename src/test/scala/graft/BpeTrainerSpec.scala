package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrainer

class BpeTrainerSpec extends SparkTestBase {
  import spark.implicits._

  test("topMerges matches the hand-computed classic example") {
    val df = Seq("aaab aaab aab").toDF("text")
    val got = BpeTrainer.topMerges(df, "text", 3)
      .orderBy("step")
      .as[(Long, String, String, String, Long)].collect().toSeq
    // wf: aaab×2, aab×1. step1: (a,a) count 2·2+1 = 5 → merge "aa";
    // step2: tie (a,b)=2 vs (aa,a)=2 broken lexicographically → (a,b);
    // step3: (aa,ab) appears twice in aaab's encoding (aa)(ab).
    assert(got == Seq(
      (1L, "a", "a", "aa", 5L),
      (2L, "a", "b", "ab", 2L),
      (3L, "aa", "ab", "aaab", 2L)))
  }

  /** Naive reference BPE over a word-frequency map (Sennrich alg. 1). */
  private def naiveBpe(wf: Map[String, Long], steps: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wf.map { case (w, c) => w.toVector.map(_.toString) -> c }
    val out = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to steps) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((a, b), n) = counts.toSeq.minBy { case ((x, y), m) => (-m, x, y) }
        out += ((a, b, n))
        words = words.map { case (syms, c) =>
          val acc = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              acc += (a + b); i += 2
            } else { acc += syms(i); i += 1 }
          }
          acc.result() -> c
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("topMerges agrees with a naive reference on a mixed corpus") {
    val text = "the cat then that the rethink cathode " +
      "banana bandana ban nab the then thesis apple apply appliance"
    val df = Seq(text, "the rethink banana apple the cat").toDF("text")
    val wf = df.select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .select(lower(col("t")).as("w")).where(col("w").rlike("^[a-z]+$"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val expect = naiveBpe(wf, 6)
    val got = BpeTrainer.topMerges(df, "text", 6)
      .orderBy("step")
      .as[(Long, String, String, String, Long)].collect().toSeq
      .map(t => (t._2, t._3, t._5))
    assert(got == expect)
  }

  test("encodeWords replays merges and counts symbols") {
    val words = Seq("the", "then", "cat").toDF("w")
    val m = BpeTrainer.encodeWords(words, "w", Seq(("t", "h"), ("th", "e")))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(m("the") == (("(the)", 1)))
    assert(m("then") == (("(the)(n)", 2)))
    assert(m("cat") == (("(c)(a)(t)", 3)))
  }

  test("non-alpha and mixed-case tokens are normalized or dropped") {
    val df = Seq("The THE the 123 a-b").toDF("text")
    val wf = BpeTrainer.wordFrequencies(df, "text")
      .as[(String, Long)].collect().toMap
    assert(wf == Map("the" -> 3L))
  }
}
