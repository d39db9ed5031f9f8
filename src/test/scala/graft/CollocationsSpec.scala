package graft

import graft.operators.Collocations

/** Adjacent-bigram collocation mining. */
class CollocationsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "new york is big"),
    (1L, "new york city"),
    (2L, "a new day"),
    (3L, "solo")
  ).toDF("doc_id", "text")

  test("bigram counts, unigram counts, and exact lift") {
    val r = Collocations.topBigrams(docs, "text", k = 10, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // n = 11 tokens; "new york" appears twice; c(new)=3, c(york)=2
    val (cxy, cx, cy, lift) = r(("new", "york"))
    assert(cxy == 2L && cx == 3L && cy == 2L)
    assert(lift == (11L * 2L).toDouble / (3L * 2L).toDouble)
    assert(r(("york", "is"))._1 == 1L)
    // single-token doc contributes no bigrams
    assert(!r.keySet.exists(p => p._1 == "solo" || p._2 == "solo"))
  }

  test("top-k cuts on (count desc, w1, w2) deterministically") {
    val r = Collocations.topBigrams(docs, "text", k = 2, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(r.length == 2)
    assert(r(0) == (("new", "york", 2L)))
    // among the count-1 ties, ("a","new") is the lexicographic minimum
    assert(r(1) == (("a", "new", 1L)))
  }

  test("minCount prunes the rare tail") {
    val r = Collocations.topBigrams(docs, "text", k = 10, minCount = 2L).collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSeq == Seq(("new", "york")))
  }
}
