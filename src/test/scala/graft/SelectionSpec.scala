package graft

import graft.operators.Selection

/** Budget-constrained selection: two-phase engine ≡ global cumsum. */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(
      rows: Seq[(Long, Double, Long)], budget: Long): Set[Long] = {
    var acc = 0L
    rows.sortBy { case (id, sc, _) => (-sc, id) }
      .iterator.filter { case (_, _, t) => acc += t; acc <= budget }
      .map(_._1).toSet
  }

  test("selection equals the global-cumsum reference across budgets and bucket counts") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(400)(i =>
      (i.toLong, math.floor(rnd.nextDouble() * 50) / 50.0, // frequent score ties
        (rnd.nextInt(30) + 1).toLong))
    val df = rows.toDF("doc_id", "score", "n_tokens")
    val total = rows.map(_._3).sum
    for (budget <- Seq(0L, 17L, total / 3, total / 2, total - 1, total, total + 10);
         buckets <- Seq(1, 7, 1024)) {
      val got = Selection.selectByBudget(df, "score", "n_tokens", "doc_id",
        budget, numBuckets = buckets)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == reference(rows, budget),
        s"budget=$budget buckets=$buckets")
    }
  }

  test("per-group selection equals the per-group cumsum reference; fits-all groups keep everything") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(300) { i =>
      val g = Seq("a", "b", "c")(i % 3)
      (i.toLong, g, math.floor(rnd.nextDouble() * 20) / 20.0,
        (rnd.nextInt(30) + 1).toLong)
    } ++ Seq((1000L, "tiny", 0.5, 3L), (1001L, "tiny", 0.9, 4L)) // fits whole
    val df = rows.toDF("doc_id", "g", "score", "n_tokens")
    for (budget <- Seq(40L, 300L, 100000L); buckets <- Seq(1, 7, 256)) {
      val got = Selection.selectByBudgetPerGroup(df, Seq("g"),
          "score", "n_tokens", "doc_id", budget, numBuckets = buckets)
        .select("doc_id", "g").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val ref = rows.groupBy(_._2).flatMap { case (g, rs) =>
        reference(rs.map(r => (r._1, r._3, r._4)), budget).map((_, g))
      }.toSet
      assert(got == ref, s"budget=$budget buckets=$buckets")
      if (budget >= 7L) // the tiny group's whole 7 tokens fit
        assert(got.contains((1000L, "tiny")) && got.contains((1001L, "tiny")))
    }
  }

  test("per-group selection keeps NULL-group rows as their own quota group") {
    // NULL != NULL under a plain equi-join — the boundary attach must be
    // null-safe or the whole NULL group silently vanishes
    val rows = Seq(
      (1L, Option("a"), 0.9, 10L), (2L, Option("a"), 0.8, 10L),
      (3L, Option.empty[String], 0.9, 10L), (4L, Option.empty[String], 0.5, 10L),
      (5L, Option.empty[String], 0.7, 10L))
    val df = rows.toDF("doc_id", "g", "score", "n_tokens")
    val got = Selection.selectByBudgetPerGroup(df, Seq("g"),
        "score", "n_tokens", "doc_id", budget = 20L, numBuckets = 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // group "a": both fit (20 tokens); NULL group: best two of three
    assert(got == Set(1L, 2L, 3L, 5L))
  }

  test("a declared score range clamps out-of-range scores into edge buckets") {
    val rows = Seq.tabulate(100)(i => (i.toLong, i / 100.0, 5L)) ++
      Seq((200L, -0.5, 5L), (201L, 1.7, 5L)) // outside the declared [0,1]
    val df = rows.toDF("doc_id", "score", "n_tokens")
    val got = Selection.selectByBudget(df, "score", "n_tokens", "doc_id",
      budget = 50L, numBuckets = 32, scoreRange = Some((0.0, 1.0)))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == reference(rows, 50L)) // clamping only coarsens phase 1
    assert(got.contains(201L) && !got.contains(200L)) // 1.7 ranks top
  }

  test("null scores or token counts are never selected") {
    val df = Seq(
      (1L, Some(0.9), Some(10L)), (2L, None, Some(5L)),
      (3L, Some(0.8), None), (4L, Some(0.7), Some(10L)))
      .toDF("doc_id", "score", "n_tokens")
    val got = Selection.selectByBudget(df, "score", "n_tokens", "doc_id", 100L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("driver query matches its own window-SQL contract at sf0.001") {
    val got = OpsPack.selectBudget(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.map(_._2).sum <= OpsPack.SelectBudgetTokens)
    // prefix property: every selected doc's quality is >= every excluded
    // doc's quality, except within the boundary-score tie region resolved
    // by id — checked by re-running the reference on the scored frame
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val scored = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), TextOps.qualityScore(col("text")).as("q"),
        TextOps.tokenCount(col("text")).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.map(_._1).toSet == reference(scored.toSeq, OpsPack.SelectBudgetTokens))
  }
}
