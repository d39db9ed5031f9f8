package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Search, Sessionize}

/** As-of join, batch sessionization, and BM25 search semantics. */
class AsOfSearchSpec extends SparkTestBase {
  import spark.implicits._

  // ---- as-of join ----

  private def rights = Seq(
    // (user, ts, id, value) — two rows tie at (1, 20)
    (1L, 10L, 100L, 1.0), (1L, 20L, 105L, 2.0), (1L, 20L, 106L, 3.0),
    (1L, 40L, 110L, 4.0), (2L, 15L, 200L, 9.0))
    .toDF("user_id", "ts", "event_id", "value")

  private def lefts = Seq(
    (1L, 5L, 1L), (1L, 20L, 2L), (1L, 35L, 3L), (1L, 100L, 4L),
    (2L, 15L, 5L), (3L, 50L, 6L))
    .toDF("user_id", "ts", "event_id")

  test("asof backward: latest at-or-before, inclusive, max-tie wins") {
    val got = AsOf.asofBackward(lefts, rights, Seq("user_id"), "ts",
      payload = Seq("event_id", "value"), tieCol = "event_id")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got == Map(
      1L -> None,        // ts 5: nothing before
      2L -> Some(106L),  // ts 20: inclusive match, tie → max event_id
      3L -> Some(106L),  // ts 35: most recent is the 20-pair's winner
      4L -> Some(110L),  // ts 100: latest overall
      5L -> Some(200L),  // other key, inclusive
      6L -> None))       // key with no rights at all
  }

  test("asof backward: tolerance nulls matches that are too old") {
    val got = AsOf.asofBackward(lefts, rights, Seq("user_id"), "ts",
      payload = Seq("event_id"), tieCol = "event_id",
      tolerance = Some(lit(10L)))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    // ts 100 is 60 past the latest right (40) → nulled; ts 35 is 15 past 20 → nulled
    assert(got(4L).isEmpty && got(3L).isEmpty)
    assert(got(2L).contains(106L) && got(5L).contains(200L))
  }

  test("asof forward: earliest at-or-after, mirror semantics") {
    val got = AsOf.asofForward(lefts, rights, Seq("user_id"), "ts",
      payload = Seq("event_id"), tieCol = "event_id")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got == Map(
      1L -> Some(100L),  // ts 5 → next right at 10
      2L -> Some(106L),  // inclusive at 20, max tie
      3L -> Some(110L),  // ts 35 → next at 40
      4L -> None,        // nothing after 100
      5L -> Some(200L),
      6L -> None))
  }

  test("asof is joinless and partitioning-invariant") {
    val df = AsOf.asofBackward(
      lefts.repartition(7), rights.repartition(5), Seq("user_id"), "ts",
      payload = Seq("event_id"), tieCol = "event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
    val base = AsOf.asofBackward(lefts, rights, Seq("user_id"), "ts",
      payload = Seq("event_id"), tieCol = "event_id")
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == base)
  }

  test("asof nearest: closer side wins, distance ties go backward") {
    val got = AsOf.asofNearest(lefts, rights, Seq("user_id"), "ts",
      payload = Seq("event_id"), tieCol = "event_id")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got == Map(
      1L -> Some(100L), // ts 5: only forward (10) exists
      2L -> Some(106L), // exact hit at 20 (distance 0, backward)
      3L -> Some(110L), // ts 35: fwd 40 (d=5) beats bwd 20 (d=15)
      4L -> Some(110L), // ts 100: only backward
      5L -> Some(200L),
      6L -> None))
    // distance tie: left at 30 sits 10 from both 20 and 40 → backward wins
    val tie = AsOf.asofNearest(
      Seq((1L, 30L, 9L)).toDF("user_id", "ts", "event_id"),
      rights, Seq("user_id"), "ts", Seq("event_id"), "event_id")
      .collect().head
    assert(tie.getLong(4) == 106L)
    // tolerance bounds both directions before the pick
    val tol = AsOf.asofNearest(lefts, rights, Seq("user_id"), "ts",
      Seq("event_id"), "event_id", tolerance = Some(lit(5L)))
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(tol(1L).contains(100L) && tol(3L).contains(110L)
      && tol(4L).isEmpty && tol(2L).contains(106L))
  }

  test("asof nearest agrees with brute force on random data") {
    val rnd = new scala.util.Random(13)
    val rs = Seq.fill(250)((rnd.nextInt(8).toLong, rnd.nextInt(60).toLong))
      .distinct.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val ls = Seq.fill(180)((rnd.nextInt(10).toLong, rnd.nextInt(70).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, (1000 + i).toLong) }
    val got = AsOf.asofNearest(
      ls.toDF("user_id", "ts", "event_id"), rs.toDF("user_id", "ts", "event_id"),
      Seq("user_id"), "ts", Seq("event_id"), "event_id")
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(4)) None else Some(x.getLong(4)))).toMap
    val byKey = rs.groupBy(_._1)
    val expected = ls.map { case (k, t, id) =>
      val cands = byKey.getOrElse(k, Nil)
      val bwd = cands.filter(_._2 <= t).sortBy(x => (x._2, x._3)).lastOption
      val fwdTs = cands.filter(_._2 > t).map(_._2).sorted.headOption
      val fwd = fwdTs.flatMap(ft =>
        cands.filter(_._2 == ft).sortBy(_._3).headOption)
      val pick = (bwd, fwd) match {
        case (Some(b), Some(f)) =>
          if (t - b._2 <= f._2 - t) Some(b._3) else Some(f._3)
        case (Some(b), None) => Some(b._3)
        case (None, Some(f)) => Some(f._3)
        case _ => None
      }
      id -> pick
    }.toMap
    assert(got == expected)
  }

  test("asof agrees with a brute-force argmax join on random data") {
    val rnd = new scala.util.Random(7)
    val rs = Seq.fill(300)((rnd.nextInt(10).toLong, rnd.nextInt(50).toLong,
      rnd.nextInt(1000).toLong)).distinct
      .zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v.toDouble) }
    val ls = Seq.fill(200)((rnd.nextInt(12).toLong, rnd.nextInt(60).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, (1000 + i).toLong) }
    val r = rs.toDF("user_id", "ts", "event_id", "value")
    val l = ls.toDF("user_id", "ts", "event_id")
    val got = AsOf.asofBackward(l, r, Seq("user_id"), "ts",
      payload = Seq("event_id"), tieCol = "event_id")
      .collect().map(x => x.getLong(2) ->
        (if (x.isNullAt(4)) None else Some(x.getLong(4)))).toMap
    // reference: per left row, max (ts, id) among rights with ts <= left.ts
    val byKey = rs.groupBy(_._1)
    val expected = ls.map { case (k, t, id) =>
      id -> byKey.getOrElse(k, Nil).filter(_._2 <= t)
        .sortBy(x => (x._2, x._3)).lastOption.map(_._3)
    }.toMap
    assert(got == expected)
  }

  // ---- sessionization ----

  test("sessionize: gap splits, tie handling, exact rollup") {
    val ev = Seq(
      // user 1: ts minutes 0,10,50,60 with 30-min gap → two sessions
      (1L, 0L, 1L, 1.5), (1L, 600L, 2L, 2.5),
      (1L, 3000L, 3L, 4.0), (1L, 3600L, 4L, 8.0),
      // user 2: single event
      (2L, 100L, 5L, 1.0))
      .toDF("user_id", "us", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("us") * 1000000L))
    val got = Sessionize.sessionStats(ev, "user_id", "ts", "event_id",
      gapSeconds = 1800L, valueCol = "value")
      .orderBy("user_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(6) / 1000000L, r.getDouble(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 2L, 600L, 4.0),
      (1L, 2L, 2L, 600L, 12.0),
      (2L, 1L, 1L, 0L, 1.0)))
  }

  test("sessionize: session numbering is deterministic under repartitioning") {
    val rnd = new scala.util.Random(3)
    val ev = Seq.fill(500)((rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong))
      .zipWithIndex.map { case ((u, s), i) => (u, s, i.toLong, 1.0) }
      .toDF("user_id", "s", "event_id", "value")
      .withColumn("ts", timestamp_micros(col("s") * 1000000L))
    val a = Sessionize.withSessionSeq(ev, "user_id", "ts", "event_id", 60L)
      .select("event_id", "session_seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sessionize.withSessionSeq(ev.repartition(13), "user_id", "ts", "event_id", 60L)
      .select("event_id", "session_seq").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  // ---- BM25 search ----

  private def corpus = Seq(
    (1L, "Apple banana apple!"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry apple"),
    (4L, "durian melon"))
    .toDF("doc_id", "text")

  test("corpus stats: tokenization, doc frequencies, total length") {
    val st = Search.corpusStats(corpus, "text", Seq("apple", "cherry"))
    assert(st.n == 4 && st.totalLen == 3 + 2 + 4 + 2)
    assert(st.df == Map("apple" -> 2L, "cherry" -> 2L))
  }

  test("portable BM25 matches a BigInt reference computation") {
    val terms = Seq("apple", "cherry")
    val st = Search.corpusStats(corpus, "text", terms)
    val got = Search.bm25TopKPortable(corpus, "text", "doc_id", terms, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference scorer in exact BigInt arithmetic
    val docs = Map(1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("banana", "cherry"),
      3L -> Seq("cherry", "cherry", "cherry", "apple"),
      4L -> Seq("durian", "melon"))
    def score(toks: Seq[String]): BigInt = terms.map { t =>
      val tf = BigInt(toks.count(_ == t))
      if (tf == 0) BigInt(0) else {
        val n = BigInt(st.n); val tl = BigInt(st.totalLen)
        val df = BigInt(st.df(t)); val dl = BigInt(toks.size)
        val num = (2 * (n - df) + 1) * 22 * tl * tf
        val den = (2 * df + 1) * (10 * tl * tf + 3 * tl + 9 * dl * n)
        (num / den) * 10000 + (num % den) * 10000 / den
      }
    }.sum
    val expected = docs.view.mapValues(score).filter(_._2 > 0)
      .mapValues(_.toLong).toMap
    assert(got == expected)
    assert(!got.contains(4L)) // no query term → filtered
  }

  test("double and portable BM25 agree on the matched set and top doc") {
    val terms = Seq("apple", "cherry")
    val dbl = Search.bm25TopK(corpus, "text", "doc_id", terms, k = 10)
      .collect().map(_.getLong(0))
    val fix = Search.bm25TopKPortable(corpus, "text", "doc_id", terms, k = 10)
      .collect().map(_.getLong(0))
    assert(dbl.toSet == fix.toSet)
    // doc 3 carries three 'cherry' hits + an 'apple' — top under both
    assert(dbl.head == 3L && fix.head == 3L)
  }

  test("persisted inverted index: probe equals the scan-based scorer, pruned") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("dup", "vector", "merge")
    val path = "target/test_inverted_index"
    Search.writeInvertedIndex(docs, "text", "doc_id", path, numBuckets = 64)
    val probe = Search.bm25TopKFromIndex(spark, path, terms, k = 25,
      numBuckets = 64)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    val fromIndex = probe.collect().map(_.toSeq).toSeq
    val fromScan = Search.bm25TopKPortable(docs, "text", "doc_id", terms, k = 25)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex == fromScan) // bit-identical scores, ranks, tf columns
  }

  test("streaming index ingest: probe equals accumulated-corpus scan per batch") {
    import graft.streaming.IngestSearch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def rm(p: String): Unit = {
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val indexPath = "target/ingest_inv_index"
    rm(indexPath)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // compaction fires after the third batch (batchId 2: (2+1) % 3 == 0),
    // so the final per-batch probe equality below also pins scores across
    // the self-compaction rewrite
    val q = IngestSearch.ingestToIndex(
      input.toDF().toDF("doc_id", "text"), indexPath, "text", "doc_id",
      numBuckets = 16, compactEveryBatches = 3, compactMaxFiles = 1)
    val terms = Seq("apple", "cherry")
    val batches = Seq(
      Seq((1L, "apple banana apple"), (2L, "banana cherry")),
      Seq((3L, "cherry cherry cherry apple"), (4L, "durian melon")),
      Seq((5L, "apple apple cherry durian plum")))
    try {
      var acc = Seq.empty[(Long, String)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        acc = acc ++ b
        val fromIndex = Search.bm25TopKFromIndex(spark, indexPath, terms,
          k = 10, numBuckets = 16).collect().map(_.toSeq).toSeq
        val fromScan = Search.bm25TopKPortable(
          acc.toDF("doc_id", "text"), "text", "doc_id", terms, k = 10)
          .collect().map(_.toSeq).toSeq
        assert(fromIndex == fromScan, s"after batch with ${b.map(_._1)}")
      }
      // the wired compactor actually ran: bucket dirs that had accumulated
      // one file per batch now hold compactor-written files
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val dataFiles = walk(new java.io.File(indexPath)).filter(f =>
        f.getName.endsWith(".parquet") &&
          f.getParentFile.getName.startsWith("bucket="))
      assert(dataFiles.exists(_.getName.startsWith("graft-compact-")),
        s"expected compactor-written files, got ${dataFiles.map(_.getName)}")
      val perDir = dataFiles.groupBy(_.getParentFile.getName).values.map(_.size)
      assert(perDir.forall(_ == 1),
        "every bucket dir should be back to one data file after self-compaction")
    } finally q.stop()
  }

  test("streaming trigram ingest: grep equals accumulated-corpus contains per batch") {
    import graft.streaming.IngestTrigram
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val indexPath = "target/ingest_trgm_index"
    graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(indexPath))
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // compaction fires after batch 3 (batchId 2), so the final probe
    // equality also pins grep across the self-compaction rewrite
    val q = IngestTrigram.ingestToIndex(
      input.toDF().toDF("doc_id", "text"), indexPath, "text", "doc_id",
      numBuckets = 16, compactEveryBatches = 3, compactMaxFiles = 1)
    val batches = Seq(
      Seq((1L, "the quick brown fox"), (2L, "pack my box with jugs")),
      Seq((3L, "quick silver foxes box"), (4L, "wholly unrelated text")),
      Seq((5L, "a fox in a box")))
    try {
      var acc = Seq.empty[(Long, String)]
      for (b <- batches) {
        input.addData(b: _*)
        q.processAllAvailable()
        acc = acc ++ b
        for (pat <- Seq("fox", "box")) {
          val fromIndex = Search.substringSearchFromIndex(spark, indexPath,
            acc.toDF("doc_id", "text"), "text", "doc_id", pat, numBuckets = 16)
            .collect().map(_.getLong(0)).sorted.toSeq
          val fromScan = acc.filter(_._2.contains(pat)).map(_._1).sorted
          assert(fromIndex == fromScan, s"pattern '$pat' after ${b.map(_._1)}")
        }
      }
      // at-least-once replay duplicates postings; the distinct-gram count
      // keeps every true match (a row count would overshoot and drop them)
      Search.appendToTrigramIndex(
        batches.head.toDF("doc_id", "text"), "text", "doc_id", indexPath, 16)
      val replayed = Search.substringSearchFromIndex(spark, indexPath,
        acc.toDF("doc_id", "text"), "text", "doc_id", "fox", numBuckets = 16)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(replayed == acc.filter(_._2.contains("fox")).map(_._1).sorted)
      // bucket-count drift is rejected on append AND on probe
      intercept[IllegalArgumentException] {
        Search.appendToTrigramIndex(
          batches.head.toDF("doc_id", "text"), "text", "doc_id", indexPath, 32)
      }
      intercept[IllegalArgumentException] {
        Search.substringSearchFromIndex(spark, indexPath,
          acc.toDF("doc_id", "text"), "text", "doc_id", "fox", numBuckets = 32)
      }
      // the wired compactor ran
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      assert(walk(new java.io.File(indexPath)).exists(
        _.getName.startsWith("graft-compact-")))
    } finally q.stop()
  }

  test("index append rejects a mismatched bucket count") {
    val path = "target/test_inv_bucket_guard"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    Search.writeInvertedIndex(corpus, "text", "doc_id", path, numBuckets = 16)
    val e = intercept[IllegalArgumentException] {
      Search.appendToInvertedIndex(corpus, "text", "doc_id", path,
        numBuckets = 32)
    }
    assert(e.getMessage.contains("16 buckets"))
  }

  test("trigram index grep: equals the full-scan contains, pruned probe") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = "target/test_trigram_index"
    Search.writeTrigramIndex(docs, "text", "doc_id", path, numBuckets = 32)
    for (pattern <- Seq("window window", "merge part", "zzz no such text")) {
      val probe = Search.substringSearchFromIndex(
        spark, path, docs, "text", "doc_id", pattern, numBuckets = 32)
      val got = probe.collect().map(_.getLong(0)).sorted.toSeq
      val ref = docs.where(org.apache.spark.sql.functions.col("text")
        .contains(pattern)).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == ref, s"pattern '$pattern'")
    }
    // the probe's index scan is partition-pruned to the pattern's buckets
    val plan = Search.substringSearchFromIndex(
        spark, path, docs, "text", "doc_id", "window win", numBuckets = 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"), plan)
    // sub-trigram patterns are rejected, not silently unindexed
    intercept[IllegalArgumentException] {
      Search.substringSearchFromIndex(
        spark, path, docs, "text", "doc_id", "ab", numBuckets = 32)
    }
  }

  test("trigram grep: low-selectivity patterns fall back to a full scan, never a corpus broadcast") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val path = "target/test_trigram_index_guard"
    Search.writeTrigramIndex(docs, "text", "doc_id", path, numBuckets = 32)
    // "the " is deliberately common — its candidate set approaches the
    // corpus, so with a 1-candidate broadcast limit the guard must refuse
    // the broadcast and run the plain contains scan instead
    val guarded = Search.substringSearchFromIndex(
      spark, path, docs, "text", "doc_id", "the ", numBuckets = 32,
      broadcastLimit = 1L)
    val plan = guarded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("BroadcastExchange"),
      s"fallback must not broadcast a corpus-sized candidate frame:\n$plan")
    val got = guarded.collect().map(_.getLong(0)).sorted.toSeq
    val ref = docs.where(col("text").contains("the ")).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == ref && got.nonEmpty)
    // the same pattern under the default limit still matches the full scan
    val broadcastPath = Search.substringSearchFromIndex(
      spark, path, docs, "text", "doc_id", "the ", numBuckets = 32)
    assert(broadcastPath.collect().map(_.getLong(0)).sorted.toSeq == ref)
  }

  test("bm25 scoring pass plans no shuffle before the top-k") {
    // a parquet-backed corpus, so the scan isn't constant-folded away
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Search.bm25TopKPortable(docs, "text", "doc_id",
      Seq("merge", "dup"), k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashAggregate"),
      s"scoring should be a pure map-side pass:\n$plan")
  }

  test("discountedReturns: hand-computed 16-step gamma=1/2 returns, " +
    "horizon truncation, trajectory isolation per key, NULL rewards as 0, " +
    "all-long arithmetic with the exact dyadic double view") {
    import graft.operators.Sessionize
    // key 1: rewards 4, 2, 8 at steps 1..3 (h=16 covers the whole tail):
    //   G1 = 4 + 2/2 + 8/4 = 7; G2 = 2 + 8/2 = 6; G3 = 8
    // key 2: a single step; NULL reward contributes 0 where it is a TAP
    // but keeps its own row (null-scaled return at its own step uses 0)
    val ev = Seq(
      (1L, 1000L, 10L, Some(4L)), (1L, 2000L, 11L, Some(2L)),
      (1L, 3000L, 12L, Some(8L)),
      (2L, 1000L, 20L, Some(5L)),
      (3L, 1000L, 30L, None), (3L, 2000L, 31L, Some(6L)))
      .toDF("k", "tsv", "id", "r")
      .withColumn("ts", timestamp_micros(col("tsv")))
    val out = Sessionize.discountedReturns(ev, "k", "ts", "id", "r", 16)
      .select("k", "step", "return_scaled", "return_x").collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> (x.getLong(2), x.getDouble(3)))
      .toMap
    val s = 1L << 15
    assert(out((1L, 1L)) == ((7L * s, 7.0)))
    assert(out((1L, 2L)) == ((6L * s, 6.0)))
    assert(out((1L, 3L)) == ((8L * s, 8.0)))
    assert(out((2L, 1L)) == ((5L * s, 5.0))) // no cross-key leakage
    assert(out((3L, 1L)) == ((3L * s, 3.0))) // own reward NULL→0, next 6/2
    assert(out((3L, 2L)) == ((6L * s, 6.0)))
    // horizon truncation: h=2 sees only one tap ahead
    val h2 = Sessionize.discountedReturns(ev.where(col("k") === 1L),
      "k", "ts", "id", "r", 2)
      .select("step", "return_x").collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(h2 == Map(1L -> 5.0, 2L -> 6.0, 3L -> 8.0)) // 4+2/2, 2+8/2, 8
    intercept[IllegalArgumentException] {
      Sessionize.discountedReturns(ev, "k", "ts", "id", "r", 0)
    }
    intercept[IllegalArgumentException] {
      Sessionize.discountedReturns(ev.withColumn("step", lit(1)),
        "k", "ts", "id", "r", 4)
    }
  }

  test("discountedReturns rational γ: hand-computed γ=3/4 returns, the " +
    "(horizon, γ) plan-time requires, and the per-row overflow guard " +
    "raising on |r| beyond the enforced bound") {
    import graft.operators.Sessionize
    val ev = Seq(
      (1L, 1000L, 10L, Some(4L)), (1L, 2000L, 11L, Some(2L)),
      (1L, 3000L, 12L, Some(8L)))
      .toDF("k", "tsv", "id", "r")
      .withColumn("ts", timestamp_micros(col("tsv")))
    // h=3, γ=3/4: weights (16, 12, 9), scale 2^4 = 16
    //   G1 = 4 + 2·(3/4) + 8·(9/16) = 10; G2 = 2 + 8·(3/4) = 8; G3 = 8
    val out = Sessionize.discountedReturns(ev, "k", "ts", "id", "r",
      horizon = 3, gammaNum = 3L, gammaLog2Den = 2)
      .select("step", "return_scaled", "return_x").collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(out == Map(1L -> ((160L, 10.0)), 2L -> ((128L, 8.0)),
      3L -> ((128L, 8.0))))
    // γ > 1, an overflowing scale, and an overflowing weight sum are all
    // plan-time rejections naming the constraint
    intercept[IllegalArgumentException] {
      Sessionize.discountedReturns(ev, "k", "ts", "id", "r", 3,
        gammaNum = 5L, gammaLog2Den = 2)
    }
    val exScale = intercept[IllegalArgumentException] {
      Sessionize.discountedReturns(ev, "k", "ts", "id", "r", 9,
        gammaNum = 3L, gammaLog2Den = 8)
    }
    assert(exScale.getMessage.contains("overflows a long"))
    val exSum = intercept[IllegalArgumentException] {
      Sessionize.discountedReturns(ev, "k", "ts", "id", "r", 32,
        gammaNum = 4L, gammaLog2Den = 2) // γ = 1: Σ weights = 32·2^62
    }
    assert(exSum.getMessage.contains("tap weights"))
    // per-row guard: Σ weights = 37 at (3, 3/4) ⇒ bound = Long.Max/37;
    // one reward past it must raise, naming the operator — not wrap
    val big = Long.MaxValue / 30L
    val hot = Seq((1L, 1000L, 10L, big)).toDF("k", "tsv", "id", "r")
      .withColumn("ts", timestamp_micros(col("tsv")))
    val err = intercept[Throwable] {
      Sessionize.discountedReturns(hot, "k", "ts", "id", "r",
        horizon = 3, gammaNum = 3L, gammaLog2Den = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("discountedReturns overflow")),
      messages(err).mkString(" | "))
    // the same magnitude is FINE at γ = 1/2, h = 1 (Σ weights = 1):
    // the bound is per-(horizon, γ), not a blanket cap
    val ok = Sessionize.discountedReturns(hot, "k", "ts", "id", "r", 1)
      .select("return_scaled").collect().map(_.getLong(0))
    assert(ok.toSeq == Seq(big))
  }
}
