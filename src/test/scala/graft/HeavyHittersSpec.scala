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

  /** Two groups with very different stream lengths: g "big" carries the
    * skewed 1..60 stream (N = 1830), g "small" just 10 tokens — whose
    * heavy tokens would be invisible against the combined N. */
  private def skewedGrouped = {
    val big = (1 to 60).flatMap(i => Seq.fill(i)(("big", s"t$i")))
    val small = Seq.fill(6)(("small", "hot")) ++
      Seq(("small", "a"), ("small", "b"), ("small", "c"), ("small", "d"))
    spark.createDataset(big ++ small).repartition(7).toDF("g", "token")
  }

  test("per-group heavy hitters are exact vs a per-group groupBy/having") {
    val toks = skewedGrouped
    val naive = toks.groupBy("g", "token").agg(count(lit(1)).as("freq"))
      .join(toks.groupBy("g").agg(count(lit(1)).as("n")), "g")
    for (denom <- Seq(10L, 40L)) {
      val expected = naive.where(col("freq") * denom >= col("n"))
        .select("g", "token", "freq")
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      val got = HeavyHitters.heavyHittersByGroup(toks, "g", "token",
        denom, capacity = denom.toInt)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(got == expected, s"denom=$denom")
      assert(got.nonEmpty)
    }
    // the small group's heavy token IS found (6/10 ≥ 1/10) even though
    // 6/1840 of the combined stream is far below every global threshold —
    // the question the global operator cannot answer
    val got10 = HeavyHitters.heavyHittersByGroup(toks, "g", "token", 10L, 10)
      .as[(String, String, Long)].collect()
    assert(got10.exists(r => r._1 == "small" && r._2 == "hot" && r._3 == 6L))
  }

  test("per-group summaries: per-group sentinels and lower bounds never exceed truth") {
    val toks = skewedGrouped
    val summaries = HeavyHitters.candidateSummariesByGroup(toks, "g", "token", 5)
      .groupBy("g", "token").agg(sum("lower_bound").as("lb"))
    // sentinels (token NULL) sum to each group's exact stream length
    val totals = summaries.where(col("token").isNull)
      .select("g", "lb").as[(String, Long)].collect().toMap
    assert(totals == Map("big" -> 1830L, "small" -> 10L))
    val trueCounts = toks.groupBy("g", "token").agg(count(lit(1)).as("freq"))
    assert(summaries.where(col("token").isNotNull)
      .join(trueCounts, Seq("g", "token"))
      .where(col("lb") > col("freq")).count() == 0,
      "a per-group lower bound exceeded a true count")
    // NULL groups and NULL tokens are excluded, not sketched
    val withNulls = spark.createDataset(
      Seq((null: String, "x"), ("g1", null: String), ("g1", "y")))
      .toDF("g", "token")
    val s2 = HeavyHitters.candidateSummariesByGroup(withNulls, "g", "token", 4)
    assert(s2.where(col("g").isNull).count() == 0)
    // g1's sentinel counts only the non-null token
    assert(s2.where(col("token").isNull)
      .agg(sum("lower_bound")).first().getLong(0) == 1L)
  }

  test("per-group recount plan stays broadcast, never a sort-merge join") {
    val plan = HeavyHitters.heavyHittersByGroup(skewedGrouped, "g", "token", 10L, 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("per-group candidate broadcast is gated: above the limit the semi join shuffles") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = HeavyHitters.heavyHittersByGroup(skewedGrouped, "g", "token",
        10L, 64, broadcastCandidateLimit = 0L)
      val plan = gated.queryExecution.executedPlan.toString
      // the tiny localized totals still broadcast (groups-bounded by
      // contract); the SEMI join against the candidate set must not
      val semiBroadcast = plan.linesIterator
        .exists(l => l.contains("LeftSemi") && l.contains("Broadcast"))
      assert(!semiBroadcast,
        s"above the limit the candidate semi join must not broadcast:\n$plan")
      // results identical to the broadcast path — the gate is a plan choice
      val viaBroadcast = HeavyHitters.heavyHittersByGroup(skewedGrouped, "g", "token",
        10L, 64)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      val viaShuffle = gated
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming per-group heavy hitters: merged persisted summaries equal the batch operator; replay converges") {
    import graft.streaming.IngestHeavyHitters
    val root = java.nio.file.Files.createTempDirectory("graft_hh_stream").toString
    val (sp, cp) = (s"$root/summaries", s"$root/corpus")
    try {
      val toks = skewedGrouped
      val parts = toks.randomSplit(Array(0.4, 0.3, 0.3), seed = 7L)
      parts.zipWithIndex.foreach { case (b, i) =>
        IngestHeavyHitters.processBatch(b, i.toLong, sp, cp, "g", "token", 64)
      }
      // at-least-once replay of the middle batch: the batch-dir overwrite
      // rewrites it in place instead of double-counting
      IngestHeavyHitters.processBatch(parts(1), 1L, sp, cp, "g", "token", 64)
      val streamed = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 10L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      val batch = HeavyHitters.heavyHittersByGroup(toks, "g", "token", 10L, 64)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(streamed == batch && batch.nonEmpty)
      // capacity drift is rejected on both faces
      intercept[IllegalArgumentException] {
        IngestHeavyHitters.processBatch(parts(0), 9L, sp, cp, "g", "token", 32)
      }
      assert(IngestHeavyHitters.capacityOf(sp) == 64)
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
  }

  private def hhBatchDirNames(p: String): Set[String] =
    Option(new java.io.File(p).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSet

  test("consolidation: batches below the fence merge losslessly, probe identical; " +
    "replays below the fence are skipped; re-consolidation folds the previous dir") {
    import graft.streaming.IngestHeavyHitters
    val root = java.nio.file.Files.createTempDirectory("graft_hh_cons").toString
    val (sp, cp) = (s"$root/summaries", s"$root/corpus")
    try {
      val toks = skewedGrouped
      val parts = toks.randomSplit(Array(0.3, 0.3, 0.2, 0.2), seed = 11L)
      parts.zipWithIndex.foreach { case (b, i) =>
        IngestHeavyHitters.processBatch(b, i.toLong, sp, cp, "g", "token", 64)
      }
      val expected = HeavyHitters.heavyHittersByGroup(toks, "g", "token", 10L, 64)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      IngestHeavyHitters.consolidate(spark, sp, cp, 3L, "g", "token")
      assert(hhBatchDirNames(sp) == Set("batch=-3", "batch=3"))
      assert(hhBatchDirNames(cp) == Set("batch=-3", "batch=3"))
      def probed = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 10L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(probed == expected && expected.nonEmpty)
      // an at-least-once replay of a CONSOLIDATED batch is a no-op — its
      // rows already live inside the aggregate; rewriting batch=0 would
      // double-count them
      IngestHeavyHitters.processBatch(parts(0), 0L, sp, cp, "g", "token", 64)
      assert(hhBatchDirNames(sp) == Set("batch=-3", "batch=3"))
      assert(probed == expected)
      // a later fence folds the previous consolidation into the new one
      IngestHeavyHitters.consolidate(spark, sp, cp, 4L, "g", "token")
      assert(hhBatchDirNames(sp) == Set("batch=-4"))
      assert(hhBatchDirNames(cp) == Set("batch=-4"))
      assert(probed == expected)
      // the consolidated corpus is a true aggregate: ONE row per key, and
      // its weights recount to exactly the raw stream's multiplicities
      val cons = spark.read.parquet(s"$cp/batch=-4")
      assert(cons.columns.toSet == Set("g", "token", "__graft_tc"))
      assert(cons.groupBy("g", "token").count()
        .where(col("count") > 1).count() == 0)
      assert(cons.agg(sum("__graft_tc")).first().getLong(0) == toks.count())
      // idempotent re-run with the same fence: nothing changes
      IngestHeavyHitters.consolidate(spark, sp, cp, 4L, "g", "token")
      assert(hhBatchDirNames(sp) == Set("batch=-4") && probed == expected)
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("a crashed consolidation swap recovers at probe entry: marker present rolls " +
    "FORWARD, marker absent rolls BACK — probe results identical either way") {
    import graft.streaming.IngestHeavyHitters
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("graft_hh_crash").toString
    val (sp, cp) = (s"$root/summaries", s"$root/corpus")
    try {
      val toks = skewedGrouped
      val parts = toks.randomSplit(Array(0.5, 0.5), seed = 3L)
      parts.zipWithIndex.foreach { case (b, i) =>
        IngestHeavyHitters.processBatch(b, i.toLong, sp, cp, "g", "token", 64)
      }
      val expected = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 10L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      val fs = new Path(root).getFileSystem(
        spark.sessionState.newHadoopConf())
      // FORWARD crash on the summary layout: merged rows fully staged
      // (ready marker) + manifest written, but the swap never ran — the
      // dangerous window, where trusting olds AND the target double-counts
      val merged = spark.read.parquet(s"$sp/batch=0", s"$sp/batch=1")
        .groupBy(col("g"), col("token"))
        .agg(sum(col("lower_bound")).as("lower_bound"))
      merged.coalesce(1).write.parquet(s"$sp/_graft_consolidate_tmp")
      fs.create(new Path(s"$sp/_graft_consolidate_tmp/_graft_ready"), true).close()
      val mOut = fs.create(new Path(s"$sp/_graft_consolidating"), true)
      mOut.write("batch=-2\nbatch=0\nbatch=1".getBytes("UTF-8")); mOut.close()
      // BACKWARD crash on the corpus layout: temp half-written (no
      // marker) + manifest — recovery must drop both and keep originals
      fs.mkdirs(new Path(s"$cp/_graft_consolidate_tmp"))
      val mOut2 = fs.create(new Path(s"$cp/_graft_consolidating"), true)
      mOut2.write("batch=-2\nbatch=0\nbatch=1".getBytes("UTF-8")); mOut2.close()
      val got = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 10L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(got == expected && expected.nonEmpty)
      assert(hhBatchDirNames(sp) == Set("batch=-2"), "forward-recovered")
      assert(hhBatchDirNames(cp) == Set("batch=0", "batch=1"), "rolled back")
      assert(!fs.exists(new Path(s"$sp/_graft_consolidating")))
      assert(!fs.exists(new Path(s"$cp/_graft_consolidating")))
      assert(!fs.exists(new Path(s"$cp/_graft_consolidate_tmp")))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("streaming harness: ingest(consolidateEvery) consolidates on the cadence " +
    "and the probe equals the batch operator across it") {
    import graft.streaming.IngestHeavyHitters
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("graft_hh_ms").toString
    val (sp, cp) = (s"$root/summaries", s"$root/corpus")
    val ckpt = s"$root/ckpt"
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = IngestHeavyHitters.ingest(input.toDF().toDF("g", "token"),
      sp, cp, "g", "token", capacity = 64,
      checkpointDir = Some(ckpt), consolidateEvery = 2)
    try {
      val toks = skewedGrouped.as[(String, String)].collect().toSeq
      val parts = toks.grouped(math.max(1, toks.size / 4 + 1)).toSeq
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
      // cadence: batch id 2 triggered consolidate(fence = 2)
      assert(hhBatchDirNames(sp).contains("batch=-2"), hhBatchDirNames(sp))
      assert(!hhBatchDirNames(sp).contains("batch=0"))
      val streamed = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 10L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      val batch = HeavyHitters.heavyHittersByGroup(skewedGrouped, "g", "token", 10L, 64)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(streamed == batch && batch.nonEmpty)
    } finally {
      q.stop()
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  test("erasure: deleteIds hides a document's tokens from the probe immediately; " +
    "the next consolidation drops them physically; wrong handle fails loudly") {
    import graft.streaming.IngestHeavyHitters
    val root = java.nio.file.Files.createTempDirectory("graft_hh_erase").toString
    val (sp, cp) = (s"$root/summaries", s"$root/corpus")
    try {
      // doc 1 carries the dominant token; doc 99 carries a unique heavy
      // token that must vanish — totals: g1 = 28, so with denominator 4
      // a token needs freq ≥ 7
      val batch0 = Seq.fill(20)(("g1", "common", 1L)).toDF("g", "token", "doc_id")
      val batch1 = Seq.fill(8)(("g1", "secret", 99L)).toDF("g", "token", "doc_id")
      IngestHeavyHitters.processBatch(batch0, 0L, sp, cp, "g", "token", 16,
        idCol = Some("doc_id"))
      IngestHeavyHitters.processBatch(batch1, 1L, sp, cp, "g", "token", 16,
        idCol = Some("doc_id"))
      def probed = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 4L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(probed == Seq(("g1", "common", 20L), ("g1", "secret", 8L)))
      // a handle the corpus was not ingested with must not silently no-op
      intercept[IllegalArgumentException] {
        IngestHeavyHitters.deleteIds(Seq(99L).toDF("nope"), cp, "nope")
      }
      IngestHeavyHitters.deleteIds(Seq(99L).toDF("doc_id"), cp, "doc_id")
      // tombstone filtering is immediate — no maintenance pass needed
      assert(probed == Seq(("g1", "common", 20L)))
      // consolidation drops the rows physically while rewriting anyway
      IngestHeavyHitters.consolidate(spark, sp, cp, 2L, "g", "token")
      val cons = spark.read.parquet(s"$cp/batch=-2")
      assert(cons.where(col("token") === "secret").count() == 0)
      assert(probed == Seq(("g1", "common", 20L)))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
  }

  test("late erasure: consolidate(retainIds) keeps ids in the aggregate so " +
    "deleteIds AFTER the fence still reaches merged rows; the default mode " +
    "refuses loudly instead of silently leaving them") {
    import graft.streaming.IngestHeavyHitters
    val batch0 = Seq.fill(20)(("g1", "common", 1L)).toDF("g", "token", "doc_id")
    val batch1 = Seq.fill(8)(("g1", "secret", 99L)).toDF("g", "token", "doc_id")

    // default (agg) mode: post-consolidation erasure must REFUSE — the ids
    // are gone from the aggregate, a silent no-op would leave the tokens
    // in the merged counts forever
    val r1 = java.nio.file.Files.createTempDirectory("graft_hh_late1").toString
    val (sp1, cp1) = (s"$r1/summaries", s"$r1/corpus")
    try {
      IngestHeavyHitters.processBatch(batch0, 0L, sp1, cp1, "g", "token", 16,
        idCol = Some("doc_id"))
      IngestHeavyHitters.processBatch(batch1, 1L, sp1, cp1, "g", "token", 16,
        idCol = Some("doc_id"))
      IngestHeavyHitters.consolidate(spark, sp1, cp1, 2L, "g", "token")
      assert(IngestHeavyHitters.retainModeOf(spark, cp1).contains("agg"))
      val ex = intercept[IllegalStateException] {
        IngestHeavyHitters.deleteIds(Seq(99L).toDF("doc_id"), cp1, "doc_id")
      }
      assert(ex.getMessage.contains("retainIds"))
      // the mode is write-once: flipping to retainIds mid-layout is drift
      val ex2 = intercept[IllegalArgumentException] {
        IngestHeavyHitters.consolidate(spark, sp1, cp1, 3L, "g", "token",
          retainIds = true)
      }
      assert(ex2.getMessage.contains("retain"))
      // pre-consolidation erasure was and stays fine on such a layout —
      // only rows already merged are unreachable
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r1))

    // retained mode: the aggregate keys on (group, token, id) and erasure
    // works at any time
    val r2 = java.nio.file.Files.createTempDirectory("graft_hh_late2").toString
    val (sp2, cp2) = (s"$r2/summaries", s"$r2/corpus")
    try {
      IngestHeavyHitters.processBatch(batch0, 0L, sp2, cp2, "g", "token", 16,
        idCol = Some("doc_id"))
      IngestHeavyHitters.processBatch(batch1, 1L, sp2, cp2, "g", "token", 16,
        idCol = Some("doc_id"))
      IngestHeavyHitters.consolidate(spark, sp2, cp2, 2L, "g", "token",
        retainIds = true)
      assert(IngestHeavyHitters.retainModeOf(spark, cp2).contains("ids"))
      def probed = IngestHeavyHitters.probe(spark, sp2, cp2, "g", "token", 4L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(probed == Seq(("g1", "common", 20L), ("g1", "secret", 8L)))
      val cons2 = spark.read.parquet(s"$cp2/batch=-2")
      assert(cons2.columns.contains("doc_id")) // the late-erasure handle
      assert(cons2.count() ==
        cons2.select("g", "token", "doc_id").distinct().count())
      // LATE erasure — the request arrives after the rows were merged
      IngestHeavyHitters.deleteIds(Seq(99L).toDF("doc_id"), cp2, "doc_id")
      assert(probed == Seq(("g1", "common", 20L))) // immediate, via tombstones
      // and the next consolidation drops the merged rows physically
      IngestHeavyHitters.processBatch(
        Seq.fill(12)(("g1", "common", 1L)).toDF("g", "token", "doc_id"),
        2L, sp2, cp2, "g", "token", 16, idCol = Some("doc_id"))
      IngestHeavyHitters.consolidate(spark, sp2, cp2, 3L, "g", "token",
        retainIds = true)
      val cons3 = spark.read.parquet(s"$cp2/batch=-3")
      assert(cons3.where(col("token") === "secret").count() == 0)
      assert(probed == Seq(("g1", "common", 32L)))
      // retainIds without an ingest-recorded id column is a named error
      val r3 = java.nio.file.Files.createTempDirectory("graft_hh_late3").toString
      try {
        IngestHeavyHitters.processBatch(batch0.drop("doc_id"), 0L,
          s"$r3/summaries", s"$r3/corpus", "g", "token", 16)
        val ex3 = intercept[IllegalArgumentException] {
          IngestHeavyHitters.consolidate(spark, s"$r3/summaries",
            s"$r3/corpus", 1L, "g", "token", retainIds = true)
        }
        assert(ex3.getMessage.contains("without an id column"))
      } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r3))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r2))
  }

  test("pending erasure FORCES the otherwise-skipped fence-only rewrite " +
    "(the physical purge), exactly once — the next re-fence skips again") {
    import graft.streaming.IngestHeavyHitters
    val r = java.nio.file.Files.createTempDirectory("graft_hh_purge").toString
    val (sp, cp) = (s"$r/summaries", s"$r/corpus")
    try {
      IngestHeavyHitters.processBatch(
        Seq.fill(20)(("g1", "common", 1L)).toDF("g", "token", "doc_id"),
        0L, sp, cp, "g", "token", 16, idCol = Some("doc_id"))
      IngestHeavyHitters.processBatch(
        Seq.fill(8)(("g1", "secret", 99L)).toDF("g", "token", "doc_id"),
        1L, sp, cp, "g", "token", 16, idCol = Some("doc_id"))
      IngestHeavyHitters.consolidate(spark, sp, cp, 2L, "g", "token",
        retainIds = true)
      // late erasure on a layout that will never see another raw batch:
      // the bytes must still come off disk on the next consolidate call
      IngestHeavyHitters.deleteIds(Seq(99L).toDF("doc_id"), cp, "doc_id")
      assert(spark.read.parquet(s"$cp/batch=-2")
        .where(col("doc_id") === 99L).count() == 1L) // physically present
      IngestHeavyHitters.consolidate(spark, sp, cp, 3L, "g", "token",
        retainIds = true)
      // the purge rewrite happened despite nothing new below the fence
      assert(new java.io.File(cp, "batch=-3").isDirectory &&
        !new java.io.File(cp, "batch=-2").exists(),
        "pending erasure did not force the purge rewrite")
      assert(spark.read.parquet(s"$cp/batch=-3")
        .where(col("doc_id") === 99L).count() == 0L) // bytes gone
      // applied-bookkeeping: the NEXT re-fence is bookkeeping-only again
      val before = new java.io.File(cp, "batch=-3").lastModified()
      IngestHeavyHitters.consolidate(spark, sp, cp, 4L, "g", "token",
        retainIds = true)
      assert(new java.io.File(cp, "batch=-3").isDirectory &&
        !new java.io.File(cp, "batch=-4").exists(),
        "an already-applied erasure re-forced the rewrite")
      assert(new java.io.File(cp, "batch=-3").lastModified() == before)
      // the probe stays correct throughout
      assert(IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 4L)
        .as[(String, String, Long)].collect().toSeq ==
        Seq(("g1", "common", 20L)))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r))
  }

  test("bucketed retention (idBuckets): aggregate keys on the id's bucket, " +
    "size bounded by pairs x B, probe identical pre-erasure, erasure drops " +
    "the whole bucket ONE TIME (over-erasure pinned), mode incl. B write-once") {
    import graft.streaming.IngestHeavyHitters
    val r = java.nio.file.Files.createTempDirectory("graft_hh_bucket").toString
    val (sp, cp) = (s"$r/summaries", s"$r/corpus")
    try {
      // pick ids with the layout's OWN bucket formula: a victim, a
      // co-bucketed survivor (over-erasure hits it), and an other-bucket
      // survivor (untouched)
      val bucketsById = spark.range(1, 21)
        .select(col("id"), IngestHeavyHitters.bucketOf(col("id"), 2).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val victim = 1L
      val cobucket = (2L to 20L).find(bucketsById(_) == bucketsById(victim)).get
      val other = (2L to 20L).find(bucketsById(_) != bucketsById(victim)).get
      val batch0 =
        (Seq.fill(8)(("g1", "secret", victim)) ++
          Seq.fill(10)(("g1", "shared", cobucket)) ++
          Seq.fill(12)(("g1", "keep", other))).toDF("g", "token", "doc_id")
      IngestHeavyHitters.processBatch(batch0, 0L, sp, cp, "g", "token", 16,
        idCol = Some("doc_id"))
      IngestHeavyHitters.consolidate(spark, sp, cp, 1L, "g", "token",
        retainIds = true, idBuckets = 2)
      assert(IngestHeavyHitters.retainModeOf(spark, cp).contains("ids:2"))
      def probed = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 15L)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      // probe bit-identical pre-erasure (per-bucket sums = collapsed sums)
      assert(probed == Seq(("g1", "keep", 12L), ("g1", "shared", 10L),
        ("g1", "secret", 8L)))
      // the aggregate holds buckets, not ids, and is bounded by pairs x B
      val cons = spark.read.parquet(s"$cp/batch=-1")
      assert(cons.columns.toSet ==
        Set("g", "token", IngestHeavyHitters.BucketCol,
          IngestHeavyHitters.WeightCol))
      assert(cons.count() <=
        cons.select("g", "token").distinct().count() * 2)
      // the mode — including B — is write-once: drift in B, a plain-ids
      // call, and an agg call are all rejected
      for ((ri, b) <- Seq((true, 4), (true, 0), (false, 0))) {
        val ex = intercept[IllegalArgumentException] {
          IngestHeavyHitters.consolidate(spark, sp, cp, 2L, "g", "token",
            retainIds = ri, idBuckets = b)
        }
        assert(ex.getMessage.contains("retain"))
      }
      // LATE erasure is accepted on a bucketed layout (deleteIds refuses
      // only on id-LESS aggregates) and drops the victim's whole bucket:
      // the co-bucketed survivor's merged rows go with it (the documented
      // over-erasure), the other bucket is untouched
      IngestHeavyHitters.deleteIds(Seq(victim).toDF("doc_id"), cp, "doc_id")
      assert(probed == Seq(("g1", "keep", 12L)))
      // post-fence raw rows are id-filtered EXACTLY: the survivor's new
      // rows count, the erased id's do not
      IngestHeavyHitters.processBatch(
        (Seq.fill(5)(("g1", "shared", cobucket)) ++
          Seq.fill(3)(("g1", "secret", victim))).toDF("g", "token", "doc_id"),
        1L, sp, cp, "g", "token", 16, idCol = Some("doc_id"))
      assert(probed == Seq(("g1", "keep", 12L), ("g1", "shared", 5L)))
      // the next consolidation drops the dead bucket physically, records
      // the tombstone APPLIED, and the survivor's re-merged rows then
      // SURVIVE in the same bucket — over-erasure is one-time, not a
      // permanent black hole for the bucket
      IngestHeavyHitters.consolidate(spark, sp, cp, 2L, "g", "token",
        retainIds = true, idBuckets = 2)
      val cons2 = spark.read.parquet(s"$cp/batch=-2")
      assert(cons2.where(col("token") === "secret").count() == 0)
      assert(cons2.where(col("token") === "shared").count() == 1)
      assert(probed == Seq(("g1", "keep", 12L), ("g1", "shared", 5L)))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r))
  }

  test("a fence re-advance with nothing new below it is bookkeeping only: " +
    "the meta advances, the consolidated aggregate is NOT rewritten") {
    import graft.streaming.IngestHeavyHitters
    val r = java.nio.file.Files.createTempDirectory("graft_hh_refence").toString
    val (sp, cp) = (s"$r/summaries", s"$r/corpus")
    try {
      IngestHeavyHitters.processBatch(
        Seq.fill(20)(("g1", "common")).toDF("g", "token"),
        0L, sp, cp, "g", "token", 16)
      IngestHeavyHitters.processBatch(
        Seq.fill(8)(("g1", "rare")).toDF("g", "token"),
        1L, sp, cp, "g", "token", 16)
      IngestHeavyHitters.consolidate(spark, sp, cp, 2L, "g", "token")
      def snapshot(root: String): Map[String, Long] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(root)).filter(_.getPath.contains("batch="))
          .map(f => f.getPath -> f.lastModified()).toMap
      }
      val (sum0, cor0) = (snapshot(sp), snapshot(cp))
      assert(cor0.keys.exists(_.contains("batch=-2")))
      // a defensive re-fence (maintenance tick, empty-batch stretch): the
      // fence must advance, but rewriting one aggregate into a new name
      // for zero information gain must NOT happen
      IngestHeavyHitters.consolidate(spark, sp, cp, 5L, "g", "token")
      assert(IngestHeavyHitters.fenceOf(spark, sp) == 5L)
      assert(snapshot(sp) == sum0 && snapshot(cp) == cor0,
        "no-op re-fence rewrote the layouts")
      // denom 10: both tokens stay above threshold even after the final
      // batch lifts the group total to 33
      def probed = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 10L)
        .orderBy(col("freq").desc).as[(String, String, Long)].collect().toSeq
      assert(probed == Seq(("g1", "common", 20L), ("g1", "rare", 8L)))
      // a later REAL consolidation still merges the old-named aggregate
      // with the new raw batches
      IngestHeavyHitters.processBatch(
        Seq.fill(5)(("g1", "common")).toDF("g", "token"),
        7L, sp, cp, "g", "token", 16)
      IngestHeavyHitters.consolidate(spark, sp, cp, 8L, "g", "token")
      assert(new java.io.File(cp, "batch=-8").isDirectory &&
        !new java.io.File(cp, "batch=-2").exists())
      assert(probed == Seq(("g1", "common", 25L), ("g1", "rare", 8L)))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r))
  }

  test("a no-op consolidation does not lock the retain mode, and the " +
    "streaming cadence passes retainIds through so late erasure reaches " +
    "rows the stream's own consolidation merged") {
    import graft.streaming.IngestHeavyHitters
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // (a) nothing below the fence: merges nothing, must NOT stamp — a
    // layout's first REAL consolidation still gets to choose retainIds
    val r1 = java.nio.file.Files.createTempDirectory("graft_hh_noop").toString
    val (sp1, cp1) = (s"$r1/summaries", s"$r1/corpus")
    try {
      val b0 = Seq.fill(6)(("g1", "tok", 1L)).toDF("g", "token", "doc_id")
      IngestHeavyHitters.processBatch(b0, 0L, sp1, cp1, "g", "token", 16,
        idCol = Some("doc_id"))
      IngestHeavyHitters.consolidate(spark, sp1, cp1, 0L, "g", "token")
      assert(IngestHeavyHitters.retainModeOf(spark, cp1).isEmpty,
        "a no-op consolidation stamped the mode")
      IngestHeavyHitters.consolidate(spark, sp1, cp1, 1L, "g", "token",
        retainIds = true)
      assert(IngestHeavyHitters.retainModeOf(spark, cp1).contains("ids"))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r1))

    // (b) ingest(retainIds = true): the cadence consolidation stamps 'ids'
    // (without the pass-through it could only ever stamp 'agg', forfeiting
    // late erasure — or kill a stream whose layout was already 'ids')
    val r2 = java.nio.file.Files.createTempDirectory("graft_hh_ri").toString
    val (sp2, cp2) = (s"$r2/summaries", s"$r2/corpus")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val q = IngestHeavyHitters.ingest(input.toDF().toDF("g", "token", "doc_id"),
      sp2, cp2, "g", "token", capacity = 16, idCol = Some("doc_id"),
      checkpointDir = Some(s"$r2/ckpt"), consolidateEvery = 2,
      retainIds = true)
    try {
      // secret must CLEAR the support threshold (15·4 ≥ total 55), so the
      // final assertion can only pass if the erasure actually reached the
      // consolidated aggregate — with a below-threshold count the probe
      // would omit it whether or not deleteIds worked (vacuous)
      val parts: Seq[Seq[(String, String, Long)]] = Seq(
        Seq.fill(20)(("g1", "common", 1L)) ++ Seq.fill(15)(("g1", "secret", 99L)),
        Seq.fill(10)(("g1", "common", 2L)),
        Seq.fill(5)(("g1", "common", 3L)),
        Seq.fill(5)(("g1", "common", 4L)))
      parts.foreach { p => input.addData(p); q.processAllAvailable() }
      assert(IngestHeavyHitters.retainModeOf(spark, cp2).contains("ids"))
      assert(IngestHeavyHitters.fenceOf(spark, sp2) == 2L)
      def probed = IngestHeavyHitters.probe(spark, sp2, cp2, "g", "token", 4L)
        .orderBy(col("g"), col("token"))
        .as[(String, String, Long)].collect().toSeq
      // pre-erasure: secret is present and above threshold
      assert(probed == Seq(("g1", "common", 40L), ("g1", "secret", 15L)), probed)
      // the LATE request: doc 99 was merged below the fence by the
      // stream's own consolidation — deleteIds still reaches it
      IngestHeavyHitters.deleteIds(Seq(99L).toDF("doc_id"), cp2, "doc_id")
      assert(probed == Seq(("g1", "common", 40L)), probed)
    } finally {
      q.stop()
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(r2))
    }
  }

  test("per-group candidate broadcast gate is BYTE-aware and the shuffled path is recompute-safe") {
    // a row count far under the limit must still refuse to collect when the
    // summed (group + token) chars exceed the byte gate — long boilerplate
    // tokens would otherwise land hundreds of MB on the driver heap while
    // the row gate still said "broadcast"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val viaBytesGate = HeavyHitters.heavyHittersByGroup(skewedGrouped, "g", "token",
        10L, 64, broadcastCandidateBytes = 0L)
      val plan = viaBytesGate.queryExecution.executedPlan.toString
      val semiBroadcast = plan.linesIterator
        .exists(l => l.contains("LeftSemi") && l.contains("Broadcast"))
      assert(!semiBroadcast,
        s"past the byte gate the candidate semi join must not driver-broadcast:\n$plan")
      // recompute contract: the gated path's build side is MATERIALIZED
      // (localCheckpoint — lineage cut), never a driver-collected
      // LocalTableScan, and a SECOND action after the operator's internal
      // unpersist still returns the same rows without re-running pass 1
      assert(plan.contains("ExistingRDD"),
        s"gated build side should be checkpoint-materialized:\n$plan")
      val expected = HeavyHitters.heavyHittersByGroup(skewedGrouped, "g", "token", 10L, 64)
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      def results = viaBytesGate
        .orderBy(col("g"), col("freq").desc, col("token"))
        .as[(String, String, Long)].collect().toSeq
      assert(results == expected && expected.nonEmpty)
      assert(results == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
