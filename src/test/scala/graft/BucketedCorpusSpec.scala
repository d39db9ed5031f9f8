package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}
import graft.sources.BucketedCorpus

/** The hash-bucketed corpus sink and the corpus-scan-free ingest verify
  * path it enables: probe reads must carry a partition filter on the
  * bucket column (scan bytes follow the CANDIDATE count, not the
  * accumulated corpus), and the index-before-corpus write order must make
  * at-least-once replay converge to exactly one corpus copy across the
  * orphan-postings crash window. */
class BucketedCorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(p: String): Unit =
    graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))

  private val docA =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docB =
    "completely different content about spark query engines and columnar formats"
  private val docC =
    "a third body of text mentioning distributed joins and shuffle exchanges"

  test("schema drift on append is rejected naming the column diff; " +
    "pre-guard layouts record their schema on the next append") {
    val path = tmp("graft_bschema") + "/corpus"
    try {
      val rows = (0L until 8L).map(i => (i, s"text_$i")).toDF("id", "t")
      BucketedCorpus.append(rows, path, "id", buckets = 4)
      // same schema, different column ORDER: fine (parquet resolves by name)
      BucketedCorpus.append(rows.select("t", "id"), path, "id", buckets = 4)
      // extra column: rejected, the diff named
      val extra = intercept[IllegalArgumentException] {
        BucketedCorpus.append(rows.withColumn("lang", lit("en")),
          path, "id", buckets = 4)
      }
      assert(extra.getMessage.contains("lang"), extra.getMessage)
      // type drift on an existing column: rejected too
      val typed = intercept[IllegalArgumentException] {
        BucketedCorpus.append(rows.withColumn("t", lit(7)), path, "id", 4)
      }
      assert(typed.getMessage.contains("t:"), typed.getMessage)
      // a layout created before the guard existed has no schema meta —
      // the next append records it instead of rejecting
      graft.sources.LayoutMeta.delete(path, BucketedCorpus.SchemaFile)
      BucketedCorpus.append(rows, path, "id", buckets = 4)
      assert(graft.sources.LayoutMeta.exists(path, BucketedCorpus.SchemaFile))
      assert(BucketedCorpus.readAll(spark, path).count() == 24)
    } finally rm(path)
  }

  test("bucketed corpus: append/readAll round-trips, drift rejected, readForIds prunes") {
    val path = tmp("graft_bcorpus") + "/corpus"
    try {
      val rows = (0L until 64L).map(i => (i, s"text_$i")).toDF("id", "t")
      BucketedCorpus.append(rows, path, "id", buckets = 8)
      assert(BucketedCorpus.ready(path) && BucketedCorpus.bucketsOf(path) == 8)
      // original schema back, bucket column dropped, all rows present
      val all = BucketedCorpus.readAll(spark, path)
      assert(all.columns.toSeq == Seq("id", "t"))
      assert(all.count() == 64)
      // appends with a drifting bucket count are rejected
      intercept[IllegalArgumentException] {
        BucketedCorpus.append(rows, path, "id", buckets = 16)
      }
      // readForIds: superset of the asked ids, plan carries a partition
      // filter on the bucket column — the scan is PRUNED, not full
      val asked = Seq(3L, 17L).toDF("id")
      val got = BucketedCorpus.readForIds(spark, path, asked)
      val gotIds = got.select("id").as[Long].collect().toSet
      assert(Set(3L, 17L).subsetOf(gotIds) && gotIds.size < 64,
        s"expected a pruned superset of the asked ids, got ${gotIds.size} rows")
      val plan = got.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains(BucketedCorpus.BucketCol),
        s"corpus read should be bucket-pruned:\n$plan")
      // exactness stays with the caller's join; the pruned read agrees
      // with the full read on the asked ids
      val viaAll = BucketedCorpus.readAll(spark, path)
        .where(col("id").isin(3L, 17L)).as[(Long, String)].collect().toSet
      val viaPruned = got.where(col("id").isin(3L, 17L))
        .as[(Long, String)].collect().toSet
      assert(viaPruned == viaAll && viaAll.size == 2)
    } finally rm(java.nio.file.Paths.get(path).getParent.toString)
  }

  test("IngestDedup probe verify reads only candidate corpus buckets (plan-pinned)") {
    import graft.streaming.IngestDedup
    val root = tmp("graft_bcorpus_probe")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      IngestDedup.processBatch(
        Seq((0L, docA), (1L, docB), (2L, docC)).toDF("doc_id", "text"),
        idx, cor, "text", "doc_id", numHashes = 32, bands = 16, prefixBits = 4)
      val probe = Dedup.minhashProbeIndexMd5Resolved(idx,
        ids => BucketedCorpus.readForIds(spark, cor, ids),
        Seq((10L, docA.replace("today", "tonight"))).toDF("doc_id", "text"),
        "text", "doc_id", numHashes = 32, bands = 16)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains(BucketedCorpus.BucketCol),
        s"the exact-verify corpus read should carry a bucket partition filter:\n$plan")
      // and the pruned path returns the right duplicates
      val hits = probe.select("batch_id", "corpus_id")
        .as[(Long, Long)].collect().toSet
      assert(hits == Set((10L, 0L)), s"got $hits")
    } finally rm(root)
  }

  test("meta-first first-batch crash window: ready-but-empty corpus skips the probe, replay appends once") {
    import graft.streaming.IngestDedup
    val root = tmp("graft_bcorpus_meta")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      // simulate the crash: batch 1's index postings AND the corpus
      // metadata committed, the corpus DATA job did not (meta is written
      // before the data commit — the reverse order would leave committed
      // data invisible to ready() and a replay would append it twice)
      val batch1 = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
      Dedup.writeMinhashIndexMd5(batch1, "text", "doc_id", idx,
        numHashes = 32, bands = 16, prefixBits = 4)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cor))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(cor, "_graft_corpus_buckets"), "64".getBytes("UTF-8"))
      assert(BucketedCorpus.ready(cor) && !BucketedCorpus.hasData(spark, cor))
      // replay: the probe is skipped (nothing live to verify against) and
      // the batch lands exactly once
      IngestDedup.processBatch(batch1, idx, cor, "text", "doc_id",
        numHashes = 32, bands = 16, prefixBits = 4)
      def corpusIds = BucketedCorpus.readAll(spark, cor)
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(corpusIds == Seq(0L, 1L))
      IngestDedup.processBatch(batch1, idx, cor, "text", "doc_id",
        numHashes = 32, bands = 16, prefixBits = 4)
      assert(corpusIds == Seq(0L, 1L))
    } finally rm(root)
  }

  test("IngestDedup orphan-postings crash window: replay converges to one corpus copy") {
    import graft.streaming.IngestDedup
    val root = tmp("graft_bcorpus_crash")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      val batch1 = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
      IngestDedup.processBatch(batch1, idx, cor, "text", "doc_id",
        numHashes = 32, bands = 16, prefixBits = 4)
      // simulate the crash: batch 2's postings reach the index, its corpus
      // rows do NOT (the index-first window)
      val batch2 = Seq((5L, docC)).toDF("doc_id", "text")
      Dedup.writeMinhashIndexMd5(batch2, "text", "doc_id", idx,
        numHashes = 32, bands = 16, prefixBits = 4, mode = "append")
      def corpusIds = BucketedCorpus.readAll(spark, cor)
        .select("doc_id").as[Long].collect().toSeq.sorted
      assert(corpusIds == Seq(0L, 1L))
      // at-least-once replay of batch 2: the orphan postings candidate
      // cannot verify (no corpus row), so the content is NOT lost — it
      // lands exactly once
      IngestDedup.processBatch(batch2, idx, cor, "text", "doc_id",
        numHashes = 32, bands = 16, prefixBits = 4)
      assert(corpusIds == Seq(0L, 1L, 5L))
      // a second replay now sees the corpus row and drops — still one copy
      IngestDedup.processBatch(batch2, idx, cor, "text", "doc_id",
        numHashes = 32, bands = 16, prefixBits = 4)
      assert(corpusIds == Seq(0L, 1L, 5L))
    } finally rm(root)
  }

  test("IngestPhash orphan postings cannot drop replayed content (existence check)") {
    import graft.streaming.IngestPhash
    val root = tmp("graft_bcorpus_phash")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      def media(ids: Seq[Long]) = Multimodal.syntheticStillVariants(
        ids.map(id => (id, id, 0)).toDF("media_id", "base_id", "bump"),
        "media_id", "base_id", "bump")
      IngestPhash.processBatch(media(Seq(0L, 1L)), idx, cor, maxHamming = 3)
      // crash window: batch 2's postings reach the index, corpus doesn't
      val b2 = media(Seq(7L))
      Multimodal.writePhashIndex(Multimodal.perceptualHashes(b2), idx,
        maxHamming = 3, mode = "append")
      def corpusIds = BucketedCorpus.readAll(spark, cor)
        .select("media_id").as[Long].collect().toSeq.sorted
      assert(corpusIds == Seq(0L, 1L))
      // replay: the orphan posting matches at Hamming 0 but has no corpus
      // row — the existence check keeps the content, exactly once
      IngestPhash.processBatch(b2, idx, cor, maxHamming = 3)
      assert(corpusIds == Seq(0L, 1L, 7L))
      IngestPhash.processBatch(b2, idx, cor, maxHamming = 3)
      assert(corpusIds == Seq(0L, 1L, 7L))
    } finally rm(root)
  }

  test("IngestVideo: in-batch collapse, cross-batch frame-index probe, replay self-heals") {
    import graft.streaming.IngestVideo
    val root = tmp("graft_bcorpus_video")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      def media(rows: Seq[(Long, Long, Int)]) = Multimodal.syntheticVideoVariants(
        rows.toDF("media_id", "base_id", "bump"), "media_id", "base_id", "bump")
      // batch 1: base videos 0, 1 plus an in-batch one-pixel variant of 0
      // (frame 0 edited, later frames bit-identical) — collapses onto 0
      // before anything is indexed
      IngestVideo.processBatch(
        media(Seq((0L, 0L, 0), (1L, 1L, 0), (5000L, 0L, 1))), idx, cor)
      def corpusVids = BucketedCorpus.readAll(spark, cor)
        .select("media_id").distinct().as[Long].collect().toSet
      assert(corpusVids == Set(0L, 1L))
      // batch 2: a variant of INDEXED 1 (probe path drops it), a genuinely
      // new video 2 (its frames sit >maxHamming from every indexed frame —
      // measured; video 3 is a REAL Hamming-3 neighbour of 1 and would
      // correctly drop)
      val b2 = media(Seq((6001L, 1L, 1), (2L, 2L, 0)))
      IngestVideo.processBatch(b2, idx, cor)
      assert(corpusVids == Set(0L, 1L, 2L))
      // at-least-once replay: every frame lands at Hamming 0 → dropped
      IngestVideo.processBatch(b2, idx, cor)
      assert(corpusVids == Set(0L, 1L, 2L))
      // the corpus carries one row per surviving frame (2-4 per video)
      val frames = BucketedCorpus.readAll(spark, cor).count()
      assert(frames == Seq(0L, 1L, 2L).map(id => id % 3 + 2).sum)
    } finally rm(root)
  }

  test("IngestVideo orphan frame postings cannot drop replayed content") {
    import graft.streaming.IngestVideo
    val root = tmp("graft_bcorpus_video_crash")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      def media(rows: Seq[(Long, Long, Int)]) = Multimodal.syntheticVideoVariants(
        rows.toDF("media_id", "base_id", "bump"), "media_id", "base_id", "bump")
      IngestVideo.processBatch(media(Seq((0L, 0L, 0), (1L, 1L, 0))), idx, cor)
      // crash window: video 7's frame postings reach the index, its corpus
      // rows do not
      val b2 = media(Seq((7L, 7L, 0)))
      Multimodal.writePhashIndex(
        Multimodal.videoFrameHashes(b2)
          .select((col("media_id") * 8 + col("frame")).as("media_id"), col("phash")),
        idx, maxHamming = 3, mode = "append")
      def corpusVids = BucketedCorpus.readAll(spark, cor)
        .select("media_id").distinct().as[Long].collect().toSet
      assert(corpusVids == Set(0L, 1L))
      // replay: orphan postings match at Hamming 0 but name a corpus video
      // that does not exist — the existence check keeps the content
      IngestVideo.processBatch(b2, idx, cor)
      assert(corpusVids == Set(0L, 1L, 7L))
      IngestVideo.processBatch(b2, idx, cor)
      assert(corpusVids == Set(0L, 1L, 7L))
    } finally rm(root)
  }

  test("IngestVideo streaming face: micro-batches dedup against earlier ones, both sinks compact") {
    import graft.streaming.IngestVideo
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_video_stream")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    def media(rows: Seq[(Long, Long, Int)]): Seq[(Long, Array[Byte])] =
      Multimodal.syntheticVideoVariants(
        rows.toDF("media_id", "base_id", "bump"), "media_id", "base_id", "bump")
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("content"))).toSeq
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    // compaction fires after batch 2 (batchId 1); one corpus bucket so
    // both batches provably share a dir
    val q = IngestVideo.ingestWithDedup(
      input.toDF().toDF("media_id", "content"), idx, cor,
      maxHamming = 3, prefixBits = 1, corpusBuckets = 1,
      compactEveryBatches = 2, compactMaxFiles = 1)
    try {
      def corpusVids = BucketedCorpus.readAll(spark, cor)
        .select("media_id").distinct().as[Long].collect().toSet
      input.addData(media(Seq((0L, 0L, 0), (1L, 1L, 0))))
      q.processAllAvailable()
      assert(corpusVids == Set(0L, 1L))
      // batch 2: a one-pixel variant of indexed 1 drops via the frame
      // probe; new video 2 survives (measured >maxHamming from 0 and 1)
      input.addData(media(Seq((6001L, 1L, 1), (2L, 2L, 0))))
      q.processAllAvailable()
      assert(corpusVids == Set(0L, 1L, 2L))
      // the wired compactor ran over BOTH sinks
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      def leaf(dir: String, pfx: String) = walk(new java.io.File(dir)).filter(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
          f.getParentFile.getName.startsWith(pfx))
      assert(leaf(idx, "bp=").exists(_.getName.startsWith("graft-compact-")))
      assert(leaf(cor, BucketedCorpus.BucketCol + "=")
        .groupBy(_.getParentFile.getName).values.forall(_.size == 1))
      // probes across the rewrite: an exact replay of indexed content drops
      input.addData(media(Seq((2L, 2L, 0))).map { case (_, c) => (9000L, c) })
      q.processAllAvailable()
      assert(corpusVids == Set(0L, 1L, 2L))
    } finally q.stop()
    rm(root)
  }

  test("ingest loops compact the corpus sink on the batch schedule") {
    import graft.streaming.IngestDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("graft_bcorpus_compact")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // one corpus bucket → both batches write the same dir, provably
    // leaving 2 files for the compactor; fires after batch 2
    val q = IngestDedup.ingestWithDedup(
      input.toDF().toDF("doc_id", "text"), idx, cor, "text", "doc_id",
      numHashes = 32, bands = 16, prefixBits = 1, corpusBuckets = 1,
      compactEveryBatches = 2, compactMaxFiles = 1)
    try {
      input.addData((0L, docA), (1L, docB)); q.processAllAvailable()
      input.addData((2L, docC)); q.processAllAvailable()
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val corpusFiles = walk(new java.io.File(cor)).filter(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
          f.getParentFile.getName.startsWith(BucketedCorpus.BucketCol + "="))
      assert(corpusFiles.nonEmpty &&
        corpusFiles.groupBy(_.getParentFile.getName).values.forall(_.size == 1),
        s"every corpus bucket dir should hold one data file after compaction, " +
          s"got ${corpusFiles.map(_.getPath)}")
      assert(corpusFiles.exists(_.getName.startsWith("graft-compact-")),
        "expected compactor-written files in the corpus sink")
      // reads across the rewrite are byte-identical
      assert(BucketedCorpus.readAll(spark, cor)
        .select("doc_id").as[Long].collect().toSet == Set(0L, 1L, 2L))
      // and the probe still dedups against compacted corpus + index
      input.addData((9L, docA)); q.processAllAvailable()
      assert(BucketedCorpus.readAll(spark, cor)
        .select("doc_id").as[Long].collect().toSet == Set(0L, 1L, 2L))
    } finally q.stop()
    rm(root)
  }
}
