package graft

import org.apache.spark.sql.functions._

import graft.sources.{BucketedCorpus, Retention}

/** Delete-by-predicate over the bucketed corpus sinks: logical deletes
  * (tombstones) are visible to every read immediately, the vacuum's
  * physical rewrite touches only the dead ids' buckets and leaves results
  * identical, replayed deletes and repeated vacuums converge, and the
  * ingest probes drop nothing on orphaned index postings. */
class RetentionSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(p: String): Unit =
    graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))

  private def freshCorpus(path: String): Unit = {
    val rows = (0L until 100L).map(i => (i, s"text_$i", if (i % 3 == 0) "en" else "de"))
      .toDF("id", "t", "lang")
    BucketedCorpus.append(rows, path, "id", buckets = 8)
  }

  test("deleteWhere: reads exclude tombstoned rows immediately, with SQL NULL semantics") {
    val root = tmp("graft_retention")
    val path = s"$root/corpus"
    try {
      val rows = Seq((1L, "a", "en"), (2L, "b", "de"), (3L, "c", null: String))
        .toDF("id", "t", "lang")
      BucketedCorpus.append(rows, path, "id", buckets = 4)
      val n = Retention.deleteWhere(spark, path, col("lang") === "en", "id")
      assert(n == 1L)
      // NULL lang: predicate NULL, not TRUE — row 3 survives
      assert(BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet == Set(2L, 3L))
      // readForIds is filtered too — a dead id resolves to nothing
      assert(BucketedCorpus.readForIds(spark, path, Seq(1L, 2L).toDF("id"))
        .select("id").as[Long].collect().toSet == Set(2L))
      // deleting already-dead rows is a no-op (they are no longer live)
      assert(Retention.deleteWhere(spark, path, col("lang") === "en", "id") == 0L)
    } finally rm(root)
  }

  test("vacuum rewrites ONLY the dead ids' buckets, results identical, converges") {
    val root = tmp("graft_retention_vac")
    val path = s"$root/corpus"
    try {
      freshCorpus(path)
      val survivorsBefore = BucketedCorpus.readAll(spark, path) // pre-delete
        .as[(Long, String, String)].collect().toSet
      // a SMALL dead set (3 of 100 ids) so some of the 8 buckets provably
      // hold no dead row — with a broad predicate every bucket would be
      // touched and the untouched-buckets assertion below would iterate
      // zero times
      val deadIds = Set(0L, 1L, 2L)
      Retention.deleteWhere(spark, path, col("id") < 3, "id")
      val logical = BucketedCorpus.readAll(spark, path)
        .as[(Long, String, String)].collect().toSet
      assert(logical == survivorsBefore.filterNot(r => deadIds(r._1)) &&
        logical.nonEmpty)
      // snapshot per-bucket file names before the vacuum
      def filesByBucket: Map[String, Set[String]] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(path))
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
            && f.getParentFile.getName.startsWith(BucketedCorpus.BucketCol + "="))
          .groupBy(_.getParentFile.getName).map { case (k, v) =>
            k -> v.map(_.getName).toSet }
      }
      val before = filesByBucket
      val deadBuckets = deadIds
        .map(i => spark.range(i, i + 1).select(
          pmod(xxhash64(col("id")), lit(8L))).first().getLong(0))
        .map((b: Long) => s"${BucketedCorpus.BucketCol}=$b")
      val untouched = before.keySet -- deadBuckets
      assert(untouched.nonEmpty,
        "fixture degenerated: every bucket holds a dead id, nothing to pin")
      val rewritten = Retention.vacuum(spark, path, "id")
      assert(!Retention.hasTombstones(path))
      val after = filesByBucket
      // untouched buckets keep their files byte-for-byte (same names)
      untouched.foreach { b =>
        assert(after(b) == before(b), s"bucket $b rewritten without dead rows")
      }
      assert(rewritten.map(p => p.split('/').last).toSet == deadBuckets)
      // physical: the raw files (tombstones cleared) no longer hold the rows
      assert(spark.read.parquet(path).where(col("id") < 3).count() == 0)
      // reads identical before and after the physical delete
      assert(BucketedCorpus.readAll(spark, path)
        .as[(Long, String, String)].collect().toSet == logical)
      // a second vacuum is a no-op
      assert(Retention.vacuum(spark, path, "id").isEmpty)
    } finally rm(root)
  }

  test("vacuumPostings physically drops erased ids' postings; probe results unchanged") {
    import graft.operators.Dedup
    val root = tmp("graft_retention_idx")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
      val docB = "completely different content about spark query engines and columnar formats"
      val corpus = Seq((0L, docA), (1L, docB)).toDF("doc_id", "text")
      BucketedCorpus.append(corpus, cor, "doc_id", buckets = 4)
      Dedup.writeMinhashIndexMd5(corpus, "text", "doc_id", idx,
        numHashes = 32, bands = 16, prefixBits = 4)
      // erase doc 0 end to end: corpus tombstone + vacuum, then the
      // posting-side weight reclaim
      Retention.deleteIds(Seq(0L).toDF("doc_id"), cor, "doc_id")
      Retention.vacuum(spark, cor, "doc_id")
      def probe(batch: Seq[(Long, String)]) =
        Dedup.minhashProbeIndexMd5Resolved(idx,
          ids => BucketedCorpus.readForIds(spark, cor, ids),
          batch.toDF("doc_id", "text"), "text", "doc_id",
          numHashes = 32, bands = 16)
          .select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      val probeBatch = Seq((10L, docA.replace("today", "tonight")), (11L, docB))
      val beforeVacuum = probe(probeBatch)
      assert(beforeVacuum == Set((11L, 1L))) // doc 0 already invisible
      // snapshot per-dir file names: the rewrite must touch ONLY the
      // partition dirs that actually hold dead postings (discovered by a
      // read-only pass), never the whole index
      def filesByDir: Map[String, Set[String]] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(idx))
          .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")
            && f.getParentFile.getName.startsWith("pfx="))
          .groupBy(_.getParentFile.getName)
          .map { case (k, v) => k -> v.map(_.getName).toSet }
      }
      val before = filesByDir
      val deadDirs = spark.read.parquet(idx).where(col("id") === 0L)
        .select(col("pfx")).distinct().collect()
        .map(r => s"pfx=${r.get(0)}").toSet
      val rewritten = Retention.vacuumPostings(spark, idx,
        Seq(0L).toDF("doc_id"), "id")
      assert(rewritten.map(_.split('/').last).toSet == deadDirs && deadDirs.nonEmpty)
      val after = filesByDir
      (before.keySet -- deadDirs).foreach { d =>
        assert(after(d) == before(d), s"index dir $d rewritten without dead postings")
      }
      // postings physically gone, probe identical
      assert(spark.read.parquet(idx).where(col("id") === 0L).count() == 0)
      assert(spark.read.parquet(idx).where(col("id") === 1L).count() > 0)
      assert(probe(probeBatch) == beforeVacuum)
    } finally rm(root)
  }

  test("reinstate lifts a logical delete: pre-vacuum rows reappear, post-vacuum " +
    "ids become re-ingestable, other tombstones survive") {
    val root = tmp("graft_retention_rei")
    val path = s"$root/corpus"
    try {
      freshCorpus(path)
      Retention.deleteIds(Seq(1L, 2L, 3L).toDF("id"), path, "id")
      def liveIds = BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet
      assert(!liveIds.contains(1L) && !liveIds.contains(2L))
      // pre-vacuum: the rows still exist physically — reinstating 1 makes
      // it LIVE again immediately; 2 and 3 stay deleted
      assert(Retention.reinstate(Seq(1L).toDF("id"), path, "id") == 1L)
      assert(liveIds.contains(1L) && !liveIds.contains(2L) && !liveIds.contains(3L))
      // reinstating an id that was never tombstoned is a zero no-op
      assert(Retention.reinstate(Seq(42L).toDF("id"), path, "id") == 0L)
      // post-vacuum: 2's rows are physically gone; reinstating lifts the
      // id-keyed block so a fresh append becomes visible
      Retention.vacuum(spark, path, "id")
      assert(!liveIds.contains(2L))
      assert(Retention.reinstate(Seq(2L).toDF("id"), path, "id") == 0L) // cleared by vacuum
      BucketedCorpus.append(Seq((2L, "new_text_2", "de")).toDF("id", "t", "lang"),
        path, "id", buckets = 8)
      assert(liveIds.contains(2L))
      // misconfiguration guard matches deleteIds
      intercept[IllegalArgumentException] {
        Retention.reinstate(Seq(1L).toDF("id"), s"$root/nope", "id")
      }
    } finally rm(root)
  }

  test("bulk reinstate past the broadcast gate takes the shuffled anti-join " +
    "and lifts identically (a mass re-consent must not OOM the driver)") {
    val root = tmp("graft_retention_bulk")
    val path = s"$root/corpus"
    try {
      freshCorpus(path)
      Retention.deleteIds(Seq(1L, 2L, 3L).toDF("id"), path, "id")
      def liveIds = BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet
      assert(!liveIds.contains(1L) && !liveIds.contains(3L))
      // broadcastLimit = 0 forces every lift set over the gate — the
      // shuffled path must produce the same lift the broadcast path does
      assert(Retention.reinstate(Seq(1L, 3L).toDF("id"), path, "id",
        broadcastLimit = 0L) == 2L)
      assert(liveIds.contains(1L) && !liveIds.contains(2L) && liveIds.contains(3L))
      // id 2's tombstone survived the bulk lift
      assert(Retention.hasTombstones(path))
    } finally rm(root)
  }

  test("tombstone-aware compaction: over-threshold buckets drop dead rows while " +
    "rewriting, covered tombstones clear, uncovered stay queued, reads identical") {
    val root = tmp("graft_retention_cmp")
    val path = s"$root/corpus"
    try {
      // many small appends → every bucket well over the maxFiles threshold
      (0 until 6).foreach { k =>
        val rows = (0L until 100L).filter(_ % 6 == k)
          .map(i => (i, s"text_$i")).toDF("id", "t")
        BucketedCorpus.append(rows, path, "id", buckets = 4)
      }
      // dead ids: 0 and 1 land in (at most) two buckets; id 0's bucket
      // will be rewritten (all are over threshold), so both are covered
      Retention.deleteIds(Seq(0L, 1L).toDF("id"), path, "id")
      val logical = BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet
      assert(logical == (2L until 100L).toSet)
      val rewritten = BucketedCorpus.compact(spark, path, maxFiles = 2)
      assert(rewritten.size == 4, "all four over-threshold buckets rewrite")
      // physically clean: the raw files no longer hold the dead rows
      assert(spark.read.parquet(path).where(col("id") < 2).count() == 0)
      // covered tombstones cleared — vacuum now has nothing to do
      assert(!Retention.hasTombstones(path))
      assert(Retention.vacuum(spark, path, "id").isEmpty)
      // reads identical before and after
      assert(BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet == logical)
      // an UNCOVERED tombstone (its bucket under the threshold) stays
      // queued: compact again with nothing over threshold
      Retention.deleteIds(Seq(50L).toDF("id"), path, "id")
      val r2 = BucketedCorpus.compact(spark, path, maxFiles = 16)
      assert(r2.isEmpty && Retention.hasTombstones(path))
      assert(BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet == logical - 50L)
    } finally rm(root)
  }

  test("maintenance marker fast path: reads skip per-bucket recovery probes when " +
    "no marker is present, and still recover a crashed rewrite when it is") {
    import org.apache.hadoop.fs.Path
    import graft.sources.Compaction
    val root = tmp("graft_retention_mark")
    val path = s"$root/corpus"
    try {
      freshCorpus(path)
      val expected = BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet
      val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
      // a completed maintenance pass leaves NO marker behind
      Retention.deleteIds(Seq(5L).toDF("id"), path, "id")
      Retention.vacuum(spark, path, "id")
      assert(!fs.exists(new Path(path, Compaction.MaintenanceMarker)))
      // simulate a CRASHED rewrite in one bucket: temp rows + ready marker
      // + manifest listing the live files (the roll-forward state), plus
      // the layout-root maintenance marker every pass sets first
      val bucket = Option(new java.io.File(path).listFiles()).get
        .filter(f => f.isDirectory &&
          f.getName.startsWith(BucketedCorpus.BucketCol + "="))
        .maxBy(f => f.listFiles().count(_.getName.endsWith(".parquet")))
      val dir = new Path(bucket.getPath)
      val files = fs.listStatus(dir).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      val rows = spark.read.parquet(files.map(_.getPath.toString): _*)
      val tmpDir = new Path(dir, "_graft_compact_tmp")
      rows.coalesce(1).write.mode("overwrite").parquet(tmpDir.toString)
      val staged = fs.listStatus(tmpDir).filter(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      staged.zipWithIndex.foreach { case (s0, i) =>
        fs.rename(s0.getPath, new Path(tmpDir,
          s"graft-compact-spec-$i${s0.getPath.getName.dropWhile(_ != '.')}"))
      }
      fs.create(new Path(tmpDir, "_graft_ready"), true).close()
      val m = fs.create(new Path(dir, "_graft_compacting"), true)
      m.write(files.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
      m.close()
      Compaction.markMaintenance(fs, new Path(path))
      // the read sees the marker, recovers the bucket, and returns the
      // exact pre-crash rows — no duplicates from temp+originals
      assert(BucketedCorpus.readAll(spark, path)
        .select("id").as[Long].collect().toSet == expected - 5L)
      assert(!fs.exists(new Path(dir, "_graft_compacting")))
      // the marker itself stays until a maintenance pass completes — a
      // reader cannot know whether a LIVE job is mid-rewrite elsewhere
      assert(fs.exists(new Path(path, Compaction.MaintenanceMarker)))
      Compaction.compactLeafPartitions(spark, path, maxFiles = 1000)
      assert(!fs.exists(new Path(path, Compaction.MaintenanceMarker)))
    } finally rm(root)
  }

  test("ingest probe treats tombstoned corpus rows as absent (postings orphaned, content kept)") {
    import graft.streaming.IngestDedup
    val root = tmp("graft_retention_probe")
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      val docA = "the quick brown fox jumps over the lazy dog near the river bank today"
      val docB = "completely different content about spark query engines and columnar formats"
      IngestDedup.processBatch(Seq((0L, docA), (1L, docB)).toDF("doc_id", "text"),
        idx, cor, "text", "doc_id", numHashes = 32, bands = 16, prefixBits = 4)
      // erase doc 0; its index postings become orphans
      Retention.deleteIds(Seq(0L).toDF("doc_id"), cor, "doc_id")
      def corpusIds = BucketedCorpus.readAll(spark, cor)
        .select("doc_id").as[Long].collect().toSet
      assert(corpusIds == Set(1L))
      // re-ingesting docA content must SURVIVE: the orphan posting cannot
      // verify against a live corpus row
      IngestDedup.processBatch(Seq((7L, docA)).toDF("doc_id", "text"),
        idx, cor, "text", "doc_id", numHashes = 32, bands = 16, prefixBits = 4)
      assert(corpusIds == Set(1L, 7L))
      // and replaying it now dedups against the NEW live copy
      IngestDedup.processBatch(Seq((8L, docA)).toDF("doc_id", "text"),
        idx, cor, "text", "doc_id", numHashes = 32, bands = 16, prefixBits = 4)
      assert(corpusIds == Set(1L, 7L))
    } finally rm(root)
  }
}
