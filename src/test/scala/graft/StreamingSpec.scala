package graft

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming semantics pinned against the equivalent batch computation. */
class StreamingSpec extends SparkTestBase {

  private val dir: String = {
    // file streams require a directory source; stage the single parquet file
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    val d = java.nio.file.Paths.get("target/stream_events")
    java.nio.file.Files.createDirectories(d)
    val dst = d.resolve("events.parquet")
    // always refresh: a staged copy from an earlier round may carry a stale
    // ts encoding (ns longs vs timestamp[us])
    java.nio.file.Files.copy(src, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    d.toString
  }

  test("windowed counts: streaming result equals batch result") {
    val raw = spark.read.parquet(dir)
    val batch = EventStreams.normalizeEventTs(raw)
    val q = EventStreams.runToMemory(spark, dir, raw, "win_sink", outputMode = "append") { s =>
      EventStreams.windowedCounts(EventStreams.normalizeEventTs(s), windowLength = "1 hour", watermark = "0 seconds")
    }
    q.processAllAvailable()
    q.stop()
    // append mode emits only watermark-closed windows; with watermark 0 and
    // a finite file source, all but the max-event-time window close.
    val streamed = spark.table("win_sink")
    val expected = EventStreams.windowedCounts(batch, windowLength = "1 hour", watermark = "0 seconds")
    // ts may be TIMESTAMP (java.sql.Timestamp) or TIMESTAMP_NTZ
    // (java.time.LocalDateTime) depending on the round's parquet encoding —
    // compare window starts generically
    val maxTs = batch.agg(max(col("ts"))).first().get(0)
    val closedExpected = expected.where(col("window_end") <= lit(maxTs))
    val s = streamed.select("window_start", "event_type", "n").collect()
      .map(r => (r.get(0), r.getString(1), r.getLong(2))).toSet
    val e = closedExpected.select("window_start", "event_type", "n").collect()
      .map(r => (r.get(0), r.getString(1), r.getLong(2))).toSet
    assert(e.subsetOf(s), s"missing windows: ${(e -- s).take(3)}")
    assert(s.nonEmpty)
  }

  test("normalizeEventTs handles every ts encoding the driver has shipped") {
    import spark.implicits._
    // nanosecond longs (rounds ≤ 4 under nanosAsLong)
    val longTs = Seq((1L, 1704067200123456789L), (2L, 1704067201123456789L))
      .toDF("event_id", "ts")
    val n1 = EventStreams.normalizeEventTs(longTs)
    assert(n1.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(n1.selectExpr("unix_micros(ts)").collect().map(_.getLong(0)).toSeq
      == Seq(1704067200123456L, 1704067201123456L))
    // TIMESTAMP_NTZ (timestamp[us] parquet, round 5+) → cast for watermarks
    val ntz = Seq((1L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)))
      .toDF("event_id", "ts")
    assert(ntz.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val n2 = EventStreams.normalizeEventTs(ntz)
    assert(n2.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    // UTC session: wall clock preserved
    assert(n2.selectExpr("unix_micros(ts)").first().getLong(0)
      == 1704067200000000L)
    // already-TIMESTAMP frames pass through
    val tsDf = n1
    assert(EventStreams.normalizeEventTs(tsDf).schema == tsDf.schema)
  }

  test("streaming dedup drops duplicate event ids") {
    val raw = spark.read.parquet(dir)
    val batch = EventStreams.normalizeEventTs(raw)
    val q = EventStreams.runToMemory(spark, dir, raw, "dedup_sink") { s =>
      EventStreams.dedupedEvents(EventStreams.normalizeEventTs(s), watermark = "0 seconds")
    }
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedup_sink").count()
    val expected = batch.dropDuplicates("event_id", "ts").count()
    assert(streamed == expected)
  }

  test("streaming value compare matches SparkCompare on the same frames") {
    import spark.implicits._
    implicit val s = spark
    val left = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (5L, 50.0)).toDF("id", "v")
    val right = Seq((1L, 10.0), (2L, 21.0), (4L, 40.0)).toDF("id", "v")
    // batch mode: one update per key with final status
    val updates = EventStreams.streamingValueCompare(left, right, "id", "v")
      .collect().map(u => u.key -> u.status).toMap
    assert(updates == Map(1L -> "match", 2L -> "mismatch", 3L -> "left_only",
      4L -> "right_only", 5L -> "left_only"))
    // agrees with the batch engine
    val c = new graft.operators.SparkCompare(spark, left, right,
      graft.operators.CompareConfig(joinColumns = Seq("id")))
    assert(updates.values.count(_ == "match") + updates.values.count(_ == "mismatch")
      == c.intersectCount)
    assert(updates.values.count(_ == "left_only") == c.df1UnqCount)
    assert(updates.values.count(_ == "right_only") == c.df2UnqCount)
    assert(updates.values.count(_ == "match").toLong == c.countMatchingRows)
    // null==null matches, like the comparator pipeline
    val ln = Seq((7L, Option.empty[Double])).toDF("id", "v")
    val rn = Seq((7L, Option.empty[Double])).toDF("id", "v")
    val nu = EventStreams.streamingValueCompare(ln, rn, "id", "v").collect()
    assert(nu.head.status == "match")
  }

  test("streaming value compare runs incrementally over file streams") {
    implicit val s = spark
    import spark.implicits._
    val base = java.nio.file.Paths.get("target/stream_cmp")
    val (ld, rd) = (base.resolve("left"), base.resolve("right"))
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    java.nio.file.Files.createDirectories(ld)
    java.nio.file.Files.createDirectories(rd)
    val left = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val right = Seq((1L, 10.0), (2L, 99.0)).toDF("id", "v")
    left.coalesce(1).write.mode("overwrite").parquet(ld.toString)
    right.coalesce(1).write.mode("overwrite").parquet(rd.toString)
    val ls = spark.readStream.schema(left.schema).parquet(ld.toString)
    val rs = spark.readStream.schema(right.schema).parquet(rd.toString)
    val q = EventStreams.streamingValueCompare(ls, rs, "id", "v")
      .writeStream.format("memory").queryName("cmp_sink").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    // latest update per key is the final status
    val rows = spark.table("cmp_sink").collect().map(r => r.getLong(0) -> r.getString(3))
    val last = rows.groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
    assert(last == Map(1L -> "match", 2L -> "mismatch"))
  }

  test("watermarked stream-stream compare join: streaming equals batch") {
    import spark.implicits._
    val base = java.nio.file.Paths.get("target/stream_join")
    val (ld, rd) = (base.resolve("left"), base.resolve("right"))
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val left = Seq((1L, ts(0), 10.0), (2L, ts(1), 20.0), (3L, ts(2), 30.0))
      .toDF("id", "ts", "v")
    val right = Seq((1L, ts(1), 10.0), (2L, ts(3), 21.0), (3L, ts(30), 30.0))
      .toDF("id", "ts", "v") // id 3 arrives outside the 5-minute join window
    left.coalesce(1).write.parquet(ld.toString)
    right.coalesce(1).write.parquet(rd.toString)
    val batch = EventStreams.streamingCompareJoin(left, right, "id", "ts", "v")
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSet
    assert(batch == Set((1L, true), (2L, false))) // id 3 excluded by the window
    val ls = spark.readStream.schema(left.schema).parquet(ld.toString)
    val rs = spark.readStream.schema(right.schema).parquet(rd.toString)
    val q = EventStreams.streamingCompareJoin(ls, rs, "id", "ts", "v")
      .writeStream.format("memory").queryName("join_sink").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("join_sink").collect()
      .map(r => (r.getLong(0), r.getBoolean(3))).toSet
    assert(streamed == batch)
  }

  test("streaming anomaly: ring state crosses micro-batches; equals batch window") {
    import spark.implicits._
    import graft.operators.TimeSeries
    import graft.streaming.StreamingAnomaly
    implicit val s = spark
    val base = java.nio.file.Paths.get("target/stream_anomaly")
    org.apache.commons.io.FileUtils.deleteQuietly(base.toFile)
    java.nio.file.Files.createDirectories(base)
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // user 1's history SPANS the batch split: 6 priors in batch 1, the
    // outlier (and an in-band row) in batch 2 — the flag depends on state
    // carried across micro-batches, the exact merge path a one-shot replay
    // would mask (round-5 lesson: split batches must share keys)
    val all = (1 to 6).map(i => (1L, i.toLong, ts(i), 10.0)) ++
      Seq((1L, 7L, ts(7), 95.0), (1L, 8L, ts(8), 10.5))
    val (b1, b2) = (all.take(6), all.drop(6))
    def writeHalf(rows: Seq[(Long, Long, java.sql.Timestamp, Double)],
        name: String, mtime: Long): Unit = {
      val tmp = base.resolve(s"tmp_$name")
      rows.toDF("user_id", "event_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = java.nio.file.Files.list(tmp).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(part, base.resolve(s"$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(base.resolve(s"$name.parquet"),
        java.nio.file.attribute.FileTime.fromMillis(mtime))
      org.apache.commons.io.FileUtils.deleteQuietly(tmp.toFile)
    }
    writeHalf(b1, "half0", 1000000L)
    writeHalf(b2, "half1", 2000000L)
    val batchDf = all.toDF("user_id", "event_id", "ts", "value")
    val expected = TimeSeries.anomalyFlags(batchDf, "user_id", "ts", "event_id",
        "value", lookback = 10, thresholdPct = 300L, minPrior = 5)
      .collect().map(r => (r.getLong(1), r.getLong(4), r.getLong(5))).toSet
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", "1").parquet(base.toString)
    val q = StreamingAnomaly.flags(stream, 10, 300L, 5).toDF()
      .writeStream.format("memory").queryName("anomaly_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("anomaly_sink").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("trailing_n"),
        r.getAs[Long]("trailing_sum_us"))).toSet
    assert(expected == Set((7L, 6L, 60000000L)))
    assert(streamed == expected)
  }

  test("stateful user sessions accumulate counts and sums") {
    implicit val s = spark
    val batch = EventStreams.normalizeEventTs(spark.read.parquet(dir)).limit(200)
    val updates = EventStreams.userSessions(batch).collect()
    assert(updates.nonEmpty)
    val byUser = batch.groupBy("user_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch mode emits one update per group holding the full totals
    updates.foreach(u => assert(u.events == byUser(u.userId)))
  }

  test("incremental rollup merge: maintained table equals the batch rollup; untouched partitions survive") {
    import graft.streaming.IncrementalRollup
    import spark.implicits._
    def rm(p: String): Unit =
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))
    val table = "target/test_incr_rollup"
    rm(table)
    def ev(rows: Seq[(Long, String, Double)]) = rows
      .toDF("us", "event_type", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"), col("value"))
    val h = 3600000000L // one hour of micros
    // batch 1: hour 0 (day 0) and hour 25 (day 1)
    IncrementalRollup.mergeHourlyBatch(
      ev(Seq((10L, "a", 1.5), (20L, "a", 2.5), (25 * h + 5L, "b", 1.0))), table)
    val after1 = spark.read.parquet(table)
      .select(col("bucket").cast("long"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(after1 == Set((0L, "a"), (25L, "b")), s"after batch 1: $after1")
    // batch 2: touches day 1 again (hour 25 MERGES) plus new day 2 —
    // day 0 must be physically untouched
    val day0File = new java.io.File(s"$table/day=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSeq
    IncrementalRollup.mergeHourlyBatch(
      ev(Seq((25 * h + 7L, "b", 3.0), (49 * h + 1L, "a", 4.0))), table)
    val got = spark.read.parquet(table)
      .select(col("bucket").cast("long").as("bucket"), col("event_type"), col("n"),
        col("total_v").cast("double").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      (0L, "a") -> ((2L, 4.0)),
      (25L, "b") -> ((2L, 4.0)),
      (49L, "a") -> ((1L, 4.0))))
    // dynamic partition overwrite left day 0's files alone
    val day0After = new java.io.File(s"$table/day=0").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toSeq
    assert(day0After == day0File)
  }

  test("streaming distinct sketch: batch merges are exact and idempotent") {
    import graft.streaming.StreamingDistinct
    import graft.operators.DistinctSketch
    import spark.implicits._
    def rm(p: String): Unit =
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))
    val table = "target/test_stream_distinct"
    rm(table)
    val m = 16
    def mk(rows: Seq[(String, String)]) = rows.toDF("g", "v")
    val b1 = mk(Seq(("a", "u1"), ("a", "u2"), ("b", "u1")))
    val b2 = mk(Seq(("a", "u2"), ("a", "u3"), ("b", "u9")))
    StreamingDistinct.mergeRegistersBatch(b1, table, Seq("g"), "v", m)
    StreamingDistinct.mergeRegistersBatch(b2, table, Seq("g"), "v", m)
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val maintained = regs(spark.read.parquet(table).select("g", "bucket", "register"))
    // exactly the batch registers over the union — max-merge loses nothing
    val batch = regs(DistinctSketch.registersByGroup(
      b1.unionByName(b2), Seq("g"), "v", m).select("g", "bucket", "register"))
    assert(maintained == batch && maintained.nonEmpty)
    // idempotent: replaying an already-merged batch changes nothing
    StreamingDistinct.mergeRegistersBatch(b2, table, Seq("g"), "v", m)
    assert(regs(spark.read.parquet(table).select("g", "bucket", "register")) == batch)
    // and the estimate off the maintained table equals the batch estimate
    val estM = DistinctSketch.estimateByGroup(
      spark.read.parquet(table), Seq("g"), m)
      .select("g", "sum_pow", "est").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val estB = DistinctSketch.estimateByGroup(
      DistinctSketch.registersByGroup(b1.unionByName(b2), Seq("g"), "v", m),
      Seq("g"), m)
      .select("g", "sum_pow", "est").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(estM == estB)
  }

  test("streaming CDC apply: one key inserted, updated, then deleted across batches") {
    import graft.streaming.StreamingCdcApply
    import spark.implicits._
    def rm(p: String): Unit =
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))
    val table = "target/test_cdc_stream_apply"
    rm(table)
    def snap: Map[Long, (String, Long)] = spark.read.parquet(table)
      .select("id", "name", "v").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    def batch(rows: Seq[(Long, String, String, Long)]) =
      rows.toDF("id", "change_type", "name", "v")
        .select(col("id"), col("change_type"), col("name"), col("v"))
    val keys = Seq("id")
    val vals = Seq("name", "v")
    StreamingCdcApply.seedSnapshot(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "v"), table, keys)
    assert(snap == Map(1L -> (("a", 10L)), 2L -> (("b", 20L))))
    // batch 1: insert key 3, update key 1
    StreamingCdcApply.applyChangeBatch(
      batch(Seq((3L, "insert", "c", 30L), (1L, "update", "a2", 11L))),
      table, keys, vals)
    assert(snap == Map(1L -> (("a2", 11L)), 2L -> (("b", 20L)), 3L -> (("c", 30L))))
    // batch 2: update the key batch 1 inserted — state carried across batches
    StreamingCdcApply.applyChangeBatch(
      batch(Seq((3L, "update", "c2", 31L))), table, keys, vals)
    assert(snap == Map(1L -> (("a2", 11L)), 2L -> (("b", 20L)), 3L -> (("c2", 31L))))
    // batch 3: delete that key; empty batch is a no-op
    StreamingCdcApply.applyChangeBatch(
      batch(Seq((3L, "delete", null, 0L))), table, keys, vals)
    StreamingCdcApply.applyChangeBatch(
      batch(Seq.empty), table, keys, vals)
    assert(snap == Map(1L -> (("a2", 11L)), 2L -> (("b", 20L))))
  }

  test("snapshot tables behind a file:-qualified URI: probe and bucket cleanup go through the Hadoop FileSystem") {
    import graft.streaming.{IncrementalRollup, StreamingCdcApply}
    import spark.implicits._
    def rm(p: String): Unit =
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))
    // CDC apply: the existence probe must FIND the seeded table through the
    // scheme-qualified path (a java.io.File probe would say "no table" and
    // batch 1 would overwrite-seed, losing key 2)
    val cdcLocal = new java.io.File("target/test_cdc_apply_uri").getAbsolutePath
    rm(cdcLocal)
    val cdcTable = "file:" + cdcLocal
    val keys = Seq("id")
    val vals = Seq("name", "v")
    StreamingCdcApply.seedSnapshot(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "name", "v"), cdcTable, keys)
    StreamingCdcApply.applyChangeBatch(
      Seq((1L, "update", "a2", 11L)).toDF("id", "change_type", "name", "v"),
      cdcTable, keys, vals)
    def snap: Map[Long, (String, Long)] = spark.read.parquet(cdcTable)
      .select("id", "name", "v").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(snap == Map(1L -> (("a2", 11L)), 2L -> (("b", 20L))))
    // a delete that empties key 1's bucket removes that bucket directory
    // through the same FileSystem (buckets=2 puts each key alone)
    val cdcLocal2 = new java.io.File("target/test_cdc_apply_uri2").getAbsolutePath
    rm(cdcLocal2)
    val cdcTable2 = "file:" + cdcLocal2
    StreamingCdcApply.seedSnapshot(
      Seq((1L, "a", 10L)).toDF("id", "name", "v"), cdcTable2, keys, buckets = 2)
    StreamingCdcApply.applyChangeBatch(
      Seq((1L, "delete", null.asInstanceOf[String], 0L))
        .toDF("id", "change_type", "name", "v"),
      cdcTable2, keys, vals, buckets = 2)
    // the now-empty table has no bucket directories left at all (the empty
    // bucket was deleted through the FileSystem, not left stale)
    assert(!new java.io.File(cdcLocal2).listFiles()
      .exists(_.getName.startsWith("__bucket=")))
    // incremental rollup: second batch must MERGE (probe found the table),
    // not replace
    val ruLocal = new java.io.File("target/test_incr_rollup_uri").getAbsolutePath
    rm(ruLocal)
    val ruTable = "file:" + ruLocal
    def ev(rows: Seq[(Long, String, Double)]) = rows
      .toDF("us", "event_type", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("event_type"), col("value"))
    IncrementalRollup.mergeHourlyBatch(ev(Seq((10L, "a", 1.5))), ruTable)
    IncrementalRollup.mergeHourlyBatch(ev(Seq((20L, "a", 2.5))), ruTable)
    val got = spark.read.parquet(ruTable)
      .select(col("n").cast("long"), col("total_v").cast("double")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((2L, 4.0)), s"rollup under file: URI merged to $got")
  }

  test("streaming ingest dedup: later micro-batches dedup against earlier ones") {
    import graft.streaming.IngestDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    def rm(p: String): Unit =
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))
    val indexPath = "target/ingest_mh_index"
    val corpusPath = "target/ingest_corpus"
    rm(indexPath); rm(corpusPath)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = IngestDedup.ingestWithDedup(
      input.toDF().toDF("doc_id", "text"), indexPath, corpusPath,
      "text", "doc_id", threshold = 0.5, numHashes = 32, bands = 16,
      prefixBits = 6)
    try {
      val a = "the quick brown fox jumps over the lazy dog near the river bank today"
      // batch 1: one exact in-batch dup (2 of 0) collapses before anything
      // is indexed; 0 and 1 survive and seed the corpus + index
      input.addData((0L, a),
        (1L, "completely different content about spark query engines and columnar formats"),
        (2L, a))
      q.processAllAvailable()
      def corpusIds = spark.read.parquet(corpusPath)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(corpusIds == Set(0L, 1L))
      // batch 2: 3 near-duplicates the ALREADY-INDEXED doc 0 (probe path);
      // 4 is genuinely new and survives
      input.addData(
        (3L, a.replace("today", "tonight")),
        (4L, "brand new unique text entirely unrelated to anything indexed before now"))
      q.processAllAvailable()
      assert(corpusIds == Set(0L, 1L, 4L))
      // the index grew too: a third batch replaying doc 4's content drops it
      input.addData((5L,
        "brand new unique text entirely unrelated to anything indexed before now"))
      q.processAllAvailable()
      assert(corpusIds == Set(0L, 1L, 4L))
    } finally q.stop()
  }

  test("streaming ingest dedup self-compacts the postings index on its batch schedule") {
    import graft.streaming.IngestDedup
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    def rm(p: String): Unit =
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(p))
    val indexPath = "target/ingest_mh_index_selfcompact"
    val corpusPath = "target/ingest_corpus_selfcompact"
    rm(indexPath); rm(corpusPath)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // prefixBits=1 → two pfx dirs, so every batch touches both and the
    // second batch provably leaves 2 files per dir for the compactor;
    // compaction fires after batch 2 (batchId 1: (1+1) % 2 == 0)
    val q = IngestDedup.ingestWithDedup(
      input.toDF().toDF("doc_id", "text"), indexPath, corpusPath,
      "text", "doc_id", threshold = 0.5, numHashes = 32, bands = 16,
      prefixBits = 1, compactEveryBatches = 2, compactMaxFiles = 1)
    def leafDataFiles: Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(indexPath)).filter(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("_") &&
          f.getParentFile.getName.startsWith("pfx="))
    }
    try {
      input.addData(
        (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1L, "completely different content about spark query engines and columnar formats"))
      q.processAllAvailable()
      input.addData(
        (2L, "a third body of text mentioning distributed joins and shuffle exchanges"),
        (3L, "yet another unrelated document on perceptual hashing of small images"))
      q.processAllAvailable()
      // the wired compactor ran: every pfx dir is back to ONE data file,
      // and the files are the compactor's (not just single-writer luck)
      val files = leafDataFiles
      val perDir = files.groupBy(_.getParentFile.getName).values.map(_.size)
      assert(perDir.nonEmpty && perDir.forall(_ == 1),
        s"expected 1 data file per pfx dir after self-compaction, got ${files.map(_.getPath)}")
      assert(files.exists(_.getName.startsWith("graft-compact-")),
        "expected compactor-written files in the index")
      // probe equality across the rewrite: replayed content still collapses
      input.addData((4L,
        "the quick brown fox jumps over the lazy dog near the river bank today"))
      q.processAllAvailable()
      val ids = spark.read.parquet(corpusPath)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(0L, 1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming phash ingest self-compacts the banded index on its batch schedule") {
    import graft.operators.Multimodal
    import graft.streaming.IngestPhash
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_phash_stream").toString
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    def media(ids: Seq[Long], offset: Long): Seq[(Long, Array[Byte])] =
      Multimodal.syntheticStillVariants(
        ids.map(id => (id + offset, id, 0)).toDF("media_id", "base_id", "bump"),
        "media_id", "base_id", "bump")
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]]("content"))).toSeq
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    // compaction fires after batch 2 (batchId 1); prefixBits=1 keeps the
    // bp partition space small so both batches hit shared dirs
    val q = IngestPhash.ingestWithDedup(
      input.toDF().toDF("media_id", "content"), idx, cor,
      maxHamming = 3, prefixBits = 1,
      compactEveryBatches = 2, compactMaxFiles = 1)
    try {
      input.addData(media(0L until 8L, 0L)); q.processAllAvailable()
      input.addData(media(8L until 16L, 0L)); q.processAllAvailable()
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val dataFiles = walk(new java.io.File(idx)).filter(f =>
        f.getName.endsWith(".parquet") &&
          f.getParentFile.getName.startsWith("bp="))
      assert(dataFiles.exists(_.getName.startsWith("graft-compact-")),
        s"expected compactor-written files, got ${dataFiles.map(_.getName)}")
      assert(dataFiles.groupBy(_.getParentFile.getName).values.forall(_.size == 1),
        "every bp dir should hold one data file after self-compaction")
      // probe across the rewrite: exact replays of indexed payloads drop
      val before = spark.read.parquet(cor).count()
      input.addData(media(Seq(0L, 9L), 0L).map { case (i, c) => (i + 5000L, c) })
      q.processAllAvailable()
      assert(spark.read.parquet(cor).count() == before)
    } finally {
      q.stop()
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }
}
