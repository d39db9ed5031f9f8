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
    if (!java.nio.file.Files.exists(dst)) java.nio.file.Files.copy(src, dst)
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
    val maxTs = batch.agg(max(col("ts"))).first().getTimestamp(0)
    val closedExpected = expected.where(col("window_end") <= lit(maxTs))
    val s = streamed.select("window_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val e = closedExpected.select("window_start", "event_type", "n").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(e.subsetOf(s), s"missing windows: ${(e -- s).take(3)}")
    assert(s.nonEmpty)
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
}
