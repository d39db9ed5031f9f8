package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over event streams (net-new scope beyond
  * the reference, which has no streaming story — SURVEY §2.9).
  *
  * Each transform takes a streaming-or-batch DataFrame and returns a lazy
  * plan: the same code path runs in both modes, which is how the batch
  * tests pin the streaming semantics. Designed for scale: watermarks bound
  * state, aggregations are keyed (partitioned) by (window, type) or user.
  */
object EventStreams {

  /** Normalize an event frame's `ts` into an event-time-capable TIMESTAMP:
    * nanosecond longs (parquet TIMESTAMP(NANOS) read under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) convert via
    * timestamp_micros; TIMESTAMP_NTZ (timestamp[us] parquet) casts to
    * TIMESTAMP because `withWatermark` rejects NTZ event time — the cast
    * interprets the wall clock in the session zone (harness sessions pin
    * UTC), and batch/stream consistency is preserved because both sides
    * normalize through this same function. */
  def normalizeEventTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(tsCol, timestamp_micros((col(tsCol) / 1000).cast("long")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  /** Tumbling/sliding window counts + value sums per event type, bounded by
    * a watermark for late data. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String = "ts",
      windowLength: String = "5 minutes",
      slide: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowLength, s)
      case None => window(col(tsCol), windowLength)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming exact dedup on event_id within the watermark horizon —
    * Spark keeps one state entry per id and drops it once the watermark
    * passes, so state is bounded. */
  def dedupedEvents(
      events: DataFrame,
      tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates("event_id", tsCol)

  /** Per-user session state for flatMapGroupsWithState. */
  final case class SessionState(count: Long, totalValue: Double, lastTs: Long)
  final case class SessionUpdate(userId: Long, events: Long, totalValue: Double)

  /** Custom stateful aggregation: running per-user totals emitted on every
    * update (KeyValueGroupedDataset.flatMapGroupsWithState). */
  def userSessions(events: DataFrame)(implicit spark: SparkSession): Dataset[SessionUpdate] = {
    import spark.implicits._
    val typed = events.select(
      col("user_id").cast("long").as("_1"),
      col("value").cast("double").as("_2"),
      col("ts").cast("timestamp").cast("long").as("_3")).as[(Long, Double, Long)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, Double, Long)], state: GroupState[SessionState]) => {
          var s = state.getOption.getOrElse(SessionState(0L, 0.0, Long.MinValue))
          rows.foreach { case (_, v, ts) =>
            s = SessionState(s.count + 1, s.totalValue + v, math.max(s.lastTs, ts))
          }
          state.update(s)
          Iterator(SessionUpdate(userId, s.count, s.totalValue))
        })
  }

  // ---- incremental two-stream comparison (streaming analogue of
  // SparkCompare's core loop: pair rows by key across two sources, emit
  // match status as data arrives) ----

  final case class CompareSideRow(key: Long, side: Int, value: Option[Double])
  final case class ComparePairState(l: Option[Option[Double]], r: Option[Option[Double]])
  final case class CompareUpdate(
      key: Long, leftValue: Option[Double], rightValue: Option[Double], status: String)

  /** Incremental keyed comparison of two (streaming or batch) frames on one
    * numeric column: every arriving row updates per-key state and emits the
    * key's current status — `left_only` / `right_only` upgrades to `match` /
    * `mismatch` when the other side lands (downstream keeps the latest
    * update per key). Null-safe like the batch comparator: null==null is a
    * match, NaN==NaN is a match. State is one (two-option) entry per key —
    * at scale, bound it with a watermark upstream or a timeout policy; the
    * same code path runs in batch mode, which is how the spec pins the
    * semantics against SparkCompare. */
  def streamingValueCompare(
      left: DataFrame, right: DataFrame,
      keyCol: String, valueCol: String)(implicit spark: SparkSession): Dataset[CompareUpdate] = {
    import spark.implicits._
    def sided(df: DataFrame, side: Int) = df.select(
      col(keyCol).cast("long").as("key"),
      lit(side).as("side"),
      col(valueCol).cast("double").as("value")).as[CompareSideRow]
    sided(left, 0).union(sided(right, 1))
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[CompareSideRow], state: GroupState[ComparePairState]) => {
          var s = state.getOption.getOrElse(ComparePairState(None, None))
          rows.foreach { row =>
            if (row.side == 0) s = s.copy(l = Some(row.value))
            else s = s.copy(r = Some(row.value))
          }
          state.update(s)
          val status = (s.l, s.r) match {
            case (Some(a), Some(b)) =>
              val eq = (a, b) match {
                case (None, None) => true
                case (Some(x), Some(y)) => x == y || (x.isNaN && y.isNaN)
                case _ => false
              }
              if (eq) "match" else "mismatch"
            case (Some(_), None) => "left_only"
            case (None, Some(_)) => "right_only"
            case _ => "empty"
          }
          Iterator(CompareUpdate(key, s.l.flatten, s.r.flatten, status))
        })
  }

  /** Watermark-bounded stream-stream comparison join: inner-join two
    * event-keyed streams whose rows carry event time, requiring the two
    * sides' timestamps within `joinWindow` of each other, and compare one
    * value column null-safely. Unlike [[streamingValueCompare]] (exact but
    * unbounded state), watermarks let Spark DROP join state older than the
    * horizon — state scales with the in-flight window, not stream length,
    * which is the 100 TB/continuous-ingest configuration. Emits
    * (key, left_value, right_value, is_match). */
  def streamingCompareJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      watermark: String = "10 minutes",
      joinWindow: String = "5 minutes"): DataFrame = {
    val l = left.select(col(keyCol).as("l_key"), col(tsCol).as("l_ts"),
      col(valueCol).as("l_value")).withWatermark("l_ts", watermark)
    val r = right.select(col(keyCol).as("r_key"), col(tsCol).as("r_ts"),
      col(valueCol).as("r_value")).withWatermark("r_ts", watermark)
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $joinWindow") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $joinWindow"))
      .select(col("l_key").as("key"), col("l_value"), col("r_value"),
        (col("l_value") <=> col("r_value")).as("is_match"))
  }

  /** Launch a file-source stream over a parquet directory mirroring a batch
    * frame's schema, apply `transform`, collect into a named memory sink.
    * Returns the query; callers `processAllAvailable()` then read
    * `spark.table(sinkName)`. `sourceOptions` flow to the file source
    * (e.g. `maxFilesPerTrigger` to force multi-micro-batch replays);
    * `checkpointDir` pins the checkpoint location (e.g. tmpfs) instead of
    * the default temp-dir fallback. */
  def runToMemory(
      spark: SparkSession,
      sourceDir: String,
      schemaOf: DataFrame,
      sinkName: String,
      outputMode: String = "append",
      sourceOptions: Map[String, String] = Map.empty,
      checkpointDir: Option[String] = None)(
      transform: DataFrame => DataFrame): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schemaOf.schema)
      .options(sourceOptions).parquet(sourceDir)
    val writer = transform(stream).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(outputMode)
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
