package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization: the classic event-pipeline rollup —
  * split each key's event stream into sessions wherever the gap between
  * consecutive events exceeds a threshold, then aggregate per session.
  * (The streaming analogue lives in [[graft.streaming.EventStreams]]; this
  * is the backfill/batch formulation over the same data.)
  *
  * Scale design: one hash shuffle on the key, one in-partition sort, two
  * window passes that reuse the same (partition, order) — `lag` to flag
  * session starts, running `sum` to number sessions — then a groupBy on
  * (key, session) that arrives pre-partitioned by key, so AQE plans it
  * without a second full shuffle of the event rows. No self-joins, no
  * row duplication; skew is bounded by the hottest key, same as the
  * equivalent streaming state.
  *
  * Timestamps are compared in epoch microseconds (`unix_micros`), so the
  * gap test is timezone-independent; normalize ts to TIMESTAMP first (see
  * EventStreams.normalizeEventTs) — NTZ/long inputs are the caller's to
  * convert.
  */
object Sessionize {

  /** Attach `session_seq` (1-based per key, in time order) to every event.
    * Ties on ts order deterministically by `tieCol`. */
  def withSessionSeq(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    val order = Seq(col(tsCol).asc, col(tieCol).asc)
    val byKey = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val micros = unix_micros(col(tsCol))
    val prev = lag(micros, 1).over(byKey)
    val isNew = when(
      prev.isNull || micros - prev > lit(gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    events
      .withColumn("_graft_new_session", isNew)
      .withColumn("session_seq",
        sum(col("_graft_new_session"))
          .over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_graft_new_session")
  }

  /** Per-session rollup: event count, span, and an exact decimal value sum
    * (surfaced as double so the result is order-independent). Session start
    * and end are emitted as epoch microseconds — integer-exact across
    * engines and timezones. */
  def sessionStats(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long,
      valueCol: String): DataFrame =
    withSessionSeq(events, keyCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("start_us"),
        max(unix_micros(col(tsCol))).as("end_us"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("value_sum"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
}
