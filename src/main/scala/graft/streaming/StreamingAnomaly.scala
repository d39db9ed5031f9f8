package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.TimeSeries.anomalyFlags]]: per-key
  * trailing-window deviation detection over an unbounded stream with
  * BOUNDED state — a ring of the key's last `lookback` events.
  *
  * Because the deviation test is the exact cross-multiplied integer
  * predicate 100·|n·v − s| > p·|s| (no division, no floats), the stream's
  * flag set is BIT-IDENTICAL to the batch window formulation whenever
  * events arrive per key in (ts, id) order across micro-batches (each
  * batch's group iterator is sorted here; the replay harness's staged
  * halves split on the ts midpoint, so cross-batch order holds). That is
  * what lets the incremental stateful query share the batch oracle SQL
  * verbatim — the property float z-scores can never give a streaming
  * anomaly backfill.
  *
  * Scale shape: state per key is O(lookback) longs, independent of stream
  * length; each micro-batch shuffles only its own rows (one hash exchange
  * on the key). No watermark is required for correctness of the flags —
  * late data would simply see the ring as-of its arrival, exactly like any
  * online detector.
  */
object StreamingAnomaly {

  final case class EventRec(tsUs: Long, eventId: Long, valueUs: Long)
  final case class Ring(events: Seq[EventRec])
  final case class Flag(
      user_id: Long, event_id: Long, ts_us: Long, value_us: Long,
      trailing_n: Long, trailing_sum_us: Long)

  final case class CusumState(s: Long)
  final case class CusumFlag(
      user_id: Long, event_id: Long, ts_us: Long, value_us: Long, cusum_us: Long)

  /** Streaming twin of [[graft.operators.TimeSeries.cusumFlags]]: the
    * CUSUM recurrence s ← max(0, s + (v − ref)) maintained per key in
    * flatMapGroupsWithState with O(1) state — ONE BIGINT per key, the
    * cheapest stateful operator there is. Pure integer arithmetic ⇒ the
    * stream's flag set equals the batch window formulation bit-for-bit
    * under in-order per-key arrival, sharing the batch oracle verbatim. */
  def cusumFlags(
      events: DataFrame,
      referenceUs: Long,
      thresholdUs: Long)(implicit spark: SparkSession): Dataset[CusumFlag] = {
    import spark.implicits._
    val typed = events.select(
      col("user_id").cast("long").as("_1"),
      unix_micros(col("ts")).as("_2"),
      col("event_id").cast("long").as("_3"),
      (col("value").cast("decimal(18,6)") * lit(1000000L)).cast("long").as("_4"))
      .as[(Long, Long, Long, Long)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, Long, Long, Long)],
            state: GroupState[CusumState]) => {
          val batch = rows.map { case (_, ts, id, v) => EventRec(ts, id, v) }
            .toSeq.sortBy(e => (e.tsUs, e.eventId))
          var s = state.getOption.map(_.s).getOrElse(0L)
          val out = Vector.newBuilder[CusumFlag]
          batch.foreach { e =>
            s = math.max(0L, s + (e.valueUs - referenceUs))
            if (s > thresholdUs)
              out += CusumFlag(userId, e.eventId, e.tsUs, e.valueUs, s)
          }
          state.update(CusumState(s))
          out.result().iterator
        })
  }

  /** Flag anomalies on a (streaming or batch) events frame with columns
    * (user_id, ts, event_id, value). Emits one row per flagged event. */
  def flags(
      events: DataFrame,
      lookback: Int,
      thresholdPct: Long,
      minPrior: Int)(implicit spark: SparkSession): Dataset[Flag] = {
    import spark.implicits._
    require(lookback >= minPrior && minPrior >= 1,
      s"need lookback >= minPrior >= 1, got $lookback/$minPrior")
    val typed = events.select(
      col("user_id").cast("long").as("_1"),
      unix_micros(col("ts")).as("_2"),
      col("event_id").cast("long").as("_3"),
      (col("value").cast("decimal(18,6)") * lit(1000000L)).cast("long").as("_4"))
      .as[(Long, Long, Long, Long)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, rows: Iterator[(Long, Long, Long, Long)],
            state: GroupState[Ring]) => {
          // in-batch arrival order is arbitrary; the batch mirror's window
          // runs over the (ts, id) total order, so impose it per batch
          val batch = rows.map { case (_, ts, id, v) => EventRec(ts, id, v) }
            .toSeq.sortBy(e => (e.tsUs, e.eventId))
          var ring = state.getOption.map(_.events.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[Flag]
          batch.foreach { e =>
            val n = ring.size.toLong
            if (n >= minPrior) {
              val s = ring.iterator.map(_.valueUs).sum
              if (math.abs(n * e.valueUs - s) * 100L > thresholdPct * math.abs(s))
                out += Flag(userId, e.eventId, e.tsUs, e.valueUs, n, s)
            }
            ring = (ring :+ e).takeRight(lookback)
          }
          state.update(Ring(ring))
          out.result().iterator
        })
  }
}
