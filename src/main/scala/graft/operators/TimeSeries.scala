package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key trailing event-time features — the feature-engineering staple
  * ("events and value sum in the last hour, at every event") computed the
  * way a 1000-executor cluster wants it: ONE hash shuffle on the key, then
  * RANGE-framed window aggregates over the in-partition time sort. No
  * self-joins, no per-event range probes; the frame slides incrementally
  * over each partition.
  *
  * The RANGE frame is defined on epoch micros, so peer rows (exact-tie
  * timestamps) are all inside the frame — the SQL-standard semantics every
  * engine shares, which keeps count/sum order-independent and the result
  * engine-exact (sums carried in decimal). The previous-event gap uses a
  * (ts, tieCol) total order instead, so it stays deterministic under ties.
  */
object TimeSeries {

  /** Attach `trailing_n`, `trailing_sum` (over [ts − horizon, ts]) and
    * `gap_us` (micros since the key's previous event, null at the first)
    * to every event row. */
  def trailingFeatures(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      horizonSeconds: Long): DataFrame = {
    val horizonMicros = horizonSeconds * 1000000L
    // materialize micros ONCE: separate unix_micros expression instances
    // would give the two range aggregates distinct order keys, splitting
    // them into two Window nodes (two sort passes) instead of one
    val usCol = "_graft_ts_us"
    val micros = col(usCol)
    val ranged = Window.partitionBy(col(keyCol)).orderBy(micros)
      .rangeBetween(-horizonMicros, 0L)
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(micros.asc, col(tieCol).asc)
    events
      .withColumn(usCol, unix_micros(col(tsCol)))
      // both range aggregates in ONE projection → one Window node (two
      // withColumn steps would interleave Projects that defeat
      // CollapseWindow), the tie-ordered lag in its own row-frame pass
      .select(col("*"),
        count(lit(1)).over(ranged).as("trailing_n"),
        sum(col(valueCol).cast("decimal(18,6)")).over(ranged)
          .cast("double").as("trailing_sum"),
        (micros - lag(micros, 1).over(ordered)).as("gap_us"))
      .drop(usCol)
  }
}
