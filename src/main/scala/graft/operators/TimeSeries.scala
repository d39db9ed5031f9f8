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

  /** CUSUM changepoint detection with EXACT integer arithmetic: per key,
    * the one-sided cumulative-sum statistic over deviations from a fixed
    * reference,
    *   s_i = max(0, s_{i−1} + (v_i − ref)),
    * rewritten window-expressibly as s_i = prefix_i − min_{j ≤ i} prefix_j
    * with prefix_i = Σ_{j ≤ i} (v_j − ref) — a running sum and a running
    * min over the SAME (ts, tie) order, so both fold into one Window node
    * over one key shuffle. Values ride as decimal-exact micro-units; the
    * statistic is pure BIGINT, bit-identical in any engine (float CUSUM
    * backfills drift). Returns the events where s_i first-or-again exceeds
    * `thresholdUs`: (keyCol, tieCol, ts_us, value_us, cusum_us). */
  def cusumFlags(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      referenceUs: Long,
      thresholdUs: Long): DataFrame = {
    val ordered = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, 0L)
    val vUs = (col(valueCol).cast("decimal(18,6)") * lit(1000000L)).cast("long")
    events
      .select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol)).as("ts_us"),
        (vUs - lit(referenceUs)).as("dev_us"), vUs.as("value_us"))
      .select(col(keyCol), col(tieCol), col("ts_us"), col("value_us"),
        sum(col("dev_us")).over(ordered).as("prefix_us"))
      // the running min must include the EMPTY prefix (0) — that is what
      // encodes the max(0, ·) reset of the recurrence. Same window spec,
      // same sort: the second pass adds no exchange.
      .select(col(keyCol), col(tieCol), col("ts_us"), col("value_us"),
        (col("prefix_us") -
          least(lit(0L), min(col("prefix_us")).over(ordered))).as("cusum_us"))
      .where(col("cusum_us") > thresholdUs)
  }

  /** Trailing-window anomaly detection with EXACT integer arithmetic: flag
    * every event whose value deviates from the mean of the key's previous
    * `lookback` events by more than `thresholdPct` percent of that mean.
    *
    * The test |v − s/n| > (p/100)·|s/n| is evaluated cross-multiplied as
    * 100·|n·v − s| > p·|s| — no division ever happens, so the flag set is
    * a pure integer predicate, bit-identical in any engine (the float
    * z-score formulation differs in ulps across engines and is the reason
    * most anomaly backfills can't be replayed exactly). Values ride as
    * exact micro-units (decimal(18,6) unscaled into BIGINT).
    *
    * Scale shape: one hash shuffle on the key, a ROWS-framed window that
    * slides incrementally over each partition's time sort — the same
    * single-exchange plan as [[trailingFeatures]]. Returns only the
    * flagged events: (keyCol, tieCol, ts_us, value_us, trailing_n,
    * trailing_sum_us). */
  def anomalyFlags(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      valueCol: String,
      lookback: Int,
      thresholdPct: Long,
      minPrior: Int): DataFrame = {
    require(lookback >= minPrior && minPrior >= 1,
      s"need lookback >= minPrior >= 1, got $lookback/$minPrior")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("ts_us").asc, col(tieCol).asc)
      .rowsBetween(-lookback.toLong, -1L)
    val vUs = (col(valueCol).cast("decimal(18,6)") * lit(1000000L))
      .cast("long")
    events
      .select(col(keyCol), col(tieCol),
        unix_micros(col(tsCol)).as("ts_us"), vUs.as("value_us"))
      .select(col("*"),
        count(lit(1)).over(w).as("trailing_n"),
        coalesce(sum(col("value_us")).over(w), lit(0L)).as("trailing_sum_us"))
      .where(col("trailing_n") >= minPrior &&
        abs(col("trailing_n") * col("value_us") - col("trailing_sum_us")) * 100L >
          lit(thresholdPct) * abs(col("trailing_sum_us")))
  }
}
