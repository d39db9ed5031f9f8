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

  /** Horizon-truncated DISCOUNTED RETURNS over each key's trajectory —
    * the reward-shaping step of RL post-training data preparation: step t
    * gets `G_t = Σ_{j<h} γ^j · r_{t+j}` (the standard n-step return) over
    * the key's (ts, tie)-ordered event stream, with a DYADIC-RATIONAL
    * discount `γ = gammaNum / 2^gammaLog2Den` — 1/2 by default; γ = 3/4
    * is (3, 2), γ = 0.984375 ≈ 0.98 is (63, 6). The dyadic family brackets
    * any target γ to within 2^-s while keeping every step below exact.
    *
    * INTEGER-EXACT by construction (the repo's stats convention): rewards
    * are integer-scaled by the caller (`rewardCol` integral — scale
    * dollars to cents upstream), and the return is computed ENTIRELY in
    * long arithmetic as `G_scaled = Σ_j r_{t+j} · w_j` with the integer
    * weights `w_j = gammaNum^j · 2^(s·(h−1−j))` — i.e. `G_t · 2^(s·(h−1))`
    * — via `horizon` `lead()` taps over one window (no float ever;
    * `return_x` = G_scaled / 2^(s·(h−1)) is one dyadic division for the
    * float-friendly view, exact while |return_scaled| < 2^53). Engines
    * mirror it literally.
    *
    * Overflow contract, ENFORCED in two layers: the (horizon, γ)
    * combination must satisfy `Σ_j w_j ≤ Long.MaxValue` and
    * `s·(h−1) ≤ 62` — require'd at plan time — and every reward must
    * satisfy `|r| ≤ Long.MaxValue / Σ_j w_j` (which guarantees every tap
    * product and the full sum fit a long), checked PER ROW with a
    * raise_error branch naming the offending value: silent wraparound in
    * an operator whose whole pitch is exactness would be the worst
    * failure mode, and the comparison is one codegen'd branch per tap.
    *
    * Scale shape: ONE shuffle on the key, one window sort, `horizon`
    * narrow lead taps — no self-join, no per-step explode. Output: input
    * columns + `step` (1-based within the trajectory) + `return_scaled`
    * (long, = G·2^(s·(h−1))) + `return_x` (double). */
  def discountedReturns(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      rewardCol: String,
      horizon: Int,
      gammaNum: Long = 1L,
      gammaLog2Den: Int = 1): DataFrame = {
    require(horizon >= 1 && horizon <= 32,
      s"horizon must be in [1, 32], got $horizon")
    require(gammaLog2Den >= 1 && gammaLog2Den <= 62,
      s"gammaLog2Den must be in [1, 62], got $gammaLog2Den")
    require(gammaNum >= 1L && gammaNum <= (1L << gammaLog2Den),
      s"gammaNum must give γ = gammaNum/2^$gammaLog2Den in (0, 1], got " +
        s"$gammaNum")
    require(gammaLog2Den * (horizon - 1) <= 62,
      s"the scale 2^(gammaLog2Den·(horizon−1)) = 2^${
        gammaLog2Den * (horizon - 1)} overflows a long — shorten the " +
        "horizon or use a smaller gammaLog2Den (a coarser dyadic γ)")
    val weights = (0 until horizon).map(j =>
      BigInt(gammaNum).pow(j) * BigInt(2).pow(gammaLog2Den * (horizon - 1 - j)))
    val wSum = weights.sum
    require(wSum <= BigInt(Long.MaxValue),
      s"Σ tap weights = $wSum for horizon=$horizon γ=$gammaNum/2^" +
        s"$gammaLog2Den overflows a long — shorten the horizon or use a " +
        "smaller gammaLog2Den")
    Seq("step", "return_scaled", "return_x").foreach(c =>
      require(!events.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column — drop or rename it before " +
          "computing returns (the name is this operator's output)"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    // |r| ≤ bound ⇒ |Σ r_{t+j}·w_j| ≤ bound·Σw ≤ Long.MaxValue: the one
    // per-row check that makes every product and the sum overflow-free.
    // Spelled r > bound || r < -bound, not abs(r) > bound: abs(Long.Min)
    // itself overflows (throws a confusing ANSI error, silently passes
    // non-ANSI)
    val bound = (BigInt(Long.MaxValue) / wSum).toLong
    val r0 = col(rewardCol).cast("long")
    val r = when(r0 > lit(bound) || r0 < lit(-bound),
      raise_error(concat(
        lit(s"discountedReturns overflow: |$rewardCol| = "),
        r0.cast("string"),
        lit(s" exceeds $bound = Long.MaxValue / Σ weights for horizon=" +
          s"$horizon γ=$gammaNum/2^$gammaLog2Den — scale rewards down " +
          "or shorten the horizon"))).cast("long"))
      .otherwise(r0)
    val scaled = (0 until horizon).map(j =>
      coalesce(lead(r, j).over(w), lit(0L)) *
        lit(weights(j).toLong)).reduce(_ + _)
    events
      .withColumn("step", row_number().over(w).cast("long"))
      .withColumn("return_scaled", scaled)
      .withColumn("return_x",
        col("return_scaled").cast("double") /
          lit(math.pow(2.0, (gammaLog2Den * (horizon - 1)).toDouble)))
  }
}
