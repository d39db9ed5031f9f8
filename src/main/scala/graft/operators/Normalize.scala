package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-wise feature normalization — the scaling pass feature pipelines
  * run before training. One aggregation computes each group's exact
  * decimal moments (count, Σx, Σx² — order-independent, engine-exact),
  * the tiny per-group stats table broadcast-joins back, and the scaled
  * value is a fixed double-arithmetic sequence over those exact sums, so
  * results are bit-reproducible across engines, runs, and partitionings.
  * No window functions: the stats side is |groups| rows, the join is a
  * broadcast, and the scan stays embarrassingly parallel.
  */
object Normalize {

  /** Attach a population z-score per group: z = (x − mean) / stddev,
    * where mean = Σx/n and stddev = sqrt(max(Σx²/n − mean², 0)) — all
    * four double operations in that fixed order over DECIMAL-exact sums.
    * Groups with zero variance (or a single row) emit NULL. NULL values
    * pass through with a NULL score. */
  def zscoreByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String = "z"): DataFrame = {
    require(groupCols.nonEmpty, "zscoreByGroup needs at least one group column")
    val v = col(valueCol).cast("decimal(18,6)")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(
        count(v).as("_graft_n"),
        sum(v).cast("double").as("_graft_sum"),
        sum(v * v).cast("double").as("_graft_sumsq"))
    val mean = col("_graft_sum") / col("_graft_n").cast("double")
    val variance = greatest(
      col("_graft_sumsq") / col("_graft_n").cast("double") - mean * mean,
      lit(0.0))
    val std = sqrt(variance)
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(outCol,
        when(std > 0.0, (col(valueCol).cast("double") - mean) / std))
      .drop("_graft_n", "_graft_sum", "_graft_sumsq")
  }

  /** Attach a percent-rank (quantile) normalization per group:
    * (rank − 1) / (n − 1) in [0, 1], ties sharing a rank — the
    * distribution-free scaling that is robust to outliers where z-score
    * and min-max are not. Single-row groups emit 0.
    *
    * This one IS a window (rank needs a per-group sort): one key shuffle +
    * per-partition sort — the minimum for any rank statistic. The result
    * is a pure function of the value multiset (tie rows share ranks), so
    * it is deterministic and engine-portable: both engines define
    * percent_rank as the same integer division evaluated in double. */
  def percentRankByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String = "pr"): DataFrame = {
    require(groupCols.nonEmpty, "percentRankByGroup needs at least one group column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col(valueCol))
    df.withColumn(outCol, percent_rank().over(w))
  }

  /** Attach a min-max scaled value per group: (x − min) / (max − min) in
    * [0, 1]; constant groups emit NULL. Same one-agg + broadcast shape. */
  def minMaxByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String = "scaled"): DataFrame = {
    require(groupCols.nonEmpty, "minMaxByGroup needs at least one group column")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).cast("double").as("_graft_min"),
        max(col(valueCol)).cast("double").as("_graft_max"))
    val span = col("_graft_max") - col("_graft_min")
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(outCol,
        when(span > 0.0,
          (col(valueCol).cast("double") - col("_graft_min")) / span))
      .drop("_graft_min", "_graft_max")
  }

  /** Winsorize per group: clip values to the exact [pLo, pHi] order-
    * statistic boundaries (ANSI `percentile_disc` — "smallest value whose
    * cumulative distribution reaches p"). Clipping is pure comparison —
    * no arithmetic on the value — so the output is bit-identical across
    * engines, unlike interpolated-percentile clips.
    *
    * Scale shape: ONE per-group sort-based aggregation for both boundaries
    * (the `approx_percentile` switch is the 100 TB path, same trade as the
    * numeric profile), boundaries broadcast back onto the rows. */
  def winsorizeByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      pLo: Double,
      pHi: Double,
      outCol: String = "clipped"): DataFrame = {
    require(groupCols.nonEmpty, "winsorizeByGroup needs at least one group column")
    require(0.0 <= pLo && pLo <= pHi && pHi <= 1.0, s"bad percentiles: $pLo/$pHi")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(
        expr(s"percentile_disc($pLo) WITHIN GROUP (ORDER BY CAST(`$valueCol` AS DOUBLE))")
          .as("_graft_lo"),
        expr(s"percentile_disc($pHi) WITHIN GROUP (ORDER BY CAST(`$valueCol` AS DOUBLE))")
          .as("_graft_hi"))
    // NULL guard: greatest/least skip NULLs, which would silently clip a
    // missing value to the lower boundary — a NULL input stays NULL.
    df.join(broadcast(stats), groupCols, "left")
      .withColumn(outCol,
        when(col(valueCol).isNotNull,
          least(greatest(col(valueCol).cast("double"), col("_graft_lo")),
            col("_graft_hi"))))
      .drop("_graft_lo", "_graft_hi")
  }
}
