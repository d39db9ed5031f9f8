package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event log.
  *
  * Scale shape: both operators are built from UNBOUNDED windows / aggregates
  * over the SAME key partitioning, so each costs exactly one key shuffle
  * (the rollup that follows arrives pre-partitioned); no self-joins, no
  * per-stage passes over the event stream. At 100 TB the cost is one
  * exchange of the events table on the entity key — the minimum any
  * per-entity sequence analysis can do.
  */
object Funnel {

  /** Earliest reach time per funnel stage, per key.
    *
    * Stage semantics: stage i is reached at the minimum event time of a
    * stage-i event at-or-after stage i-1's reach time (greedy-earliest,
    * which is optimal for "did the key progress through the ordered
    * stages"). Ties at the exact same timestamp count for the next stage
    * (`>=`), making the result a pure function of the (ts, stage)
    * multiset — independent of row order, partitioning, and tie-order,
    * hence engine-portable.
    *
    * Output: key, `stage_1_ts .. stage_k_ts` (NULL once the funnel is
    * abandoned — later stages of a missing stage are NULL by construction),
    * `depth` = furthest stage reached.
    *
    * Plan: k conditional unbounded-window mins over one `partitionBy(key)`
    * exchange (no ORDER BY ⇒ no sort), then a key rollup that reuses the
    * same partitioning — one shuffle total.
    */
  def funnelStages(df: DataFrame, keyCol: String, tsCol: String,
      stageCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnelStages needs at least one stage")
    val w = Window.partitionBy(col(keyCol))
    var cur = df.select(col(keyCol), col(tsCol), col(stageCol))
    var prevReach: Option[Column] = None
    stages.zipWithIndex.foreach { case (st, i) =>
      val qualifies = prevReach match {
        case None => col(stageCol) === lit(st)
        case Some(p) => col(stageCol) === lit(st) && col(tsCol) >= p
      }
      val name = s"stage_${i + 1}_ts"
      cur = cur.withColumn(name, min(when(qualifies, col(tsCol))).over(w))
      prevReach = Some(col(name))
    }
    val stageCols = stages.indices.map(i => s"stage_${i + 1}_ts")
    // fold ascending so the DEEPEST reached stage ends up outermost
    val depth = stages.indices
      .foldLeft(lit(0L)) { (acc, i) =>
        when(col(s"stage_${i + 1}_ts").isNotNull, lit((i + 1).toLong)).otherwise(acc)
      }
    // same key partitioning as the windows -> no second exchange
    cur.groupBy(col(keyCol))
      .agg(min(col(stageCols.head)).as(stageCols.head),
        stageCols.tail.map(c => min(col(c)).as(c)): _*)
      .withColumn("depth", depth)
  }

  /** Funnel conversion rollup: number of keys that reached each stage
    * (depth >= i). Tiny result — one extra aggregation over
    * [[funnelStages]]'s output. */
  def funnelCounts(df: DataFrame, keyCol: String, tsCol: String,
      stageCol: String, stages: Seq[String]): DataFrame = {
    val st = funnelStages(df, keyCol, tsCol, stageCol, stages)
    st.agg(
      count(lit(1)).as("n_keys"),
      stages.indices.map(i =>
        sum(when(col(s"stage_${i + 1}_ts").isNotNull, 1L).otherwise(0L))
          .as(s"reached_${i + 1}")): _*)
  }

  /** Cohort retention: keys bucketed by their first-activity day, counted
    * by (cohort day, day offset) of each later active day.
    *
    * `dayCol` must be an integral "day number" column (e.g. epoch days) so
    * the arithmetic is engine-exact. Output: `cohort_day`, `day_offset`
    * (0 = the cohort day itself), `n_keys` = DISTINCT keys from that cohort
    * active that day.
    *
    * Plan: unbounded-window min over `partitionBy(key)` (one shuffle, no
    * sort), distinct-by-construction rollup on (cohort, offset, key) then
    * (cohort, offset) — the distinct pass is the second, unavoidable
    * exchange (it regroups by a different key).
    */
  def cohortRetention(df: DataFrame, keyCol: String, dayCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    df.select(col(keyCol), col(dayCol))
      .withColumn("cohort_day", min(col(dayCol)).over(w))
      .withColumn("day_offset", col(dayCol) - col("cohort_day"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col(keyCol)).as("n_keys"))
  }
}
