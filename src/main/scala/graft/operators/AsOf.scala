package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — pandas `merge_asof` semantics, the operator
  * every ML-feature and event-attribution pipeline needs and Spark lacks
  * natively. For each left row, attach the single right row with the same
  * key whose timestamp is the greatest one at-or-before the left row's
  * timestamp (direction = backward; forward is the mirror image), optionally
  * bounded by a tolerance.
  *
  * Scale design: NOT a join. A range/inequality join either explodes the
  * build side (every left row pairs with every candidate right row before
  * the per-row argmax) or falls back to a broadcast-nested-loop. Instead:
  * union the two sides tagged, ONE hash shuffle on the key, an in-partition
  * sort by (ts, side, tiebreak), and a running `last(payload, ignoreNulls)`
  * window to forward-fill the most recent right payload onto each left row.
  * Cost is one shuffle + one sort-pass — the same partitioning a plain
  * equi-join would need, with zero row duplication, and skew is bounded by
  * key cardinality exactly like the equivalent streaming state.
  *
  * Determinism: when several right rows share (key, ts), the greatest
  * `tieCol` wins — they sort tie-ascending and the running `last` lands on
  * the final one — so results are stable across partitionings and engines.
  */
object AsOf {

  /** Backward as-of join: the latest right row at-or-before each left row.
    *
    * @param left      probe side; all its columns survive
    * @param right     reference side
    * @param keyCols   equi-key columns (same names on both sides)
    * @param tsCol     event-time column name (same name on both sides; any
    *                  orderable type — timestamp, timestamp_ntz, long)
    * @param payload   right-side columns to attach (emitted as
    *                  `asof_<name>`, plus `asof_<tsCol>` for the matched ts)
    * @param tieCol    right-side column breaking (key, ts) ties (max wins)
    * @param tolerance max allowed |left.ts − right.ts| as a Column
    *                  (interval/number matching tsCol's domain; None = ∞)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payload: Seq[String],
      tieCol: String,
      tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, keyCols, tsCol, payload, tieCol, tolerance,
      forward = false)

  /** Forward as-of join: the earliest right row at-or-after each left row.
    * Mirror image — the union is walked in descending ts order, so the
    * running fill holds the nearest at-or-after right row. */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payload: Seq[String],
      tieCol: String,
      tolerance: Option[Column] = None): DataFrame =
    asofImpl(left, right, keyCols, tsCol, payload, tieCol, tolerance,
      forward = true)

  /** Nearest as-of join: whichever of the backward / forward candidates is
    * closer in time wins; exact ties in distance go backward (pandas
    * `merge_asof(direction='nearest')`). Still ONE shuffle: both fills run
    * over the same (key, ts)-sorted partitions — the backward fill as a
    * running `last` behind the row, the forward fill as a `first` ahead of
    * it — two frames in the same Window sort, no second exchange.
    * Tie rule within equal right timestamps: backward keeps the max
    * `tieCol`, forward the min (each side's nearest in its scan
    * direction); `tolerance` bounds each side before the pick. */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payload: Seq[String],
      tieCol: String,
      tolerance: Option[Column] = None): DataFrame = {
    val (unioned, leftCols) = buildUnion(left, right, keyCols, tsCol, payload, tieCol)
    val base = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(sideCol).asc, col(tieOut).asc_nulls_first)
    val bwdW = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwdW = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned
      .withColumn("_graft_bwd", last(col(payloadCol), ignoreNulls = true).over(bwdW))
      .withColumn("_graft_fwd", first(col(payloadCol), ignoreNulls = true).over(fwdW))
      .where(col(sideCol) === 1)
    def bounded(c: Column, gap: Column): Column = tolerance match {
      case Some(tol) => when(c.isNotNull && gap <= tol, c)
      case None => c
    }
    val bwd = bounded(col("_graft_bwd"),
      col(tsCol) - col(s"_graft_bwd.$tsCol"))
    val fwd = bounded(col("_graft_fwd"),
      col(s"_graft_fwd.$tsCol") - col(tsCol))
    val picked = filled
      .withColumn("_graft_b", bwd)
      .withColumn("_graft_f", fwd)
      .withColumn(payloadCol,
        when(col("_graft_b").isNull, col("_graft_f"))
          .when(col("_graft_f").isNull, col("_graft_b"))
          // distances are non-negative by construction; tie → backward
          .when(col(tsCol) - col(s"_graft_b.$tsCol")
            <= col(s"_graft_f.$tsCol") - col(tsCol), col("_graft_b"))
          .otherwise(col("_graft_f")))
    attach(picked, leftCols, tsCol, payload)
  }

  private val sideCol = "_graft_asof_side"
  private val payloadCol = "_graft_asof_payload"
  private val tieOut = "_graft_asof_tie"

  /** Tag and union the two sides: right rows carry (ts, payload) packed in
    * one struct; left rows carry nulls there and their own columns. */
  private def buildUnion(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payload: Seq[String],
      tieCol: String): (DataFrame, Seq[String]) = {
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol),
        lit(0).as(sideCol),
        col(tieCol).as(tieOut),
        struct(col(tsCol).as(tsCol) +: payload.map(c => col(c).as(c)): _*)
          .as(payloadCol)): _*)
    val leftCols = left.columns.toSeq
    val l = left.select(
      leftCols.map(col) ++ Seq(
        lit(1).as(sideCol),
        lit(null).cast(r.schema(tieOut).dataType).as(tieOut),
        lit(null).cast(r.schema(payloadCol).dataType).as(payloadCol)): _*)
    // align schemas: right side carries nulls for the non-key left columns
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (r.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    (l.unionByName(rAligned), leftCols)
  }

  private def attach(
      df: DataFrame, leftCols: Seq[String], tsCol: String,
      payload: Seq[String]): DataFrame = {
    val attached = (tsCol +: payload).foldLeft(df) { (d, c) =>
      d.withColumn(s"asof_$c", col(s"$payloadCol.$c"))
    }
    attached.select(
      (leftCols ++ (tsCol +: payload).map(c => s"asof_$c")).map(col): _*)
  }

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      payload: Seq[String],
      tieCol: String,
      tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    val (unioned, leftCols) = buildUnion(left, right, keyCols, tsCol, payload, tieCol)
    // right rows (side=0) sort before left rows at equal ts, so the match is
    // inclusive; among tied right rows the max tieCol is last in order and
    // wins the running fill
    val tsOrder = if (forward) col(tsCol).desc else col(tsCol).asc
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col(sideCol).asc, col(tieOut).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn(payloadCol, last(col(payloadCol), ignoreNulls = true).over(w))
      .where(col(sideCol) === 1)
    val withinTol = tolerance match {
      case Some(tol) =>
        val gap =
          if (forward) col(s"$payloadCol.$tsCol") - col(tsCol)
          else col(tsCol) - col(s"$payloadCol.$tsCol")
        filled.withColumn(payloadCol,
          when(col(payloadCol).isNotNull && gap <= tol, col(payloadCol)))
      case None => filled
    }
    attach(withinTol, leftCols, tsCol, payload)
  }
}
