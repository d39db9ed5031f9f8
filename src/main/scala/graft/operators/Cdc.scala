package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture snapshot diff: classify every key of two table
  * snapshots as insert / delete / update / unchanged and name the changed
  * columns — the row-level view of the comparison the per-column stats
  * aggregate (reference `spark.py` intersect_rows + `_all_mismatch`,
  * see SparkCompare) summarizes.
  *
  * Scale shape: ONE null-safe full-outer shuffle join on the keys — the same
  * single-exchange plan as the compare core — then pure column algebra for
  * the classification (no per-column jobs, no second pass). The changed-set
  * is built with `concat_ws` over per-column `when` expressions, all inside
  * whole-stage codegen. At 100 TB this is exactly the snapshot-diff plan a
  * warehouse CDC job wants: cost = one co-partitioned join of the two
  * snapshots; pre-bucketed snapshots (sources/Bucketing) make it
  * exchange-free.
  */
object Cdc {

  /** Row-level diff of `oldDf` → `newDf` on `keys`.
    *
    * Output: the key columns (coalesced across sides), `change_type`
    * ('insert' | 'delete' | 'update' | 'unchanged'), `changed_cols` (the
    * comparison columns that differ, name-sorted, comma-joined; empty
    * unless an update) and `n_changed`. A column "differs" by null-safe
    * equality — NULL→value and value→NULL transitions are changes,
    * NULL→NULL is not.
    *
    * @param compareCols columns to diff; defaults to the non-key columns
    *                    present on BOTH sides (name-sorted).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val cols =
      if (compareCols.nonEmpty) compareCols
      else (oldDf.columns.toSet intersect newDf.columns.toSet)
        .diff(keys.toSet).toSeq.sorted
    val l = oldDf
      .select((keys ++ cols).map(c => col(c).as(s"a_$c")) :+ lit(true).as("__in1"): _*)
    val r = newDf
      .select((keys ++ cols).map(c => col(c).as(s"b_$c")) :+ lit(true).as("__in2"): _*)
    val cond = keys.map(k => col(s"a_$k") <=> col(s"b_$k")).reduce(_ && _)
    val j = l.join(r, cond, "full_outer")

    val changed: Seq[Column] = cols.map(c =>
      when(!(col(s"a_$c") <=> col(s"b_$c")), lit(c)))
    val nChanged = cols.map(c =>
      when(!(col(s"a_$c") <=> col(s"b_$c")), lit(1L)).otherwise(lit(0L)))
      .reduceOption(_ + _).getOrElse(lit(0L))
    val anyChanged = cols.map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    val changeType =
      when(col("__in1").isNull, lit("insert"))
        .when(col("__in2").isNull, lit("delete"))
        .when(anyChanged, lit("update"))
        .otherwise(lit("unchanged"))

    j.select(
      keys.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) ++ Seq(
        changeType.as("change_type"),
        when(col("__in1").isNotNull && col("__in2").isNotNull,
          concat_ws(",", changed: _*)).otherwise(lit("")).as("changed_cols"),
        when(col("__in1").isNotNull && col("__in2").isNotNull, nChanged)
          .otherwise(lit(0L)).as("n_changed")): _*)
  }

  /** [[snapshotDiff]] without the unchanged rows — the CDC event stream a
    * downstream consumer applies. Same single-join plan; the filter is a
    * post-join predicate on already-computed columns. */
  def changes(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame =
    snapshotDiff(oldDf, newDf, keys, compareCols)
      .where(col("change_type") =!= "unchanged")

  /** The applyable changeset: like [[changes]] but each insert/update row
    * carries the NEW values of `valueCols` (deletes carry keys only,
    * values null) — the payload a downstream [[applyChanges]] consumer
    * needs. Same single null-safe full-outer join as [[snapshotDiff]]. */
  def changesWithValues(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changesWithValues needs at least one key column")
    val l = oldDf
      .select((keys ++ valueCols).map(c => col(c).as(s"a_$c")) :+ lit(true).as("__in1"): _*)
    val r = newDf
      .select((keys ++ valueCols).map(c => col(c).as(s"b_$c")) :+ lit(true).as("__in2"): _*)
    val cond = keys.map(k => col(s"a_$k") <=> col(s"b_$k")).reduce(_ && _)
    val anyChanged = valueCols.map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val changeType =
      when(col("__in1").isNull, lit("insert"))
        .when(col("__in2").isNull, lit("delete"))
        .when(anyChanged, lit("update"))
        .otherwise(lit("unchanged"))
    l.join(r, cond, "full_outer")
      .withColumn("change_type", changeType)
      .where(col("change_type") =!= "unchanged")
      .select(
        keys.map(k => coalesce(col(s"a_$k"), col(s"b_$k")).as(k)) ++
          Seq(col("change_type")) ++
          valueCols.map(c => col(s"b_$c").as(c)): _*)
  }

  /** Apply a [[changesWithValues]] changeset to a snapshot: untouched rows
    * pass through an anti join on the changed keys; insert/update rows
    * come from the changeset's new values. The invariant
    * `applyChanges(A, changesWithValues(A, B)) ≡ B` is what makes a CDC
    * pipeline verifiable end-to-end (and is how the driver query is
    * oracle-checked).
    *
    * Scale shape: one key-hash join (the changeset side is usually a tiny
    * fraction of the snapshot — AQE broadcasts it when small) plus a
    * union; no windows, no global sorts. */
  def applyChanges(snapshot: DataFrame, changeset: DataFrame,
      keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    val outCols = (keys ++ valueCols).map(col)
    snapshot
      .join(changeset.select(keys.map(col): _*), keys, "left_anti")
      .select(outCols: _*)
      .unionByName(
        changeset.where(col("change_type").isin("insert", "update"))
          .select(outCols: _*))
  }

  /** Incrementally maintain a materialized JOIN view under CDC deltas on
    * both base tables — the "delete-and-reinsert by affected key" strategy
    * production incremental pipelines use, which stays correct under
    * inserts, updates AND deletes (unlike the textbook
    * `ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB` algebra, which only covers monotone inserts):
    *
    *   1. the affected-key set K = join keys touched by either changeset;
    *   2. view rows whose key ∉ K pass through untouched (one anti join
    *      against the broadcast key set — the full view is scanned once,
    *      never rejoined);
    *   3. the view is recomputed ONLY for K, from delta-restricted slices
    *      of the new base snapshots (two broadcast semi joins + the
    *      caller's own join projection on those slices).
    *
    * Cost is O(view + |K|-slice), independent of the base tables' total
    * size — the property that makes a 100 TB materialized view affordable
    * to keep fresh when deltas are small. The invariant
    * `maintainJoinView(...) ≡ project(a1, b1)` is exactly how
    * q_cdc_join_view is oracle-checked: the incremental plan must
    * reproduce the direct rejoin bit-for-bit.
    *
    * @param view0   the materialized `project(a0, b0)`, containing `aKey`
    * @param dA, dB  [[changes]] frames for a0→a1 / b0→b1 (any shape with
    *                the respective join-key column — only keys are read)
    * @param project builds the view from (a-side, b-side) — applied here
    *                only to the K-restricted slices
    */
  def maintainJoinView(
      view0: DataFrame, a1: DataFrame, b1: DataFrame,
      dA: DataFrame, dB: DataFrame, aKey: String, bKey: String)(
      project: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val touched = dA.select(col(aKey))
      .unionByName(dB.select(col(bKey).as(aKey)))
      .distinct()
    val untouched = view0.join(broadcast(touched), Seq(aKey), "left_anti")
    val aSlice = a1.join(broadcast(touched), Seq(aKey), "left_semi")
    val bSlice = b1.join(
      broadcast(touched.select(col(aKey).as(bKey))), Seq(bKey), "left_semi")
    untouched.unionByName(project(aSlice, bSlice))
  }

  /** SCD Type-2 interval build — turn a keyed, timestamped VERSION HISTORY
    * into validity intervals, the slowly-changing-dimension shape every
    * warehouse load job maintains: each version is valid from its own
    * timestamp until the next version of the same key (NULL `valid_to` =
    * the current version, flagged `is_current`). Joining a fact row at
    * time t then selects the version with valid_from ≤ t < valid_to —
    * the [[AsOf]] join's natural dimension-side layout.
    *
    * Scale shape: ONE window partitioned by the KEY — per-entity history
    * is small by construction (versions of one entity), so parallelism is
    * per-key and no task ever sorts more than one key's versions. Ties on
    * the timestamp break by `tieCol`, making intervals deterministic
    * under same-timestamp updates (the earlier tie gets a zero-length
    * interval rather than a nondeterministic order). */
  def scd2Intervals(history: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String): DataFrame = {
    require(keyCols.nonEmpty, "scd2Intervals needs at least one key column")
    Seq("valid_from", "valid_to", "is_current").foreach { c =>
      require(!history.columns.exists(_.equalsIgnoreCase(c)),
        s"scd2Intervals emits column '$c'; the history frame already has it — rename or drop it first")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    history
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
