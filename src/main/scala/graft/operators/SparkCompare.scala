package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.functions.{CompareOpts, ComparatorPipeline, TypeClasses}

/** Compare two DataFrames joined on null-safe keys, producing unique-row
  * slices, per-column match statistics, mismatch samples, and reports.
  *
  * Semantics follow the reference (datacompy/spark.py:86-990) exactly;
  * the *plans* are redesigned Spark-first for scale:
  *
  *   - ONE native full outer join on `<=>` key conjunction
  *     (reference builds it via temp views + SQL strings, spark.py:450-466).
  *   - Duplicate-key pairing rank computed with a single window over each
  *     input (reference does monotonic-id + self-join, spark.py:388-412, and
  *     two extra null/sentinel probe jobs per input, spark.py:1136-1147 —
  *     Spark's window partitioning already groups NULL keys together, so the
  *     string-cast/sentinel dance is unnecessary).
  *   - ALL statistics — per-column match counts, null diffs, max diffs, the
  *     all-columns-match row count, AND the merge-slice counts — are fused
  *     into one single-pass aggregation over the cached join (reference runs
  *     one agg for match counts, spark.py:573-578, plus TWO separate jobs
  *     per column for max_diff/null_diff, spark.py:1026-1111, another
  *     full-scan filter for count_matching_rows, spark.py:659-679, and
  *     per-slice counts, spark.py:524-531 — O(columns) scans).
  *   - Because the join sides are unique on (keys ++ rank), the outer join is
  *     1:1 and `left_only = count(df1) - count(intersect)` — unique-row counts
  *     cost no extra scan at all (reference counts each slice,
  *     spark.py:524-531).
  *   - Every count is memoized; nothing is ever recounted.
  *
  * At 100 TB the dominant costs are the two input scans (key-group shape
  * check), the join shuffle, and the one stats pass over the cached
  * intersection — all O(data), none O(columns × data).
  */
class SparkCompare(
    val spark: SparkSession,
    df1Input: DataFrame,
    df2Input: DataFrame,
    val config: CompareConfig,
    parent: Option[SparkCompare] = None) {

  val joinColumns: Seq[String] = config.normalizedJoinColumns
  private val joinSet = joinColumns.toSet
  private val n1 = config.df1Name
  private val n2 = config.df2Name

  /** Normalised inputs (lowercased names, validated). Reference:
    * datacompy/spark.py:273-332. */
  val df1: DataFrame = normalize(df1Input, n1)
  val df2: DataFrame = normalize(df2Input, n2)

  private def normalize(df: DataFrame, which: String): DataFrame = {
    val named =
      if (config.castColumnNamesLower) df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)
      else df
    val cols = named.columns
    val dups = cols.groupBy(identity).collect { case (c, a) if a.length > 1 => c }
    require(dups.isEmpty,
      s"$which has duplicate column names after normalization: ${dups.mkString(", ")}")
    val missing = joinColumns.filterNot(cols.contains)
    require(missing.isEmpty, s"$which is missing join columns: ${missing.mkString(", ")}")
    named
  }

  // Per-column tolerance keys must name a real column — a typo'd key would
  // otherwise silently compare at the default tolerance
  // (reference: datacompy/base.py:758-829 rejects malformed tolerance dicts).
  locally {
    val known = (df1.columns ++ df2.columns).map(_.toLowerCase).toSet
    for ((spec, name) <- Seq((config.absTol, "abs_tol"), (config.relTol, "rel_tol"));
        k <- spec.perColumn.keys if !known.contains(k))
      throw new IllegalArgumentException(
        s"$name has a tolerance for column '$k', which exists in neither DataFrame")
  }

  // ---- column sets (ordered, driver-side; reference spark.py:365-375) ----
  def df1UnqColumns: Seq[String] = df1.columns.toSeq.diff(df2.columns.toSeq)
  def df2UnqColumns: Seq[String] = df2.columns.toSeq.diff(df1.columns.toSeq)
  def intersectColumns: Seq[String] = df1.columns.toSeq.intersect(df2.columns.toSeq)
  def allColumnsMatch: Boolean = df1UnqColumns.isEmpty && df2UnqColumns.isEmpty
  /** Reference: datacompy/base.py:463-465. */
  def onlyJoinColumns: Boolean =
    df1UnqColumns.isEmpty && df2UnqColumns.isEmpty && intersectColumns.toSet == joinSet
  private val compareColumns: Seq[String] = intersectColumns.filterNot(joinSet)

  import SparkCompare.{Merged, Shape}

  // ---- shape probe: row count, key-group count, and null-key presence for
  // BOTH inputs in ONE job (each input projects to just its join columns +
  // a side tag before the union, so the probe shuffle carries keys only) ----
  private lazy val shapes: (Shape, Shape) = parent.map(_.shapes).getOrElse {
    val anyKeyNull = joinColumns.map(col(_).isNull).reduce(_ || _)
    def side(df: DataFrame, tag: Int) =
      df.select(lit(tag).as("__graft_side") +: joinColumns.map(col): _*)
    val rows = side(df1, 0).unionByName(side(df2, 1))
      .groupBy(col("__graft_side") +: joinColumns.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"),
        // the keys ARE the group, so the null flag is constant per group
        max(when(anyKeyNull, 1).otherwise(0)).as("__graft_null"))
      .groupBy("__graft_side")
      .agg(
        count(lit(1)),
        coalesce(sum("__graft_n"), lit(0L)),
        coalesce(sum(when(col("__graft_null") === 1, col("__graft_n")).otherwise(0L)), lit(0L)))
      .collect()
      .map(r => r.getInt(0) -> Shape(r.getLong(2), r.getLong(1), r.getLong(3)))
      .toMap
    (rows.getOrElse(0, Shape(0, 0, 0)), rows.getOrElse(1, Shape(0, 0, 0)))
  }
  private lazy val df1Shape: Shape = shapes._1
  private lazy val df2Shape: Shape = shapes._2
  /** True when the caller's assume-hints answer every planning question
    * (duplicate presence AND key nullability), making the probe scan
    * unnecessary; row counts then come from slice arithmetic over the
    * cached join — `assumeKeysUnique = Some(false)` is as probe-free as
    * `Some(true)`, it just keeps the pairing-rank windows (harmless when
    * data turns out unique: every rank is 0). */
  private def probeFree: Boolean =
    config.assumeKeysUnique.isDefined && config.assumeKeysNullFree.isDefined
  lazy val df1Count: Long =
    if (probeFree) sliceCounts._1 + sliceCounts._2 else df1Shape.rowCount
  lazy val df2Count: Long =
    if (probeFree) sliceCounts._1 + sliceCounts._3 else df2Shape.rowCount
  lazy val anyDupes: Boolean =
    config.assumeKeysUnique.map(!_)
      .getOrElse(df1Shape.hasDupes || df2Shape.hasDupes)

  private val ordCol: String = Utils.tempColumnName(df1, df2)

  /** Rank within duplicate key groups so the k-th duplicate on one side pairs
    * with the k-th on the other (reference: spark.py:388-413, 1114-1170).
    * NULL keys form their own window partition, matching the reference's
    * fillna-sentinel behaviour. Ordering by `monotonically_increasing_id`
    * preserves the physical row order per partition, like the reference;
    * pairing across frames is deterministic only for deterministic layouts
    * (documented reference behaviour). */
  private def withPairingRank(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(joinColumns.map(col): _*).orderBy(monotonically_increasing_id())
    df.withColumn(ordCol, row_number().over(w) - 1)
  }

  private val leftFlag = "_merge_left"
  private val rightFlag = "_merge_right"

  private lazy val merged: Merged = parent.map(_.merged).getOrElse {
    var d1 = df1
    var d2 = df2
    var tempJoin = joinColumns
    if (anyDupes) {
      d1 = withPairingRank(d1)
      d2 = withPairingRank(d2)
      tempJoin = joinColumns :+ ordCol
    }
    if (config.ignoreSpaces) {
      for (c <- joinColumns) {
        if (TypeClasses.isStringLike(d1.schema(c).dataType)) d1 = d1.withColumn(c, trim(col(c)))
        if (TypeClasses.isStringLike(d2.schema(c).dataType)) d2 = d2.withColumn(c, trim(col(c)))
      }
    }
    // Suffix every column, add the merge-indicator flags (spark.py:429-448).
    val s1 = d1.select(d1.columns.map(c => col(c).as(s"${c}_$n1")).toIndexedSeq :+
      lit(true).as(leftFlag): _*)
    val s2 = d2.select(d2.columns.map(c => col(c).as(s"${c}_$n2")).toIndexedSeq :+
      lit(true).as(rightFlag): _*)
    // Null-safe equality on each key — but when the key data contains no
    // NULLs (known from the shape probe, no extra job) or the schema proves
    // non-nullability, plain `===` is semantically identical and plans
    // better: `<=>` makes the join partition on (coalesce(k), isnull(k))
    // tuples, which defeats exchange reuse with the pairing-rank window
    // (partitioned on the raw keys) and costs a second full shuffle of both
    // inputs. Parquet schemas mark everything nullable, so the data-driven
    // signal is the one that usually fires.
    val noNullKeys = config.assumeKeysNullFree
      .getOrElse(df1Shape.nullKeyRows == 0 && df2Shape.nullKeyRows == 0)
    val cond = tempJoin.map { k =>
      val nonNullable = k == ordCol ||
        (!d1.schema(k).nullable && !d2.schema(k).nullable)
      if (nonNullable || noNullKeys) col(s"${k}_$n1") === col(s"${k}_$n2")
      else col(s"${k}_$n1") <=> col(s"${k}_$n2")
    }.reduce(_ && _)
    val joined = s1.join(s2, cond, "full_outer")
    // Merge indicator from the lit(true) flags (spark.py:468-484).
    val withMerge = joined.withColumn(
      "_merge",
      when(col(leftFlag) === true && col(rightFlag).isNull, "left_only")
        .when(col(leftFlag).isNull && col(rightFlag) === true, "right_only")
        .otherwise("both"))
    val dropOrd =
      if (anyDupes) Seq(s"${ordCol}_$n1", s"${ordCol}_$n2") else Nil
    Merged(withMerge.drop(dropOrd: _*), tempJoin)
  }

  /** The merged outer join, persisted when cacheIntermediates: every derived
    * table (intersection, both unique-row slices) and every count reads this
    * one relation, so one materialization serves the whole comparison.
    * (The reference caches only intersect_rows, spark.py:532-535 — its
    * unique-row slices re-run the join per action.) Shared by reference
    * with tolerance variants. */
  private lazy val mergedCached: DataFrame = parent.map(_.mergedCached).getOrElse {
    if (config.cacheIntermediates)
      merged.outerJoin.persist(StorageLevel.MEMORY_AND_DISK)
    else merged.outerJoin
  }

  /** left_only / right_only / both counts, folded into the single stats
    * pass ([[statsRow]] aggregates the whole cached join with `_merge`
    * guards). Because the join sides are unique on (keys ++ rank), the
    * outer join is 1:1 and these slice counts reconstruct the input row
    * counts with no input re-scan. */
  private lazy val sliceCounts: (Long, Long, Long) = parent.map(_.sliceCounts).getOrElse(
    (statLong("__graft_cnt"), statLong("__graft_left"), statLong("__graft_right")))

  // ---- sensitive-column masking (reference: spark.py:224-271) ----
  // The reference destructively overwrites the derived frames and must re-run
  // the whole comparison on reveal; here the mask is an overlay projection on
  // the accessors, so reveal is free and statistics stay computed on real
  // values either way.
  private var maskedColumns: Set[String] = Set.empty

  def sensitiveColumns: Seq[String] = maskedColumns.toSeq.sorted

  def hideSensitiveColumns(columns: Seq[String]): Unit = {
    if (maskedColumns.nonEmpty)
      throw new IllegalStateException(
        "sensitive columns are already hidden, call revealSensitiveColumns() first")
    val normalized =
      if (config.castColumnNamesLower) columns.map(_.toLowerCase) else columns
    val dups = normalized.groupBy(identity).collect { case (c, a) if a.length > 1 => c }
    require(dups.isEmpty, s"duplicate columns: ${dups.mkString(", ")}")
    maskedColumns = normalized.toSet
  }

  def revealSensitiveColumns(): Unit = maskedColumns = Set.empty

  private val MaskValue = "*******"

  /** Overlay projection replacing masked columns with the mask literal while
    * preserving column order; identity when nothing is masked. */
  private def applyMask(df: DataFrame, maskNames: Set[String]): DataFrame =
    if (maskedColumns.isEmpty || !df.columns.exists(maskNames)) df
    else df.select(df.columns.map { c =>
      if (maskNames(c)) lit(MaskValue).as(c) else col(c)
    }.toIndexedSeq: _*)

  private def suffixedMaskNames: Set[String] =
    maskedColumns | maskedColumns.map(c => s"${c}_$n1") | maskedColumns.map(c => s"${c}_$n2")

  /** Rows only in df1, with df1's original columns and names (spark.py:510-516). */
  def df1UnqRows: DataFrame = applyMask(df1UnqRowsBase, maskedColumns)
  private lazy val df1UnqRowsBase: DataFrame =
    mergedCached
      .filter(col("_merge") === "left_only")
      .select(df1.columns.map(c => col(s"${c}_$n1").as(c)).toIndexedSeq: _*)

  /** Rows only in df2 (spark.py:518-524). */
  def df2UnqRows: DataFrame = applyMask(df2UnqRowsBase, maskedColumns)
  private lazy val df2UnqRowsBase: DataFrame =
    mergedCached
      .filter(col("_merge") === "right_only")
      .select(df2.columns.map(c => col(s"${c}_$n2").as(c)).toIndexedSeq: _*)

  /** Intersection with match columns, mask-aware (suffixed names). */
  def intersectRows: DataFrame = applyMask(intersectRowsBase, suffixedMaskNames)

  /** The tolerance-independent filtered intersection, read from the cached
    * join. Match expressions are cheap codegen'd comparisons recomputed per
    * action, while the join that produces these rows is the expensive part —
    * so tolerance variants derived via [[withTolerances]] share one
    * materialization instead of re-running the join per tolerance
    * configuration. */
  private lazy val intersectBase: DataFrame =
    mergedCached.filter(col("_merge") === "both")

  /** One boolean `{col}_match` expression per compared column, bound
    * against `df` — used by both the sampled-rows projection and the fused
    * stats pass, so the two can never disagree on comparator options. */
  private def matchColumns(df: DataFrame): Seq[Column] =
    compareColumns.map { c =>
      val opts = CompareOpts(
        absTol = config.absTol.forColumn(c),
        relTol = config.relTol.forColumn(c),
        ignoreSpaces = config.ignoreSpaces,
        ignoreCase = config.ignoreCase)
      ComparatorPipeline
        .columnsEqual(df, s"${c}_$n1", s"${c}_$n2", opts, config.customComparators)
        .as(s"${c}_match")
    }

  /** Intersection with one boolean `{col}_match` per compared column,
    * appended in a single projection (spark.py:528-570). */
  private lazy val intersectRowsBase: DataFrame =
    intersectBase.select(
      intersectBase.columns.map(col).toIndexedSeq ++ matchColumns(intersectBase): _*)

  /** A comparison over the same frames and join with different tolerances.
    * The derived instance shares the shape probes, the merged outer join,
    * and the cached intersection — only the match expressions (and the
    * statistics computed from them) are rebuilt, so the marginal cost of an
    * extra tolerance configuration is one aggregation pass over cached
    * data, not a re-join. `unpersist()` on either instance releases the
    * shared cache. */
  def withTolerances(absTol: ToleranceSpec, relTol: ToleranceSpec = ToleranceSpec.Zero): SparkCompare =
    new SparkCompare(spark, df1Input, df2Input,
      config.copy(absTol = absTol, relTol = relTol), Some(this))

  /** Like [[withTolerances]] for the other match-only settings: ignore
    * flags and custom comparators. Safe to share the join because
    * comparators never touch it — EXCEPT `ignoreSpaces`, which also trims
    * STRING join keys pre-join; changing it is rejected when any join
    * column is string-typed (the derived join would differ). */
  def withMatchSettings(
      ignoreSpaces: Boolean = config.ignoreSpaces,
      ignoreCase: Boolean = config.ignoreCase,
      customComparators: Seq[graft.functions.Comparator] = config.customComparators): SparkCompare = {
    if (ignoreSpaces != config.ignoreSpaces) {
      val stringKeys = joinColumns.filter(k =>
        TypeClasses.isStringLike(df1.schema(k).dataType) ||
          TypeClasses.isStringLike(df2.schema(k).dataType))
      require(stringKeys.isEmpty,
        s"cannot change ignoreSpaces on a shared join: string join columns ${stringKeys.mkString(", ")} are trimmed pre-join")
    }
    new SparkCompare(spark, df1Input, df2Input,
      config.copy(ignoreSpaces = ignoreSpaces, ignoreCase = ignoreCase,
        customComparators = customComparators), Some(this))
  }

  /** Double-valued view of a column for max-diff purposes, or None when the
    * type has no sensible numeric view (arrays short-circuit to 0 in the
    * reference too, spark.py:1046-1050). Temporal types go through epoch
    * seconds explicitly — the reference's `TRY_CAST(ts AS DOUBLE)` silently
    * NULLs under ANSI mode (Spark 4 default), losing the diff. */
  private def maxDiffView(c: Column, dt: DataType): Option[Column] = dt match {
    case _: NumericType | _: StringType | BooleanType => Some(c.try_cast(DoubleType))
    case TimestampType | TimestampNTZType =>
      // NTZ → TZ interprets in the session time zone (UTC here), matching
      // DuckDB's epoch_us over naive timestamps.
      Some(unix_micros(c.cast(TimestampType)).cast(DoubleType) / lit(1e6))
    case DateType => Some(unix_date(c).cast(DoubleType) * lit(86400.0))
    case _ => None
  }

  // Field names inside the fused stats row.
  private def fMatch(c: String) = s"__match_$c"
  private def fNullDiff(c: String) = s"__nulldiff_$c"
  private def fMaxDiff(c: String) = s"__maxdiff_$c"

  /** THE single-pass statistics aggregation (see class doc): one scan of
    * the cached join computes the per-column match counts, null diffs, max
    * diffs, the all-columns-match row count, AND the three merge-slice
    * counts — every `_merge != 'both'` row only feeds the slice tallies via
    * the `isBoth` guards. */
  private lazy val statsRow: Row = {
    val isBoth = col("_merge") === "both"
    val perCol = compareColumns.flatMap { c =>
      val c1 = col(s"${c}_$n1")
      val c2 = col(s"${c}_$n2")
      val matchExpr =
        sum(when(isBoth && col(s"${c}_match") === true, 1L).otherwise(0L)).as(fMatch(c))
      // XOR-null count (reference: spark.py:1070-1111, one job per column).
      val nullDiffExpr =
        sum(when(isBoth && (c1.isNull =!= c2.isNull), 1L).otherwise(0L)).as(fNullDiff(c))
      // Max |a-b| over try_cast doubles, NaN excluded
      // (reference: spark.py:1026-1067, one job per column).
      val t1 = df1.schema(c).dataType
      val t2 = df2.schema(c).dataType
      (maxDiffView(c1, t1), maxDiffView(c2, t2)) match {
        case (Some(v1), Some(v2)) =>
          val d = abs(v1 - v2)
          Seq(matchExpr, nullDiffExpr, max(when(isBoth && !isnan(d), d)).as(fMaxDiff(c)))
        case _ =>
          Seq(matchExpr, nullDiffExpr)
      }
    }
    val allMatchCond =
      if (compareColumns.isEmpty) lit(true)
      else compareColumns.map(c => col(s"${c}_match") === true).reduce(_ && _)
    val exprs = Seq(
      sum(when(isBoth, 1L).otherwise(0L)).as("__graft_cnt"),
      sum(when(col("_merge") === "left_only", 1L).otherwise(0L)).as("__graft_left"),
      sum(when(col("_merge") === "right_only", 1L).otherwise(0L)).as("__graft_right"),
      sum(when(isBoth && allMatchCond, 1L).otherwise(0L)).as("__graft_all_match")) ++ perCol
    val withMatch = mergedCached.select(
      mergedCached.columns.map(col).toIndexedSeq ++ matchColumns(mergedCached): _*)
    withMatch.agg(exprs.head, exprs.tail: _*).first()
  }

  private def statLong(name: String): Long = {
    val i = statsRow.fieldIndex(name)
    if (statsRow.isNullAt(i)) 0L else statsRow.getLong(i)
  }
  private def statMaxDiff(c: String): Double = {
    val idx = try Some(statsRow.fieldIndex(fMaxDiff(c))) catch { case _: IllegalArgumentException => None }
    idx match {
      case Some(i) if !statsRow.isNullAt(i) =>
        val v = statsRow.getDouble(i)
        if (v.isNaN) 0.0 else v
      case _ => 0.0
    }
  }

  lazy val intersectCount: Long = statLong("__graft_cnt")
  /** 1:1 join ⇒ unique counts are pure arithmetic (see class doc). */
  lazy val df1UnqCount: Long =
    if (probeFree) sliceCounts._2 else df1Count - intersectCount
  lazy val df2UnqCount: Long =
    if (probeFree) sliceCounts._3 else df2Count - intersectCount

  /** Per-column stats in intersect-column order (spark.py:582-636). */
  lazy val columnStats: Seq[ColumnStat] = {
    intersectColumns.map { c =>
      val dtype1 = df1.schema(c).dataType.simpleString
      val dtype2 = df2.schema(c).dataType.simpleString
      if (joinSet.contains(c)) {
        val rowCnt =
          if (!onlyJoinColumns) intersectCount
          else intersectCount + df1UnqCount + df2UnqCount
        ColumnStat(
          column = c, matchColumn = "", matchCnt = intersectCount,
          unequalCnt = rowCnt - intersectCount,
          dtype1 = dtype1, dtype2 = dtype2,
          allMatch = dtype1 == dtype2 && rowCnt == intersectCount,
          maxDiff = 0.0, nullDiff = 0L,
          relTol = config.relTol.forColumn(c), absTol = config.absTol.forColumn(c))
      } else {
        val matchCnt = statLong(fMatch(c))
        ColumnStat(
          column = c, matchColumn = s"${c}_match", matchCnt = matchCnt,
          unequalCnt = intersectCount - matchCnt,
          dtype1 = dtype1, dtype2 = dtype2,
          allMatch = dtype1 == dtype2 && intersectCount == matchCnt,
          maxDiff = statMaxDiff(c), nullDiff = statLong(fNullDiff(c)),
          relTol = config.relTol.forColumn(c), absTol = config.absTol.forColumn(c))
      }
    }
  }

  // ---- predicates (spark.py:638-718) ----
  def allRowsOverlap: Boolean = df1UnqCount == 0 && df2UnqCount == 0
  /** Fused into the stats pass (reference re-scans, spark.py:659-679). */
  def countMatchingRows: Long =
    if (compareColumns.isEmpty) intersectCount else statLong("__graft_all_match")
  def intersectRowsMatch: Boolean =
    intersectCount > 0 && countMatchingRows == intersectCount
  def matches(ignoreExtraColumns: Boolean = false): Boolean =
    (ignoreExtraColumns || allColumnsMatch) && allRowsOverlap && intersectRowsMatch
  def subset: Boolean =
    df2UnqColumns.isEmpty && df2UnqCount == 0 && intersectRowsMatch
  def columnsWithMismatches: Seq[String] =
    columnStats.filter(_.unequalCnt > 0).map(_.column)

  // ---- samples (spark.py:720-867) ----

  /** Sample rows where `column` mismatches: join keys + both versions.
    * Reference: spark.py:720-777. */
  def sampleMismatch(column: String, sampleCount: Int = 10, forDisplay: Boolean = false): DataFrame = {
    if (!onlyJoinColumns && !joinSet.contains(column)) {
      val stat = columnStats.find(_.column == column)
        .getOrElse(throw new IllegalArgumentException(s"unknown column: $column"))
      val n = math.min(sampleCount.toLong, stat.unequalCnt).toInt
      val sample = intersectRows
        .where(col(s"${column}_match") === false)
        .limit(n)
        .select((joinColumns.map(k => col(s"${k}_$n1").as(k)) ++
          Seq(col(s"${column}_$n1"), col(s"${column}_$n2"))).toIndexedSeq: _*)
      if (forDisplay)
        sample.toDF((joinColumns ++ Seq(s"$column ($n1)", s"$column ($n2)")).toIndexedSeq: _*)
      else sample
    } else {
      val n = math.min(sampleCount.toLong, df1UnqCount + df2UnqCount).toInt
      df1UnqRows.select(column).union(df2UnqRows.select(column)).limit(n).toDF(column)
    }
  }

  /** All rows with ≥1 mismatching column: join keys + df1/df2 versions of
    * (optionally only the mismatching) compared columns. Reference:
    * spark.py:793-867 — the mismatch-count agg there is replaced by the
    * already-computed columnStats. */
  def allMismatch(ignoreMatchingCols: Boolean = false): DataFrame = {
    if (onlyJoinColumns)
      return df1UnqRows.select(joinColumns.map(col): _*)
        .union(df2UnqRows.select(joinColumns.map(col): _*))
    val kept = compareColumns.filter { c =>
      !ignoreMatchingCols || columnStats.exists(s => s.column == c && s.unequalCnt > 0)
    }
    if (kept.isEmpty)
      return df1UnqRows.select(joinColumns.map(col): _*)
        .union(df2UnqRows.select(joinColumns.map(col): _*))
    val anyMismatch = kept.map(c => col(s"${c}_match") === false).reduce(_ || _)
    intersectRows
      .where(anyMismatch)
      .select((joinColumns.map(k => col(s"${k}_$n1").as(k)) ++
        kept.flatMap(c => Seq(col(s"${c}_$n1"), col(s"${c}_$n2")))).toIndexedSeq: _*)
  }

  // ---- reporting (reference: base.py:259-443) ----

  /** Assemble the immutable report data. All counts come from memoized
    * state — building the report triggers no recounting jobs (the reference
    * re-counts via a per-call cache, base.py:291-293). */
  def buildReportData(sampleCount: Int = 10, columnCount: Int = 10): graft.report.ReportData = {
    import graft.report._
    val columnSummary = ColumnSummary(
      commonColumns = intersectColumns.length,
      df1Unique = df1UnqColumns.length, df1UniqueColumns = df1UnqColumns,
      df2Unique = df2UnqColumns.length, df2UniqueColumns = df2UnqColumns,
      df1Name = n1, df2Name = n2)
    val matching = countMatchingRows
    val rowSummary = RowSummary(
      matchColumns = joinColumns,
      hasDuplicates = anyDupes,
      absTol = config.absTol.display, relTol = config.relTol.display,
      commonRows = intersectCount,
      df1Unique = df1UnqCount, df2Unique = df2UnqCount,
      unequalRows = intersectCount - matching, equalRows = matching,
      df1Name = n1, df2Name = n2)
    val columnComparison = ColumnComparison(
      unequalColumns = columnStats.count(_.unequalCnt > 0),
      equalColumns = columnStats.count(_.unequalCnt == 0),
      unequalValues = columnStats.map(_.unequalCnt).sum)
    val statList = columnStats.filterNot(_.allMatch).map(s =>
      MismatchStat(s.column, s.dtype1, s.dtype2, s.unequalCnt, s.maxDiff,
        s.nullDiff, s.relTol, s.absTol))
    val sampleList = columnStats
      .filter(s => !s.allMatch && s.unequalCnt > 0)
      .map(s => TextTable.dfToStr(sampleMismatch(s.column, sampleCount, forDisplay = true)))
    val mismatchStats =
      if (statList.nonEmpty)
        MismatchStats(hasMismatches = true,
          hasSamples = sampleList.nonEmpty && sampleCount > 0,
          stats = statList.sortBy(_.column), samples = sampleList,
          df1Name = n1, df2Name = n2)
      else MismatchStats(hasMismatches = false, hasSamples = false)
    def uniqueRowsData(df: DataFrame, unqCount: Long): UniqueRowsData = {
      val minSample = math.min(sampleCount.toLong, unqCount).toInt
      val minCols = math.min(columnCount, df.columns.length)
      if (minSample > 0)
        UniqueRowsData(hasRows = true,
          rows = TextTable.dfToStr(df.select(df.columns.take(minCols).map(col).toIndexedSeq: _*), minSample))
      else UniqueRowsData(hasRows = false)
    }
    ReportData(
      df1Name = n1, df2Name = n2,
      df1Shape = (df1Count, df1.columns.length),
      df2Shape = (df2Count, df2.columns.length),
      columnCount = columnCount,
      columnSummary = columnSummary, rowSummary = rowSummary,
      columnComparison = columnComparison, mismatchStats = mismatchStats,
      df1UniqueRows = uniqueRowsData(df1UnqRows, df1UnqCount),
      df2UniqueRows = uniqueRowsData(df2UnqRows, df2UnqCount))
  }

  /** Render the text report; optionally save the HTML form and/or render
    * through a custom template file. Like the reference (base.py:435-442),
    * the HTML file wraps the SAME text returned — custom-template renders
    * are saved as rendered, not the default layout. */
  def report(sampleCount: Int = 10, columnCount: Int = 10,
      htmlFile: Option[String] = None,
      templatePath: Option[String] = None): String = {
    val data = buildReportData(sampleCount, columnCount)
    val text = data.render(templatePath)
    htmlFile.foreach(graft.report.ReportData.saveHtml(text, _))
    text
  }

  /** Release the cached join (shared with tolerance variants). */
  def unpersist(): Unit = if (config.cacheIntermediates) mergedCached.unpersist()
}

object SparkCompare {
  private final case class Shape(rowCount: Long, keyGroups: Long, nullKeyRows: Long) {
    def hasDupes: Boolean = rowCount > keyGroups
  }
  private final case class Merged(outerJoin: DataFrame, tempJoinColumns: Seq[String])
}

object Utils {
  /** Smallest `_temp_N` absent from both frames (reference: base.py:649-671). */
  def tempColumnName(dfs: DataFrame*): String = {
    val taken = dfs.flatMap(_.columns).map(_.toLowerCase).toSet
    Iterator.from(0).map(i => s"_temp_$i").find(n => !taken.contains(n)).get
  }

  /** Recursively delete a path. The ONE shared implementation — the
    * `Files.walk` stream must be closed (it holds directory handles;
    * the idiom previously copied at several sites leaked one per call). */
  def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val stream = java.nio.file.Files.walk(p)
      try stream.iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally stream.close()
    }
}
