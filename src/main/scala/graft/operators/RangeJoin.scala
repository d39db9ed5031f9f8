package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval joins — the other join family (beside [[AsOf]]) that
  * Spark's optimizer can't plan well natively: an equi-key plus a pure
  * range predicate plans as a sort-merge join on the key with the range as
  * a post-filter (per-key cross product), and a range-only predicate
  * degenerates to a broadcast-nested-loop. The fix is the classic bucketed
  * reformulation: quantize event time into fixed-width buckets, make the
  * bucket part of the JOIN KEY, and keep the exact predicate as a residual
  * filter. Each pair is emitted exactly once by construction (a point lies
  * in exactly one bucket; the other side enumerates every bucket it can
  * reach), so no distinct pass is needed.
  *
  * At 100 TB this turns "hot key × hot key" cross products into
  * "hot (key, bucket) × hot (key, bucket)" — shuffle volume grows only by
  * the small bucket fan-out (3× for band joins, interval-span× for
  * interval joins), and AQE's skew handling sees the finer keys.
  */
object RangeJoin {

  /** Exact floor-division bucketing: (c − c mod w) / w. The subtraction
    * makes the numerator an exact multiple of w, so the double division is
    * exact for any |c| ≤ 2⁵³ (every epoch-micros value), and pmod keeps
    * floor semantics for negatives. */
  private def bucketOf(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Band self/two-table join: all (left, right) pairs with equal keys and
    * |left.ts − right.ts| ≤ `bandWidthMicros` (inclusive), timestamps as
    * epoch-micros columns. The left side explodes to its bucket ±1 (bucket
    * width = band width) and joins the right side's single bucket — each
    * qualifying pair matches exactly once.
    *
    * Columns from both sides survive with `lPrefix`/`rPrefix` prefixes
    * (callers pick non-colliding prefixes).
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsMicrosCol: String,
      bandWidthMicros: Long,
      lPrefix: String = "l_",
      rPrefix: String = "r_"): DataFrame = {
    require(bandWidthMicros > 0, "bandWidthMicros must be positive")
    val lb = "_graft_band_bucket_l"
    val rb = "_graft_band_bucket_r"
    val lBucket = bucketOf(col(s"$lPrefix$tsMicrosCol"), bandWidthMicros)
    val l = left.columns.foldLeft(left)((df, c) =>
      df.withColumnRenamed(c, lPrefix + c))
      .withColumn(lb, explode(array(lBucket - 1L, lBucket, lBucket + 1L)))
    val r = right.columns.foldLeft(right)((df, c) =>
      df.withColumnRenamed(c, rPrefix + c))
      .withColumn(rb, bucketOf(col(s"$rPrefix$tsMicrosCol"), bandWidthMicros))
    val joinCond = keyCols.map(k => col(s"$lPrefix$k") === col(s"$rPrefix$k"))
      .reduceOption(_ && _).map(_ && col(lb) === col(rb))
      .getOrElse(col(lb) === col(rb))
    l.join(r, joinCond)
      .where(abs(col(s"$lPrefix$tsMicrosCol") - col(s"$rPrefix$tsMicrosCol"))
        <= lit(bandWidthMicros))
      .drop(lb, rb)
  }

  /** Point-in-interval join: every (point, interval) pair with equal keys
    * and `lo ≤ point.ts ≤ hi` (inclusive). Intervals enumerate the buckets
    * they cover; points join their single bucket, so each pair matches
    * exactly once. Pick `bucketWidthMicros` near the typical interval
    * length: fan-out ≈ span/width + 1. Intervals spanning more than
    * `maxBuckets` buckets raise an error BEFORE the bucket sequence is
    * built (the guard is wired into the sequence's upper bound), rather
    * than silently truncating or materializing a runaway array; empty
    * intervals (hi < lo) drop like the exact predicate would drop them.
    */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      tsMicrosCol: String,
      loMicrosCol: String,
      hiMicrosCol: String,
      bucketWidthMicros: Long,
      maxBuckets: Int = 1024,
      pPrefix: String = "p_",
      iPrefix: String = "i_"): DataFrame = {
    require(bucketWidthMicros > 0, "bucketWidthMicros must be positive")
    require(maxBuckets > 0, "maxBuckets must be positive")
    val pb = "_graft_iv_bucket_p"
    val ib = "_graft_iv_bucket_i"
    val p = points.columns.foldLeft(points)((df, c) =>
      df.withColumnRenamed(c, pPrefix + c))
      .withColumn(pb, bucketOf(col(s"$pPrefix$tsMicrosCol"), bucketWidthMicros))
    val i0 = intervals.columns.foldLeft(intervals)((df, c) =>
      df.withColumnRenamed(c, iPrefix + c))
    val loB = bucketOf(col(s"$iPrefix$loMicrosCol"), bucketWidthMicros)
    val hiB = bucketOf(col(s"$iPrefix$hiMicrosCol"), bucketWidthMicros)
    // the guard lives inside the sequence bound: an oversized interval
    // raises before any bucket array exists
    val hiGuarded = when(hiB - loB + 1L <= lit(maxBuckets.toLong), hiB)
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $maxBuckets buckets of "),
        lit(bucketWidthMicros), lit("us — widen bucketWidthMicros")))
        .cast("long"))
    val i = i0
      .where(col(s"$iPrefix$hiMicrosCol") >= col(s"$iPrefix$loMicrosCol"))
      .withColumn(ib, explode(sequence(loB, hiGuarded)))
    val joinCond = keyCols.map(k => col(s"$pPrefix$k") === col(s"$iPrefix$k"))
      .reduceOption(_ && _).map(_ && col(pb) === col(ib))
      .getOrElse(col(pb) === col(ib))
    p.join(i, joinCond)
      .where(col(s"$pPrefix$tsMicrosCol").between(
        col(s"$iPrefix$loMicrosCol"), col(s"$iPrefix$hiMicrosCol")))
      .drop(pb, ib)
  }
}
