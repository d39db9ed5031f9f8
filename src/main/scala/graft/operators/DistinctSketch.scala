package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate distinct counting via HyperLogLog-style registers (Flajolet
  * et al., AofA '07), built from the portable md5 hash family so the whole
  * structure — registers, register sum, and the final estimate — is
  * bit-reproducible in any engine (the q_sketch_distinct DuckDB mirror).
  *
  * Layout: `m` registers; a value hashes to bucket `a mod m` and rank
  * `ρ = (trailing zeros of b) + 1` capped at 48 (`a`, `b` = the two
  * 48-bit md5 longs, [[Dedup.md5HashPair]]); register j keeps `max ρ`
  * over its values. `max` is commutative/associative/idempotent, so the
  * register table is a plain hash aggregate with ≤ `m` output rows —
  * map-side combine bounds the shuffle at O(partitions · m), and two
  * corpora merge by per-bucket max ([[merge]]): the classic mergeable
  * sketch, one scan at any data size (contrast the exact path's
  * shuffle-the-universe `count(DISTINCT)`).
  *
  * Exactness discipline for the estimate: the harmonic-mean denominator
  * `Σ 2^−reg` is scaled by 2^48 into `Σ 2^(48−reg)` — an EXACT BIGINT
  * (≤ m·2^48 < 2^63) accumulated in any order — so the only floating
  * operation in the whole pipeline is the final single division
  * `C / S` with a compile-time double constant `C = α_m · m² · 2^48`.
  * One deterministic IEEE division; everything upstream is integer.
  *
  * ρ uses trailing zeros (not HLL's leading-run-of-0s) — an equivalent
  * geometric variable with the same distribution, chosen because
  * `bit_count((b & -b) − 1)` is exact integer arithmetic both engines
  * share, with no dependence on word width above bit 48.
  */
object DistinctSketch {

  /** α_m · m² · 2^48 — the estimate numerator. α_m per the HLL paper's
    * bias correction: 0.7213 / (1 + 1.079/m). */
  def numeratorConst(m: Int): Double =
    0.7213 / (1.0 + 1.079 / m) * m.toDouble * m.toDouble * math.pow(2.0, 48)

  /** Rank of a 48-bit hash: trailing zeros + 1, capped at 48 (`b = 0` —
    * probability 2^−48 — lands on the cap instead of an out-of-range
    * shift downstream). */
  private def rho(b: Column): Column =
    when(b === 0L, lit(48))
      .otherwise(least(bit_count((b.bitwiseAND(-b)) - 1) + 1, lit(48)))

  /** The register table: `(bucket, register)`, at most `m` rows. */
  def registers(df: DataFrame, valueCol: String, m: Int): DataFrame = {
    val (a, b) = Dedup.md5HashPair(col(valueCol))
    df.select(pmod(a, lit(m.toLong)).as("bucket"), rho(b).as("r"))
      .groupBy("bucket")
      .agg(max(col("r")).as("register"))
  }

  /** Grouped register tables: `(groupCols*, bucket, register)`, at most
    * `m` rows PER GROUP — the "distinct users per segment/hour" production
    * shape. Same one-scan hash aggregate; the shuffle carries at most
    * groups·m rows regardless of data volume. */
  def registersByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, m: Int): DataFrame = {
    require(groupCols.nonEmpty, "registersByGroup needs at least one group column")
    val (a, b) = Dedup.md5HashPair(col(valueCol))
    df.select(groupCols.map(col) ++
        Seq(pmod(a, lit(m.toLong)).as("bucket"), rho(b).as("r")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("register"))
  }

  /** Per-group summary of a grouped register table: one row per group with
    * the exact integer register sum and the HLL estimate (same arithmetic
    * discipline as [[estimate]] — one double division per group). */
  def estimateByGroup(regs: DataFrame, groupCols: Seq[String], m: Int): DataFrame =
    regs
      .select(groupCols.map(col) :+
        expr("shiftleft(CAST(1 AS BIGINT), 48 - register)").as("pw"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("pw")).as("s_present"), count(lit(1)).as("present"))
      .select(groupCols.map(col) ++ Seq(
        (lit(m.toLong) - col("present")).as("zero_buckets"),
        (coalesce(col("s_present"), lit(0L)) +
          (lit(m.toLong) - col("present")) * lit(1L << 48)).as("sum_pow")): _*)
      .withColumn("est",
        (lit(numeratorConst(m)) / col("sum_pow").cast("double"))
          .cast("decimal(38,6)").cast("double"))

  /** Merge register tables of two corpora: per-bucket max — exactly the
    * registers of the union (max is idempotent, so overlap is free). */
  def merge(left: DataFrame, right: DataFrame): DataFrame =
    left.unionByName(right)
      .groupBy("bucket")
      .agg(max(col("register")).as("register"))

  /** One-row summary of a register table: the exact integer register sum
    * `S = Σ 2^(48−reg)` (absent buckets contribute 2^48), the zero-bucket
    * count, and the HLL estimate `C / S` — the single double division. */
  def estimate(regs: DataFrame, m: Int): DataFrame =
    regs
      .select(expr("shiftleft(CAST(1 AS BIGINT), 48 - register)").as("pw"))
      .agg(sum(col("pw")).as("s_present"), count(lit(1)).as("present"))
      .select(
        lit(m.toLong).as("n_buckets"),
        (lit(m.toLong) - col("present")).as("zero_buckets"),
        (coalesce(col("s_present"), lit(0L)) +
          (lit(m.toLong) - col("present")) * lit(1L << 48)).as("sum_pow"))
      .withColumn("est",
        (lit(numeratorConst(m)) / col("sum_pow").cast("double"))
          .cast("decimal(38,6)").cast("double"))
}
