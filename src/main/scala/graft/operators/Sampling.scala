package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting for training pipelines.
  *
  * Random `sample()` is irreproducible across runs/partitionings; these
  * operators key every decision on a content/id hash, so a document lands
  * in the same split on every engine, every run, at any scale — and the
  * md5 bucket arithmetic is reproducible in DuckDB, so splits are
  * oracle-checkable. All pure column expressions: no shuffle, no state. */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of a key column —
    * `('0x' || substr(md5(x), 1, 12))::BIGINT % buckets` in DuckDB.
    *
    * Cross-engine stability holds for STRING and INTEGRAL keys, whose
    * string forms are canonical; fractional/temporal keys stringify
    * differently per engine (Spark "1.0E10" vs DuckDB "10000000000.0"),
    * so hash them through an explicit canonical format first. NULL keys
    * hash to NULL — see the call sites for their policy. */
  def hashBucket(key: Column, buckets: Int): Column =
    Dedup.md5Prefix48(md5(key.cast("string").cast("binary"))) % buckets

  /** Deterministic keyed sample: keep rows whose hash bucket falls below
    * `fraction` of the bucket space (math.round guards double rounding:
    * 0.29*10000 is 2899.9999999999995 in IEEE, flooring would keep one
    * bucket too few). NULL-keyed rows are EXCLUDED (hash is NULL). */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      buckets: Int = 10000): DataFrame =
    df.where(hashBucket(col(keyCol), buckets) < math.round(fraction * buckets))

  /** Deterministic train/validation/test split label from the key hash:
    * bucket < trainPct → "train", < trainPct+valPct → "val", else "test".
    * NULL keys get an explicit "test" label (never train on rows whose
    * identity is unknown) rather than falling through silently. */
  def splitLabel(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be within [0, 100]")
    val b = hashBucket(key, 100)
    when(key.isNull, "test")
      .when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Attach the split label as a `split` column. */
  def withSplit(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    df.withColumn("split", splitLabel(col(keyCol), trainPct, valPct))

  /** Deterministic stratified (per-stratum-rate) sampling — how training
    * mixes are actually built: downsample over-represented domains or
    * languages, keep the rest. A row survives iff its key's hash bucket
    * (out of 100) falls below its stratum's percentage; strata absent from
    * `pctByStratum` use `defaultPct`. Keyed on the row hash, so the kept
    * set is reproducible across runs, engines, and partitionings, and
    * UPSAMPLING a stratum later (raising its pct) strictly grows the kept
    * set — no resample churn. NULL keys are excluded (hash is NULL),
    * NULL strata take `defaultPct`. Pure column expressions: no shuffle. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      pctByStratum: Map[String, Int], defaultPct: Int = 100): DataFrame = {
    require(defaultPct >= 0 && defaultPct <= 100,
      s"defaultPct must be within [0, 100], got $defaultPct")
    pctByStratum.foreach { case (k, v) =>
      require(v >= 0 && v <= 100, s"pct for stratum '$k' must be within [0, 100], got $v")
    }
    // fold in sorted order so the generated plan is deterministic (Map
    // iteration order is not a contract)
    val rate = pctByStratum.toSeq.sortBy(_._1)
      .foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
        when(col(strataCol) === k, lit(v)).otherwise(acc)
      }
    df.where(hashBucket(col(keyCol), 100) < rate)
  }
}
