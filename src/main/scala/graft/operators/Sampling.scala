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
    * `('0x' || substr(md5(x), 1, 12))::BIGINT % buckets` in DuckDB. */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long") % buckets

  /** Deterministic keyed sample: keep rows whose hash bucket falls below
    * `fraction` of the bucket space. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      buckets: Int = 10000): DataFrame =
    df.where(hashBucket(col(keyCol), buckets) < (fraction * buckets).toLong)

  /** Deterministic train/validation/test split label from the key hash:
    * bucket < trainPct → "train", < trainPct+valPct → "val", else "test". */
  def splitLabel(key: Column, trainPct: Int, valPct: Int): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be within [0, 100]")
    val b = hashBucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Attach the split label as a `split` column. */
  def withSplit(df: DataFrame, keyCol: String, trainPct: Int = 80,
      valPct: Int = 10): DataFrame =
    df.withColumn("split", splitLabel(col(keyCol), trainPct, valPct))
}
