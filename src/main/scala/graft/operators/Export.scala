package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Secondary-sorted shard export — the "write the corpus as N shard files,
  * each internally ordered" layout a training job consumes (deterministic
  * shard membership via key hash, deterministic order within each shard via
  * the sort columns).
  *
  * Two faces, one contract:
  *
  *   - [[writeSortedShards]] produces the PHYSICAL layout: one parquet
  *     file per shard directory, rows sorted. The plan is the scale
  *     shape — one hash exchange on the shard column (all rows of a
  *     shard land in one task), a per-task spillable sort, zero windows.
  *   - [[sortedShardManifest]] computes the LOGICAL manifest of exactly
  *     that layout: per shard, the row count, sort-column extrema, and an
  *     order-sensitive checksum. The checksum tags each row with its rank
  *     within the shard and sums the 48-bit md5 prefix of `rank:key` —
  *     the SUM is order-independent (any aggregation order yields the
  *     same total) but the rank tags encode the order, so two layouts
  *     with the same rows in different order produce different checksums.
  *     That construction is what makes a physical-layout property
  *     hash-checkable by an engine (DuckDB) that never sees the files.
  *
  * The manifest's per-shard `row_number` window performs the same
  * partition-then-sort the writer performs — parallel across shards, a
  * sort per shard — so manifest cost ≈ export cost, and at 100 TB both
  * scale as one shuffle + per-shard sorts. The checksum sum accumulates
  * in DECIMAL(38,0), exact past 10^22 rows per shard. */
object Export {

  /** Deterministic shard id: 48-bit md5 prefix of the key string, modulo
    * `numShards` (non-negative — the prefix is a positive long). Same
    * arithmetic as the deterministic-shuffle bucket, engine-mirrorable. */
  def shardOf(key: Column, numShards: Int): Column =
    (Dedup.md5Long48(key.cast("string").cast("binary")) % numShards).cast("long")

  /** Write `df` as `numShards` shard directories under `path`
    * (`shard=K/part-*.parquet`), each shard exactly one file with rows
    * ordered by `sortCols` then `keyCol`. Returns the written row count. */
  def writeSortedShards(
      df: DataFrame,
      keyCol: String,
      sortCols: Seq[String],
      numShards: Int,
      path: String): Long = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val sharded = df.withColumn("shard", shardOf(col(keyCol), numShards))
    // One exchange keyed on the shard id co-locates each shard in a single
    // task (equal keys hash together); the within-task sort leads with the
    // shard id so a task owning several shards still writes each shard
    // file in order. maxRecordsPerFile stays default — one file per shard.
    sharded
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(("shard" +: sortCols :+ keyCol).map(col): _*)
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    df.sparkSession.read.parquet(path).count()
  }

  /** Order-sensitive per-shard manifest of the sorted-shard layout:
    * (shard, n_rows, min/max of `statCol`, checksum). `checksum` is the
    * decimal string of Σ md5Prefix48(rank ":" key) over the shard in sort
    * order — emitted as a string so the exact integer survives every
    * engine's dataframe bridge (38-digit decimals round through float64
    * in some). */
  def sortedShardManifest(
      df: DataFrame,
      keyCol: String,
      sortCols: Seq[String],
      statCol: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val w = Window.partitionBy(col("shard"))
      .orderBy((sortCols :+ keyCol).map(col): _*)
    df.withColumn("shard", shardOf(col(keyCol), numShards))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("elem", Dedup.md5Long48(
        concat_ws(":", col("rank").cast("string"), col(keyCol).cast("string"))
          .cast("binary")))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        min(col(statCol)).as(s"min_$statCol"),
        max(col(statCol)).as(s"max_$statCol"),
        sum(col("elem").cast("decimal(38,0)")).cast("string").as("checksum"))
  }
}
