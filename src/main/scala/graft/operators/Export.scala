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

  /** GLOBALLY-ORDERED range-sharded layout: shard boundaries are the exact
    * order statistics at ranks ⌈i·n/S⌉ of the key (distributed rank
    * selection — [[Profile.selectRanks]], no single-task sort anywhere),
    * shard membership is the comparison count Σᵢ [v > bᵢ] against the
    * broadcast boundary literals, and `pos` is the row's 1-based rank
    * within its shard under (key, id). The pair (shard, pos) is a GLOBAL
    * total order — shard boundaries refine key order — which is the
    * property a hash-sharded export cannot give: concatenating range
    * shards 0..S−1 reads the whole corpus in key order, with no task ever
    * sorting more than ≈ n/S rows (equi-depth boundaries bound shard
    * sizes against key skew, up to boundary ties). Rows with a NULL key
    * are excluded. Output: original columns + (shard, pos).
    *
    * A STRING key dispatches to the lexicographic path
    * ([[rangeShardedPositionsString]] — boundaries via
    * [[Profile.selectRanksString]], binary string order); every other
    * orderable type ranges over its double cast.
    *
    * Contract change (since the string path landed): string keys
    * previously ranged over their DOUBLE cast — numeric-string keys
    * sharded numerically and non-numeric rows were dropped as NULL. They
    * now shard lexicographically and keep every non-NULL row. A caller
    * that wants the old numeric behavior for numeric-string keys must
    * cast the key column to double explicitly before calling. */
  def rangeShardedPositions(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      numShards: Int): DataFrame = {
    require(numShards > 1, s"numShards must be > 1, got $numShards")
    if (df.schema(keyCol).dataType == org.apache.spark.sql.types.StringType)
      return rangeShardedPositionsString(df, keyCol, idCol, numShards)
    val v = col(keyCol).cast("double")
    val nn = df.where(v.isNotNull)
    val mm = nn.agg(count(lit(1)).as("n"), min(v).as("mn"), max(v).as("mx")).first()
    val n = mm.getLong(0)
    if (n == 0)
      return nn.withColumn("shard", lit(0L)).withColumn("pos", lit(0L))
    def rank(i: Int): Long = math.max(1L, (i.toLong * n + numShards - 1) / numShards)
    val ranks = (1 until numShards).map(rank(_)).distinct
    val hits = Profile.selectRanks(
      nn.select(lit(keyCol).as("column"), v.as("v")),
      Map(keyCol -> ranks),
      Map(keyCol -> ((mm.getDouble(1), mm.getDouble(2)))))
    val bounds = (1 until numShards).map(i => hits((keyCol, rank(i))))
    val shard = bounds.map(b => when(v > lit(b), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(v.asc, col(idCol).asc)
    nn.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** [[rangeShardedPositions]] for a STRING key — the text-corpus case
    * (export keyed on a document/url id): shard boundaries are the exact
    * LEXICOGRAPHIC order statistics at ranks ⌈i·n/S⌉ via the distributed
    * string rank selection ([[Profile.selectRanksString]] — prefix-stripped
    * codepoint bucketing, only hit buckets sort), shard membership is the
    * comparison count against the broadcast boundary string literals
    * (binary string comparison — identical in Spark and DuckDB's default
    * collation), and (shard, pos) is a global total order under (key, id)
    * exactly as in the numeric form. */
  def rangeShardedPositionsString(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      numShards: Int): DataFrame = {
    require(numShards > 1, s"numShards must be > 1, got $numShards")
    val v = col(keyCol).cast("string")
    val nn = df.where(v.isNotNull)
    val n = nn.count()
    if (n == 0)
      return nn.withColumn("shard", lit(0L)).withColumn("pos", lit(0L))
    def rank(i: Int): Long = math.max(1L, (i.toLong * n + numShards - 1) / numShards)
    val ranks = (1 until numShards).map(rank(_)).distinct
    val hits = Profile.selectRanksString(
      nn.select(lit(keyCol).as("column"), v.as("v")),
      Map(keyCol -> ranks))
    val bounds = (1 until numShards).map(i => hits((keyCol, rank(i))))
    val shard = bounds.map(b => when(v > lit(b), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(v.asc, col(idCol).asc)
    nn.withColumn("shard", shard)
      .withColumn("pos", row_number().over(w).cast("long"))
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
