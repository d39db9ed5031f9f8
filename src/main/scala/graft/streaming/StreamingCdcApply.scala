package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC apply — the keyed-merge upsert consumer for a
  * [[graft.operators.Cdc.changesWithValues]] feed: each micro-batch of
  * (keys, change_type, new values) rows is merged into a persisted snapshot
  * table, so the table tracks the source as `apply(A, changes(A→B)) ≡ B`
  * batch over batch (the invariant the batch operator is oracle-checked
  * with — the streaming twin shares that oracle verbatim).
  *
  * Scale shape: the snapshot is hash-bucketed on the key
  * (`__bucket` partition directories); a batch reads and rewrites ONLY the
  * buckets its keys touch (dynamic partition overwrite — the
  * [[IncrementalRollup]] pattern), so per-batch cost is
  * O(batch + touched-bucket rows), independent of snapshot size when
  * deltas are concentrated. Size `buckets` so one bucket's rows fit an
  * executor comfortably at the target scale. Production engines get this
  * atomically from a MERGE-capable table format; the parquet committer
  * here is atomic per partition, and re-running a half-applied batch is
  * idempotent per key (upsert), unlike the rollup's additive merge.
  *
  * Contract: at most one change row per key per micro-batch (any changeset
  * derived from a snapshot diff satisfies this; feeds with finer-grained
  * events should be last-write-wins pre-deduplicated upstream). Cross-batch
  * sequences on one key — insert, then update, then delete — apply in
  * arrival order; StreamingSpec replays exactly that. */
object StreamingCdcApply {

  /** The snapshot's key-bucket column — ONE definition shared by the
    * initial seed load and every batch merge, so a key's rows can never
    * land in two partitions. */
  def bucketExpr(keys: Seq[String], buckets: Int): org.apache.spark.sql.Column =
    pmod(hash(keys.map(col): _*), lit(buckets))

  /** Seed the snapshot table with an initial full load. */
  def seedSnapshot(initial: DataFrame, tablePath: String, keys: Seq[String],
      buckets: Int = 16): Unit =
    initial.withColumn("__bucket", bucketExpr(keys, buckets))
      .write.mode("overwrite").partitionBy("__bucket").parquet(tablePath)

  /** Merge one changeset micro-batch (shape:
    * [[graft.operators.Cdc.changesWithValues]] — keys, change_type, new
    * values) into the bucket-partitioned snapshot at `tablePath`. */
  def applyChangeBatch(batch: DataFrame, tablePath: String, keys: Seq[String],
      valueCols: Seq[String], buckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    val withB = batch.withColumn("__bucket", bucketExpr(keys, buckets))
    // ONE action answers both "is the batch empty" and "which buckets":
    // the old isEmpty probe was a separate job re-reading the batch
    // source per micro-batch (r17, guide §1.5 — per-batch constants add
    // up across a replay)
    val touched = withB.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val outCols = keys ++ valueCols
    // dynamic-partition-overwrite commits write no _SUCCESS marker — detect
    // the table by its partition directories (same rule as IncrementalRollup).
    // The probe goes through the session's Hadoop FileSystem, not
    // java.io.File: on HDFS/S3 a local-FS probe would silently say "no
    // table" and the first batch would overwrite-seed the snapshot.
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val exists = fs.exists(root) && fs.getFileStatus(root).isDirectory &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("__bucket="))
    val current =
      if (exists)
        spark.read.parquet(tablePath)
          .where(col("__bucket").isin(touched: _*))
          .select(outCols.map(col): _*)
      else batch.select(outCols.map(col): _*).where(lit(false))
    val applied = graft.operators.Cdc.applyChanges(current, withB, keys, valueCols)
      .withColumn("__bucket", bucketExpr(keys, buckets))
      // the merged plan READS the partitions the write replaces —
      // materialize first (touched buckets only, bounded by construction)
      .localCheckpoint()
    applied
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(tablePath)
    // dynamic overwrite only replaces partitions PRESENT in the output — a
    // batch whose deletes empty a bucket produces no rows for it, so the
    // stale directory would survive. Drop touched-but-now-empty buckets
    // explicitly (bounded by the batch's own bucket count).
    val nonEmpty = applied.select("__bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    touched.filterNot(nonEmpty).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"__bucket=$b"), true)
    }
  }

  /** Drive a file-source replay of changeset batches from `sourceDir`
    * through [[applyChangeBatch]] into the snapshot at `tablePath`. */
  def ingestChanges(
      spark: SparkSession,
      sourceDir: String,
      schemaOf: DataFrame,
      tablePath: String,
      checkpointDir: String,
      keys: Seq[String],
      valueCols: Seq[String],
      buckets: Int = 16,
      sourceOptions: Map[String, String] = Map("maxFilesPerTrigger" -> "1"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schemaOf.schema)
      .options(sourceOptions).parquet(sourceDir)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChangeBatch(batch, tablePath, keys, valueCols, buckets)
      }
      .start()
  }
}
