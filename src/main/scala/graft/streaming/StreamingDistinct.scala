package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DistinctSketch

/** Streaming cardinality monitoring — incrementally-maintained per-group
  * HLL registers: each micro-batch's grouped register table
  * ([[DistinctSketch.registersByGroup]]) merges into a persisted register
  * table by per-(group, bucket) max. Because max is associative,
  * commutative AND idempotent, the maintained table equals the batch
  * registers over everything ingested — same-oracle streaming twin — and,
  * unlike the additive [[IncrementalRollup]], re-running a micro-batch
  * after a partial failure cannot corrupt it (duplicate observations are
  * free by idempotence).
  *
  * Scale shape: the persisted state is groups·m rows — sketch-sized, not
  * data-sized — so each batch costs the batch's own register aggregation
  * (shuffle ≤ groups·m rows, map-side combined) plus a read/rewrite of the
  * tiny table. Estimates come from [[DistinctSketch.estimateByGroup]] over
  * the maintained table at any point, mid-stream or after. */
object StreamingDistinct {

  /** Merge one micro-batch into the register table at `tablePath`. */
  def mergeRegistersBatch(batch: DataFrame, tablePath: String,
      groupCols: Seq[String], valueCol: String, m: Int): Unit = {
    val spark = batch.sparkSession
    // emptiness is checked on the RAW batch: probing the aggregated frame
    // would evaluate the grouped register shuffle once for the probe and
    // again for the write — doubling every batch's real work
    if (batch.isEmpty) return
    val partial = DistinctSketch.registersByGroup(batch, groupCols, valueCol, m)
    val f = new java.io.File(tablePath)
    val exists = f.isDirectory &&
      Option(f.listFiles).exists(_.exists(_.getName.endsWith(".parquet")))
    val merged =
      if (!exists) partial
      else spark.read.parquet(tablePath).unionByName(partial)
        .groupBy((groupCols :+ "bucket").map(col): _*)
        .agg(max(col("register")).as("register"))
    // the merged plan reads the file the write replaces — materialize first
    // (the table is groups·m rows; one tiny file keeps reads metadata-cheap)
    merged.localCheckpoint().coalesce(1)
      .write.mode("overwrite").parquet(tablePath)
  }

  /** Drive a file-source replay of `sourceDir` through
    * [[mergeRegistersBatch]] into `tablePath`. `prepare` projects the raw
    * batch to (groupCols*, valueCol) — e.g. cast the tracked id to the
    * canonical string form the hash family expects. */
  def ingestRegisters(
      spark: SparkSession,
      sourceDir: String,
      schemaOf: DataFrame,
      tablePath: String,
      checkpointDir: String,
      groupCols: Seq[String],
      valueCol: String,
      m: Int,
      prepare: DataFrame => DataFrame = identity,
      sourceOptions: Map[String, String] = Map("maxFilesPerTrigger" -> "1"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schemaOf.schema)
      .options(sourceOptions).parquet(sourceDir)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeRegistersBatch(prepare(batch), tablePath, groupCols, valueCol, m)
      }
      .start()
  }
}
