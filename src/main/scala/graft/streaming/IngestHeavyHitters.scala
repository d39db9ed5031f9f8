package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.HeavyHitters

/** Continuous per-group heavy hitters — "top boilerplate per domain,
  * continuously": the streaming face of
  * [[HeavyHitters.heavyHittersByGroup]], closing the last curation signal
  * that had no incremental story.
  *
  * The design rides Misra-Gries MERGEABILITY (the Agarwal et al. framing
  * already underpinning the batch operator): each micro-batch lands
  *
  *   1. its per-(partition, group) MG candidate summaries — (group,
  *      token, lower_bound) rows plus the exact per-group count
  *      sentinels — into a summary layout, and
  *   2. its raw (group, token) rows into a token corpus,
  *
  * both under a `batch=<id>` directory written with OVERWRITE, so an
  * at-least-once replay of a batch rewrites its own directory instead of
  * double-counting — delivery converges to exactly-once per batch id by
  * construction (the deterministic-directory discipline; a crash
  * mid-overwrite leaves a partial dir the replay overwrites again).
  *
  * [[probe]] then merges ALL persisted summaries by summing lower bounds —
  * each batch's sketch under-counts its slice by at most
  * N_batch/(capacity+1), and the slices' deficits add to the global
  * N/(capacity+1) bound — and runs the batch operator's provable prune +
  * exact recount against the accumulated token corpus. The result is
  * therefore EXACTLY what [[HeavyHitters.heavyHittersByGroup]] computes
  * over the concatenated stream: the sketch work is incremental (one
  * bounded-memory pass per batch, summaries a few KB each), only the
  * recount — whose cost follows the pruned candidate count — touches the
  * corpus. `capacity` rides the summary layout; probes and appends with
  * a drifting value are rejected (a larger claimed capacity would tighten
  * the prune past what the persisted sketches guarantee).
  *
  * File-count note: the `batch=<id>` directories ARE the replay
  * mechanism, so the generic leaf-dir compactor must not merge across
  * them while the stream can still replay those ids. Probes are offline
  * analytics (not per-batch work), so many batch dirs cost only when the
  * question is asked; a deployment running for months would consolidate
  * batches older than its checkpoint fence — a coordination policy, out
  * of scope here. */
object IngestHeavyHitters {

  private[graft] val CapacityFile = "_graft_hh_capacity"

  /** Start the ingest stream. `rows` is a STREAMING frame carrying at
    * least (`groupCol`, `tokenCol`); both layouts are created by the
    * first non-empty batch. */
  def ingest(
      rows: DataFrame,
      summaryPath: String,
      corpusPath: String,
      groupCol: String,
      tokenCol: String,
      capacity: Int,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, summaryPath, corpusPath,
          groupCol, tokenCol, capacity)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** One micro-batch — also the unit driven directly in batch mode by the
    * spec (the streaming harness adds only delivery). Batch-id-keyed
    * OVERWRITE makes this idempotent under replay. */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      summaryPath: String,
      corpusPath: String,
      groupCol: String,
      tokenCol: String,
      capacity: Int): Unit = {
    if (batch.isEmpty) return
    val metaFile = java.nio.file.Paths.get(summaryPath, CapacityFile)
    if (java.nio.file.Files.exists(metaFile)) {
      val c = capacityOf(summaryPath)
      require(c == capacity,
        s"summary layout at $summaryPath was built with capacity=$c, " +
          s"batch offered $capacity")
    }
    HeavyHitters.candidateSummariesByGroup(batch, groupCol, tokenCol, capacity)
      .write.mode("overwrite").parquet(s"$summaryPath/batch=$batchId")
    batch.select(col(groupCol), col(tokenCol))
      .write.mode("overwrite").parquet(s"$corpusPath/batch=$batchId")
    java.nio.file.Files.createDirectories(metaFile.getParent)
    java.nio.file.Files.write(metaFile, capacity.toString.getBytes("UTF-8"))
    ()
  }

  /** True once [[processBatch]] has committed at least one batch. */
  def ready(summaryPath: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(summaryPath, CapacityFile))

  /** The capacity the summary layout was built with. */
  def capacityOf(summaryPath: String): Int =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(summaryPath, CapacityFile)), "UTF-8").trim.toInt

  /** Exact per-group heavy hitters over EVERYTHING ingested so far:
    * merged persisted summaries → per-group provable prune → exact
    * recount against the accumulated token corpus. Hash-equal to running
    * [[HeavyHitters.heavyHittersByGroup]] over the concatenated batches
    * (mergeability, see the object doc). */
  def probe(
      spark: SparkSession,
      summaryPath: String,
      corpusPath: String,
      groupCol: String,
      tokenCol: String,
      denominator: Long): DataFrame = {
    val capacity = capacityOf(summaryPath)
    val summaries = spark.read.parquet(summaryPath)
      .select(col(groupCol), col(tokenCol), col("lower_bound"))
    val tokens = spark.read.parquet(corpusPath)
      .select(col(groupCol), col(tokenCol))
    HeavyHitters.heavyHittersByGroupFromSummaries(summaries, tokens,
      groupCol, tokenCol, denominator, capacity)
  }
}
