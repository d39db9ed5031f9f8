package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Pq

/** Continuous ingest for the persisted PQ codes layout — the streaming
  * face of the cluster-partitioned codes table, the same relationship
  * [[IngestIvf]] has to the raw-vector IVF layout. Each micro-batch is
  * coarse-assigned and PQ-encoded under the FROZEN centroids/codebooks
  * and its code rows (M small ints per vector instead of the raw floats)
  * append into the `cluster=N` partition directories — so a
  * partition-pruned ADC probe ([[Pq.adcTopKFromCodes]] over the probed
  * directories) at any point scores everything ingested so far, reading
  * ~dim·4/M× fewer bytes than the vectors it replaces.
  *
  * Per-batch cost is batch-sized (encode is a zero-shuffle projection;
  * existing partitions are untouched). Codebook/centroid drift under a
  * shifting distribution degrades recall at a given nprobe, never
  * correctness at full probe — retrain + re-encode when drift matters.
  * Delivery is foreachBatch's at-least-once, and the write is made
  * IDEMPOTENT under replay: each batch lands in its own
  * `cluster=N/batch=B` sub-partitions via dynamic partition overwrite
  * ([[Pq.appendCodesBatch]]), so a replayed batch rewrites exactly its
  * prior output instead of double-appending — probes over the layout
  * never see duplicate vec_ids from redelivery. The per-batch layout
  * accumulates one small file per (cluster, batch); the loop runs
  * [[Pq.compactCodes]] itself on a batch-count schedule (below), keeping
  * the checkpoint-frontier batches uncompacted so replay idempotency
  * survives compaction. */
object IngestPq {

  /** Start the codes-ingest stream over a STREAMING frame carrying the
    * vector and id columns. The layout directory is created by the first
    * batch's append.
    *
    * Self-maintenance: every `compactEveryBatches` micro-batches (0
    * disables) the loop runs [[Pq.compactCodes]] in-line — clusters whose
    * directories exceed `compactMaxFiles` data files merge into negative
    * batch ids, while the newest `compactKeepLatestBatches` batch ids stay
    * uncompacted so foreachBatch's replay-overwrite idempotency survives
    * (a replayed batch rewrites exactly its own `batch=B` partitions,
    * which must therefore still exist). */
  def ingestToCodes(
      vecs: DataFrame,
      vecCol: String,
      idCol: String,
      cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]],
      path: String,
      checkpointDir: Option[String] = None,
      compactEveryBatches: Int = 64,
      compactMaxFiles: Int = 16,
      compactKeepLatestBatches: Int = 1): StreamingQuery = {
    val writer = vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Pq.appendCodesBatch(batch.toDF(), vecCol, idCol, cents, books, path, batchId)
        if (compactEveryBatches > 0 && (batchId + 1) % compactEveryBatches == 0)
          Pq.compactCodes(batch.sparkSession, path,
            maxFilesPerCluster = compactMaxFiles,
            keepLatestBatches = compactKeepLatestBatches)
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
