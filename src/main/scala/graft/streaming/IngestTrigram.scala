package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Search
import graft.sources.Compaction

/** Continuous ingest for the persisted character-trigram index — the
  * streaming face of [[Search.writeTrigramIndex]], completing the set
  * (BM25, MinHash, phash, LSH, IVF, PQ all have theirs): each micro-batch's
  * distinct-trigram postings append into the gram-hash bucket partitions,
  * so a [[Search.substringSearchFromIndex]] probe at any point greps
  * everything ingested so far, identically to a full `contains` scan of
  * the accumulated corpus (the spec pins that equality per batch).
  *
  * Per-batch cost is batch-sized (one shuffle of the batch's postings).
  * Delivery is foreachBatch's at-least-once — a replayed batch
  * double-appends its documents' postings, which the probe tolerates by
  * counting DISTINCT matched trigrams per document; bucket-count drift on
  * append is rejected via the layout marker. Every `compactEveryBatches`
  * micro-batches (0 disables) the loop compacts `bucket=` partition dirs
  * exceeding `compactMaxFiles` data files
  * ([[graft.sources.Compaction.compactLeafPartitions]] — crash-safe, grep
  * results byte-identical). */
object IngestTrigram {

  /** Start the index-ingest stream over a STREAMING frame carrying at
    * least (`idCol`, `textCol`). The index is created on the first
    * non-empty batch. */
  def ingestToIndex(
      docs: DataFrame,
      indexPath: String,
      textCol: String,
      idCol: String,
      numBuckets: Int = 64,
      checkpointDir: Option[String] = None,
      compactEveryBatches: Int = 64,
      compactMaxFiles: Int = 16): StreamingQuery = {
    val writer = docs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        Search.appendToTrigramIndex(
          batch.toDF(), textCol, idCol, indexPath, numBuckets)
        if (compactEveryBatches > 0 && (batchId + 1) % compactEveryBatches == 0)
          Compaction.compactLeafPartitions(batch.sparkSession, indexPath,
            maxFiles = compactMaxFiles)
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
