package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Search
import graft.sources.Compaction

/** Continuous ingest for the persisted inverted text index — the streaming
  * face of [[Search.writeInvertedIndex]], the same relationship
  * [[IngestDedup]] has to the MinHash index. Each micro-batch tokenizes its
  * documents, appends their postings into the term-hash bucket partitions,
  * and accumulates the (N, total-tokens) stats sidecar — so a
  * [[Search.bm25TopKFromIndex]] probe at any point scores against
  * everything ingested so far, bit-identically to a scan of the
  * accumulated corpus (the spec pins that equality per batch).
  *
  * Per-batch cost is batch-sized: postings of the batch only, one
  * read-modify-write of a two-number sidecar. Delivery is foreachBatch's
  * at-least-once — a replayed batch double-appends postings and stats;
  * dedup upstream (chain [[IngestDedup]] before this) or compact
  * downstream if replay matters for scoring accuracy.
  */
object IngestSearch {

  /** Start the index-ingest stream over a STREAMING frame carrying at
    * least (`idCol`, `textCol`). The index is created on the first
    * non-empty batch. Every `compactEveryBatches` micro-batches (0
    * disables) the loop compacts `bucket=` partition dirs exceeding
    * `compactMaxFiles` data files
    * ([[graft.sources.Compaction.compactLeafPartitions]] — crash-safe,
    * scores byte-identical; the underscore-prefixed stats sidecar is
    * invisible to the compactor), so probe reads stay O(targetFiles) per
    * bucket however long the stream runs. */
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
        Search.appendToInvertedIndex(
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
