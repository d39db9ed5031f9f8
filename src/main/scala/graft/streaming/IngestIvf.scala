package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ivf

/** Continuous ingest for the persisted IVF vector index — the streaming
  * face of [[Ivf.writeClustered]], the same relationship [[IngestSearch]]
  * has to the inverted text index and [[IngestDedup]] to the MinHash
  * index. Each micro-batch assigns its vectors to the FROZEN centroids
  * and appends their files into the `cluster=N` partition directories —
  * so an [[Ivf.ivfTopKFromClustered]] probe at any point prunes and
  * scores against everything ingested so far, and at `nprobe = k` is
  * exactly the brute-force top-k of the accumulated corpus.
  *
  * Per-batch cost is batch-sized: the assignment expression runs over the
  * delivery only, existing partitions are untouched (re-quantizing the
  * corpus per append would dwarf the ingest at 100 TB). Centroid drift
  * under a shifting distribution degrades partial-nprobe recall, never
  * correctness — retrain + rewrite when drift matters
  * ([[Ivf.kmeansCentroids]] trains on a hash sample, so retraining stays
  * cheap). Delivery is foreachBatch's at-least-once: a replayed batch
  * double-appends its vectors; make ingest idempotent upstream (id-dedup)
  * or compact downstream if exact multiplicity matters. */
object IngestIvf {

  /** Start the index-ingest stream over a STREAMING frame carrying at
    * least the vector column. The layout directory is created by the
    * first batch's append. */
  def ingestToClustered(
      vecs: DataFrame,
      vecCol: String,
      centroids: Array[Array[Double]],
      path: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = vecs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Ivf.appendClustered(batch.toDF(), vecCol, centroids, path)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
