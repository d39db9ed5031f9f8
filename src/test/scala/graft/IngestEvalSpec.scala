package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference
import graft.streaming.IngestEval

/** The streaming win-matrix ingest's contract: Σ of persisted per-batch
  * deltas ≡ the one-shot batch operator — across batches that split a
  * prompt's responses, under at-least-once replay (any order), through
  * the deltas-first/responses-last crash window, including the
  * zero-count first-observation corner — and the probe reads ONLY the
  * delta dirs. */
class IngestEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def matrixOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap

  test("probe ≡ batch winMatrix across prompt-splitting batches; replay " +
    "(in order or late) and the deltas-written/responses-missing crash " +
    "window both converge; a MemoryStream drives the same unit") {
    val rows = Seq(
      // prompt 1 split across batches 0 and 1: the cross-batch A-B and
      // A-C comparisons exist only via the delta algebra
      (0, 1L, "A", Some(3L)), (0, 1L, "B", Some(1L)),
      (1, 1L, "C", Some(3L)), (1, 1L, "B", Some(2L)),
      // prompt 2 entirely in batch 1
      (1, 2L, "A", Some(5L)), (1, 2L, "B", Some(5L)),
      // batch 2: more of prompt 2 (another A response) + prompt 3
      (2, 2L, "A", Some(7L)), (2, 3L, "B", Some(1L)), (2, 3L, "C", Some(2L)),
      // zero-count first observation: D vs A share prompt 4 only through
      // a NULL score — the batch operator emits the pair as a zero row
      (2, 4L, "A", None), (2, 4L, "D", Some(9L)))
      .toDF("b", "prompt", "model", "score")
    def slice(k: Int) = rows.where(col("b") === k)
      .select("prompt", "model", "score")
    val full = matrixOf(Preference.winMatrix(
      rows.select("prompt", "model", "score"), "prompt", "model", "score")
      .orderBy("model_a", "model_b"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_eval_stream").toString
    try {
      IngestEval.processBatch(slice(0), 0L, root, "prompt", "model", "score")
      IngestEval.processBatch(slice(1), 1L, root, "prompt", "model", "score")
      // crash window: the deltas dir landed but the responses commit
      // marker did not — at-least-once replays the batch and converges
      graft.operators.Utils.deleteRecursively(
        java.nio.file.Paths.get(root, "responses", "batch=1"))
      IngestEval.processBatch(slice(1), 1L, root, "prompt", "model", "score")
      IngestEval.processBatch(slice(2), 2L, root, "prompt", "model", "score")
      // a LATE replay of an old batch: prior state is keyed on dir ids
      // below the batch, so the overwrite is byte-deterministic
      IngestEval.processBatch(slice(1), 1L, root, "prompt", "model", "score")
      val probed = matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b"))
      assert(probed == full, s"probe $probed\nbatch $full")
      // the zero-count first observation really flowed through
      assert(probed.contains(("A", "D")) &&
        probed(("A", "D")) == ((0L, 0L, 0L, 0L, None)))
      // cross-batch comparison really counted: prompt 1's A(3) vs C(3)
      // tie spans batches 0 and 1
      assert(probed(("A", "C"))._3 >= 1L)
      // streamed strengths == batch Bradley-Terry over everything ingested
      val streamed = IngestEval.strengths(spark, root)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batch = Preference.bradleyTerry(
        rows.select("prompt", "model", "score"), "prompt", "model", "score")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamed == batch && streamed.nonEmpty)
      // the probe consumes ONLY deltas: corrupt every response data file
      // and probe again (a responses read would throw)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(root, "responses"))
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => java.nio.file.Files.write(f.toPath, "x".getBytes))
      assert(matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b")) == full)
    } finally graft.operators.Utils.deleteRecursively(
      java.nio.file.Paths.get(root))

    // guards: a FRESH stream (batch 0, new checkpoint) against a used
    // root refuses instead of corrupting the delta history; an
    // uncommitted (marker-less) dir is invisible to the probe
    val root3 = java.nio.file.Files
      .createTempDirectory("graft_eval_stream3").toString
    try {
      IngestEval.processBatch(slice(0), 0L, root3, "prompt", "model", "score")
      IngestEval.processBatch(slice(1), 1L, root3, "prompt", "model", "score")
      val ex = intercept[IllegalArgumentException] {
        IngestEval.processBatch(slice(0), 0L, root3, "prompt", "model", "score")
      }
      assert(ex.getMessage.contains("used root"))
      val before01 = matrixOf(IngestEval.probe(spark, root3)
        .orderBy("model_a", "model_b"))
      val junk = java.nio.file.Paths.get(root3, "deltas", "batch=9")
      java.nio.file.Files.createDirectories(junk)
      java.nio.file.Files.write(junk.resolve("part-junk.parquet"),
        "not parquet".getBytes)
      assert(matrixOf(IngestEval.probe(spark, root3)
        .orderBy("model_a", "model_b")) == before01,
        "an uncommitted delta dir leaked into the probe")
    } finally graft.operators.Utils.deleteRecursively(
      java.nio.file.Paths.get(root3))

    // the streaming harness delivers the same unit: a MemoryStream of the
    // same rows in two triggers equals the batch operator
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_eval_stream2").toString
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Option[Long])]
      val q = IngestEval.ingest(
        mem.toDF().toDF("prompt", "model", "score"),
        root2, "prompt", "model", "score",
        checkpointDir = Some(s"$root2/_ckpt"))
      try {
        mem.addData((1L, "A", Some(3L)), (1L, "B", Some(1L)))
        q.processAllAvailable()
        mem.addData((1L, "C", Some(2L)), (2L, "A", Some(1L)),
          (2L, "C", Some(4L)))
        q.processAllAvailable()
      } finally q.stop()
      val want = matrixOf(Preference.winMatrix(
        Seq((1L, "A", 3L), (1L, "B", 1L), (1L, "C", 2L), (2L, "A", 1L),
          (2L, "C", 4L)).toDF("prompt", "model", "score"),
        "prompt", "model", "score").orderBy("model_a", "model_b"))
      assert(matrixOf(IngestEval.probe(spark, root2)
        .orderBy("model_a", "model_b")) == want)
    } finally graft.operators.Utils.deleteRecursively(
      java.nio.file.Paths.get(root2))
  }
}
