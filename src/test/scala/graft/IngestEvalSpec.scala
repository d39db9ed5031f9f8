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

  test("consolidation fences the delta history: probe ≡ batch across the " +
    "fence, covered replays are no-ops, a crashed swap heals at probe " +
    "entry, fences past the committed frontier refuse, and the cadence " +
    "hook keeps dir counts bounded") {
    val rows = Seq(
      (0, 1L, "A", Some(3L)), (0, 1L, "B", Some(1L)),
      (1, 1L, "C", Some(3L)), (1, 2L, "B", Some(2L)),
      (2, 2L, "A", Some(5L)), (2, 3L, "C", Some(1L)),
      (3, 3L, "A", Some(4L)), (3, 1L, "D", Some(2L)))
      .toDF("b", "prompt", "model", "score")
    def slice(k: Int) = rows.where(col("b") === k)
      .select("prompt", "model", "score")
    def fullThrough(k: Int) = matrixOf(Preference.winMatrix(
      rows.where(col("b") <= k).select("prompt", "model", "score"),
      "prompt", "model", "score").orderBy("model_a", "model_b"))
    def dirNames(root: String, layer: String): Set[String] =
      Option(new java.io.File(root, layer).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName).toSet
    val root = java.nio.file.Files
      .createTempDirectory("graft_eval_consolidate").toString
    try {
      (0 to 2).foreach(k =>
        IngestEval.processBatch(slice(k), k.toLong, root,
          "prompt", "model", "score"))
      IngestEval.consolidate(spark, root, 2L)
      assert(dirNames(root, "deltas") == Set("batch=-2", "batch=2"))
      assert(dirNames(root, "responses") == Set("batch=-2", "batch=2"))
      assert(matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b")) == fullThrough(2))
      // replay ACROSS the fence: a covered batch is skipped as the no-op
      // it is — no dir reappears, the probe does not move
      IngestEval.processBatch(slice(1), 1L, root, "prompt", "model", "score")
      assert(dirNames(root, "deltas") == Set("batch=-2", "batch=2"))
      assert(matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b")) == fullThrough(2))
      // post-fence ingest lands normally; prior state = consolidated ∪
      // post-fence (batch 3 re-touches prompts 1 and 3 from merged dirs)
      IngestEval.processBatch(slice(3), 3L, root, "prompt", "model", "score")
      assert(matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b")) == fullThrough(3))
      // same-fence re-call: validated no-op (idempotent cadence tick)
      IngestEval.consolidate(spark, root, 2L)
      assert(dirNames(root, "deltas") == Set("batch=-2", "batch=2", "batch=3"))
      // advancing fence re-merges the previous aggregate + covered raws
      IngestEval.consolidate(spark, root, 3L)
      assert(dirNames(root, "deltas") == Set("batch=-3", "batch=3"))
      assert(matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b")) == fullThrough(3))
      // a fence past the committed frontier would cover batches that can
      // still replay — refused at the meta advance
      val ex = intercept[IllegalArgumentException] {
        IngestEval.consolidate(spark, root, 99L)
      }
      assert(ex.getMessage.contains("beyond the highest committed"))
      // fresh stream against the consolidated root still refuses
      val ex2 = intercept[IllegalArgumentException] {
        IngestEval.processBatch(slice(0), 0L, root, "prompt", "model", "score")
      }
      assert(ex2.getMessage.contains("used root"))
      // crash recovery at probe entry: fake a swap that crashed AFTER the
      // merged temp was fully staged (ready marker) and the manifest
      // written, but BEFORE the rename — the probe must roll it forward
      // and answer exactly
      val dRoot = new java.io.File(root, "deltas")
      val merged = spark.read.parquet(
        new java.io.File(dRoot, "batch=-3").toString,
        new java.io.File(dRoot, "batch=3").toString)
        .groupBy(col("model_a"), col("model_b"))
        .agg(sum("wins_a").as("wins_a"), sum("wins_b").as("wins_b"),
          sum("ties").as("ties"), sum("n").as("n"))
      val tmp = new java.io.File(dRoot,
        graft.sources.Compaction.ConsolidateTmp)
      merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      java.nio.file.Files.createFile(tmp.toPath.resolve("_graft_ready"))
      java.nio.file.Files.write(
        dRoot.toPath.resolve(graft.sources.Compaction.ConsolidateManifest),
        "batch=-4\nbatch=-3\nbatch=3".getBytes)
      assert(matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b")) == fullThrough(3))
      assert(dirNames(root, "deltas") == Set("batch=-4"))
      // processBatch heals a crashed swap BEFORE reading prior state:
      // fake the responses-layer crash in the rename-to-delete window
      // (merged target committed, old dirs not yet deleted, manifest
      // still present) — an unhealed listing would double the prior and
      // PERSIST a delta counting every comparison twice (review r16)
      val rRoot = new java.io.File(root, "responses")
      val rOlds = Seq("batch=-3", "batch=3")
      assert(dirNames(root, "responses") == rOlds.toSet)
      spark.read.parquet(rOlds.map(d => new java.io.File(rRoot, d).toString): _*)
        .coalesce(1).write.mode("overwrite")
        .parquet(new java.io.File(rRoot, "batch=-4").toString)
      java.nio.file.Files.write(
        rRoot.toPath.resolve(graft.sources.Compaction.ConsolidateManifest),
        ("batch=-4" +: rOlds).mkString("\n").getBytes)
      val extra = Seq((1L, "E", Some(9L)), (3L, "E", Some(1L)))
        .toDF("prompt", "model", "score")
      IngestEval.processBatch(extra, 4L, root, "prompt", "model", "score")
      assert(dirNames(root, "responses") == Set("batch=-4", "batch=4"))
      val wantAll = matrixOf(Preference.winMatrix(
        rows.select("prompt", "model", "score").unionByName(extra),
        "prompt", "model", "score").orderBy("model_a", "model_b"))
      assert(matrixOf(IngestEval.probe(spark, root)
        .orderBy("model_a", "model_b")) == wantAll)
    } finally graft.operators.Utils.deleteRecursively(
      java.nio.file.Paths.get(root))

    // the deltas-first crash window feeds the fresh-stream guard too
    // (ADVICE r15): deltas/batch=1 committed, responses only through 0 —
    // a fresh stream's batch 0 must refuse on the DELTAS listing
    val root2 = java.nio.file.Files
      .createTempDirectory("graft_eval_consolidate2").toString
    try {
      IngestEval.processBatch(slice(0), 0L, root2, "prompt", "model", "score")
      IngestEval.processBatch(slice(1), 1L, root2, "prompt", "model", "score")
      graft.operators.Utils.deleteRecursively(
        java.nio.file.Paths.get(root2, "responses", "batch=1"))
      val ex = intercept[IllegalArgumentException] {
        IngestEval.processBatch(slice(0), 0L, root2,
          "prompt", "model", "score")
      }
      assert(ex.getMessage.contains("deltas batches beyond 0"))
    } finally graft.operators.Utils.deleteRecursively(
      java.nio.file.Paths.get(root2))

    // cadence hook mid-stream: consolidateEvery=2 fences at batch 2 from
    // inside foreachBatch — dirs stay bounded, the probe stays exact
    val root3 = java.nio.file.Files
      .createTempDirectory("graft_eval_consolidate3").toString
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Option[Long])]
      val q = IngestEval.ingest(
        mem.toDF().toDF("prompt", "model", "score"),
        root3, "prompt", "model", "score",
        checkpointDir = Some(s"$root3/_ckpt"), consolidateEvery = 2)
      try {
        mem.addData((1L, "A", Some(3L)), (1L, "B", Some(1L)))
        q.processAllAvailable()
        mem.addData((1L, "C", Some(2L)), (2L, "A", Some(1L)))
        q.processAllAvailable()
        mem.addData((2L, "C", Some(4L)), (3L, "B", Some(2L)))
        q.processAllAvailable()
      } finally q.stop()
      assert(dirNames(root3, "deltas") == Set("batch=-2", "batch=2"))
      val want = matrixOf(Preference.winMatrix(
        Seq((1L, "A", 3L), (1L, "B", 1L), (1L, "C", 2L), (2L, "A", 1L),
          (2L, "C", 4L), (3L, "B", 2L)).toDF("prompt", "model", "score"),
        "prompt", "model", "score").orderBy("model_a", "model_b"))
      assert(matrixOf(IngestEval.probe(spark, root3)
        .orderBy("model_a", "model_b")) == want)
    } finally graft.operators.Utils.deleteRecursively(
      java.nio.file.Paths.get(root3))
  }
}
