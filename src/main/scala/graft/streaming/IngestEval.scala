package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Preference

/** Streaming model-eval ingest: scored responses arrive continuously (an
  * eval harness emitting results as suites finish) and the pairwise win
  * matrix — the Elo/Bradley–Terry sufficient statistic — stays queryable
  * without ever recomputing from scratch. Win counts are ADDITIVE, so
  * each micro-batch lands only its DELTA matrix: the new comparisons its
  * responses create against everything already ingested (cross-batch
  * pairs included — a prompt's responses may arrive in different
  * batches) plus among themselves. [[probe]] sums the persisted deltas.
  *
  * Exactness: with prior state P and batch B, the delta is
  * `winMatrix(P∪B) − winMatrix(P)` restricted to B's prompts — every
  * comparison involving a B response, each exactly once; untouched
  * prompts cancel, so the restriction is exact and Σ deltas telescopes
  * to `winMatrix(everything)`. ONE winMatrix definition serves the batch
  * operator, the delta, and the probe — their semantics cannot diverge.
  *
  * Delivery contract (the repo's foreachBatch standard): batch-id-keyed
  * OVERWRITE makes replays idempotent — the delta recompute reads only
  * response dirs with id < batchId, so it is deterministic no matter
  * when the replay happens; the deltas dir is written FIRST and the
  * responses dir LAST, so a crash between them replays into identical
  * overwrites (the responses dir is the commit marker: until it lands,
  * the batch is not "prior state" for any later batch).
  *
  * Scale shape: the per-batch work is a semi-join of prior responses to
  * the batch's touched prompts plus two winMatrix aggregates over that
  * slice — eval tables are models × prompts × replicates, so "prior"
  * here is small by construction; deltas are ≤ models² rows per batch
  * and the probe reads only deltas, never responses. */
object IngestEval {

  private val CountCols = Seq("wins_a", "wins_b", "ties", "n")

  /** COMMITTED batch dirs only (`_SUCCESS` present): a crash mid
    * delta-write leaves a partial dir whose subset of task files would
    * silently undercount in a probe taken before the replay converges;
    * the same filter keeps a torn responses dir out of later batches'
    * prior state. */
  private def batchDirs(spark: SparkSession, path: String): Seq[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(s => s.getPath.getName.drop("batch=".length).toLong ->
        s.getPath.toString)
      .sortBy(_._1)
  }

  /** Wire a streaming frame of (prompt, model, score) rows into the
    * layout at `root` — one [[processBatch]] per micro-batch. */
  def ingest(rows: DataFrame, root: String, promptCol: String,
      modelCol: String, scoreCol: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val writer = rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, root, promptCol, modelCol,
          scoreCol)
      }
    checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
      .start()
  }

  /** One micro-batch — also the unit driven directly in batch mode by the
    * spec and the driver query (the streaming harness adds only
    * delivery). See the object scaladoc for the delta algebra and the
    * replay/crash contract. */
  def processBatch(batch: DataFrame, batchId: Long, root: String,
      promptCol: String, modelCol: String, scoreCol: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // a FRESH stream (new checkpoint ⇒ batch ids restart at 0) against a
    // root that already holds later batches would corrupt the history:
    // its deltas double-count against the stale prior state and the stale
    // tail never clears. A consistent checkpoint can only replay batch 0
    // while no later batch has committed, so this guard never fires on a
    // legitimate replay.
    if (batchId == 0L)
      require(batchDirs(spark, s"$root/responses").forall(_._1 == 0L),
        s"eval layout at $root already holds batches beyond 0 — a fresh " +
          "stream (new checkpoint) against a used root would corrupt the " +
          "delta history; keep the original checkpoint, probe the old " +
          "layout read-only, or start a new root")
    val resp = batch.select(col(promptCol), col(modelCol), col(scoreCol))
    val touched = resp.select(col(promptCol)).distinct()
    val priorDirs = batchDirs(spark, s"$root/responses")
      .filter(_._1 < batchId)
    val priorTouched =
      if (priorDirs.isEmpty) None
      else Some(spark.read.parquet(priorDirs.map(_._2): _*)
        .join(touched, Seq(promptCol), "left_semi"))
    val after = Preference.winMatrix(
      priorTouched.fold(resp)(_.unionByName(resp)),
      promptCol, modelCol, scoreCol).drop("win_rate_a")
    val delta = priorTouched match {
      case None => after
      case Some(pt) =>
        val before = CountCols.foldLeft(
          Preference.winMatrix(pt, promptCol, modelCol, scoreCol)
            .drop("win_rate_a")) { (d, c) =>
          d.withColumnRenamed(c, s"__graft_b_$c")
        }
        // pairs new to this batch have no 'before' row — coalesce to 0;
        // pairs whose counts did not move drop out (their delta is zero)
        // UNLESS this is the pair's FIRST observation (possible with
        // all-NULL-score comparisons, n = 0): the batch operator emits
        // such pairs as zero rows, so the stream must record them once
        // for probe ≡ batch parity
        val deltaCols = CountCols.map(c =>
          (col(c) - coalesce(col(s"__graft_b_$c"), lit(0L))).as(c))
        after.join(before, Seq("model_a", "model_b"), "left")
          .where(CountCols.map(c =>
            col(c) - coalesce(col(s"__graft_b_$c"), lit(0L)) =!= 0L)
            .reduce(_ || _) || col("__graft_b_n").isNull)
          .select(col("model_a") +: col("model_b") +: deltaCols: _*)
    }
    // deltas FIRST, responses LAST (the commit marker) — see scaladoc.
    // One file per delta dir: the frame is ≤ models² rows, and without
    // the coalesce every batch would scatter it across the session's
    // shuffle-partition count in near-empty files the probe then has to
    // open batches× over
    delta.coalesce(1)
      .write.mode("overwrite").parquet(s"$root/deltas/batch=$batchId")
    resp.write.mode("overwrite").parquet(s"$root/responses/batch=$batchId")
  }

  /** Bradley–Terry strengths over the ACCUMULATED matrix — continuously
    * updated model rankings from the stream: [[probe]]'s summed deltas
    * feed [[Preference.bradleyTerryFromMatrix]] directly, so the
    * strengths equal the batch [[Preference.bradleyTerry]] over
    * everything ingested (same fold-order determinism, same oracle). */
  def strengths(spark: SparkSession, root: String, iters: Int = 8,
      maxModels: Int = 2048): DataFrame =
    Preference.bradleyTerryFromMatrix(probe(spark, root), iters, maxModels)

  /** The accumulated win matrix: Σ of the persisted per-batch deltas,
    * with `win_rate_a` derived by [[Preference.withWinRate]] — the ONE
    * definition [[Preference.winMatrix]] itself uses, so the probe cannot
    * desynchronize from the batch operator. Reads ONLY the committed
    * deltas (≤ models² rows per batch) — never the response corpus. */
  def probe(spark: SparkSession, root: String): DataFrame = {
    val dd = batchDirs(spark, s"$root/deltas")
    require(dd.nonEmpty,
      s"eval layout at $root holds no committed delta batches — ingest " +
        "before probing")
    Preference.withWinRate(
      spark.read.parquet(dd.map(_._2): _*)
        .groupBy(col("model_a"), col("model_b"))
        .agg(CountCols.map(c => sum(col(c)).as(c)).head,
          CountCols.map(c => sum(col(c)).as(c)).tail: _*))
  }
}
