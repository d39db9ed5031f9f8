package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Preference
import graft.sources.{Compaction, LayoutMeta}

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
  * and the probe reads only deltas, never responses. The one per-BATCH
  * growth — one dir per micro-batch in each layer, forever —
  * [[consolidate]] fences away (keyed-sum merge below a committed-
  * frontier fence, the [[IngestHeavyHitters]] pattern), so listing and
  * open costs stay O(consolidated + recent), not O(stream lifetime). */
object IngestEval {

  private val CountCols = Seq("wins_a", "wins_b", "ties", "n")

  /** The consolidation fence's meta file (layout root): batch ids below
    * it live inside the consolidated `batch=-<fence>` dirs and must never
    * be rewritten. ADVANCES across consolidations, so it is written via
    * [[LayoutMeta.writeAtomic]] (the HH fence discipline — a crashed
    * consolidation must never leave an empty fence file that takes every
    * probe and ingest batch down with a parse error). */
  private[graft] val FenceFile = "_graft_eval_fence"

  /** The layout's consolidation fence — 0 when none set. */
  def fenceOf(spark: SparkSession, root: String): Long =
    LayoutMeta.readAtomicOpt(spark, root, FenceFile)
      .map(_.trim.toLong).getOrElse(0L)

  /** COMMITTED batch dirs only (`_SUCCESS` present): a crash mid
    * delta-write leaves a partial dir whose subset of task files would
    * silently undercount in a probe taken before the replay converges;
    * the same filter keeps a torn responses dir out of later batches'
    * prior state. */
  private def batchDirs(spark: SparkSession, path: String): Seq[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    // LayoutMeta.hadoopConf, not sessionState: the read-only surface
    // ([[probe]]/[[strengths]]) is Connect-portable, and a Connect
    // client's sessionState throws
    val fs = root.getFileSystem(LayoutMeta.hadoopConf(spark))
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=") &&
        fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(s => s.getPath.getName.drop("batch=".length).toLong ->
        s.getPath.toString)
      .sortBy(_._1)
  }

  /** Wire a streaming frame of (prompt, model, score) rows into the
    * layout at `root` — one [[processBatch]] per micro-batch.
    * `consolidateEvery` > 0 [[consolidate]]s all batches below the
    * current committed frontier every that-many batches (the HH cadence
    * hook), keeping both layers at O(1) consolidated dirs + O(cadence)
    * recent ones instead of one dir per micro-batch forever. */
  def ingest(rows: DataFrame, root: String, promptCol: String,
      modelCol: String, scoreCol: String,
      checkpointDir: Option[String] = None,
      consolidateEvery: Int = 0): StreamingQuery = {
    val writer = rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, root, promptCol, modelCol,
          scoreCol)
        if (consolidateEvery > 0 && batchId > 0 &&
          batchId % consolidateEvery == 0) {
          // fence at the committed frontier, NOT blindly at batchId: an
          // empty (or fence-skipped) batch commits no responses dir, and
          // a fence past the committed max is rejected by design
          val committedMax = batchDirs(batch.sparkSession,
            s"$root/responses").map(_._1).filter(_ >= 0)
            .maxOption.getOrElse(-1L)
          if (committedMax >= 1L)
            consolidate(batch.sparkSession, root,
              math.min(batchId, committedMax))
        }
        ()
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
    // heal a crashed consolidation swap BEFORE listing prior state: a
    // crash in replaceDirs' rename-to-delete window leaves batch=-f AND
    // the raw dirs it covers, all committed — a prior-state read over
    // that doubled listing would compute (and PERSIST) a delta counting
    // every batch-vs-prior comparison twice, a corruption no later
    // recovery can undo (review r16)
    recoverBoth(spark, root)
    // a FRESH stream (new checkpoint ⇒ batch ids restart at 0) against a
    // root that already holds later batches would corrupt the history:
    // its deltas double-count against the stale prior state and the stale
    // tail never clears. BOTH layouts are checked: deltas are written
    // before responses, so a crash between delta-write(b) and
    // response-write(b) leaves a committed deltas/batch=b with responses
    // only up to b-1 — a responses-only check would wave a fresh stream
    // through while the stale batch-b delta keeps feeding every probe
    // (ADVICE r15). A consistent checkpoint can only replay batch 0 while
    // no later batch has committed — and [[consolidate]]'s
    // fence ≤ max-committed-batch bound means a fence implies a later
    // committed batch, hence a checkpoint-committed batch 0 — so this
    // guard never fires on a legitimate replay, consolidated or not.
    if (batchId == 0L)
      Seq("responses", "deltas").foreach(layer =>
        require(batchDirs(spark, s"$root/$layer").forall(_._1 == 0L),
          s"eval layout at $root already holds $layer batches beyond 0 — " +
            "a fresh stream (new checkpoint) against a used root would " +
            "corrupt the delta history; keep the original checkpoint, " +
            "probe the old layout read-only, or start a new root"))
    // a batch below the fence lives inside the consolidated aggregates:
    // its replay is the no-op it would have been under batch-dir
    // overwrite — rewriting the dir would double its counts against the
    // consolidated sum instead
    if (batchId < fenceOf(spark, root)) return
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

  /** Merge every batch below `fence` (including earlier consolidations)
    * into one `batch=-<fence>` dir per layer — the cure for the one
    * unbounded thing in this layout: at a batch a minute, a year of
    * streaming is ~500k delta dirs every [[probe]] must list and open,
    * and ~500k response dirs every [[processBatch]] prior-read pays too.
    * Win counts are ADDITIVE, so the delta merge is a pure keyed sum
    * (bit-identical to the probe's own aggregate — no sketch semantics,
    * no erasure shapes); responses merge by plain concatenation (their
    * only consumer is the prior-state union, which is order-free).
    * Post-consolidation each layer holds O(1) consolidated dirs + one
    * per post-fence batch.
    *
    * Crash discipline (the [[IngestHeavyHitters.consolidate]] pattern):
    * the fence meta advances FIRST — from that moment replays of covered
    * batches are skipped, which is safe whether or not the physical merge
    * below ever completes — then each layer swaps under
    * [[Compaction.replaceDirs]]' temp/marker/manifest protocol, recovered
    * at every probe and consolidate entry. Idempotent; a no-op when
    * nothing new is covered. Offline-maintenance caveat: a probe running
    * CONCURRENTLY with a swap window can see a row twice.
    *
    * `fence` must not exceed the highest committed batch id when it
    * ADVANCES the meta: Structured Streaming starts batch b only after
    * b−1's offsets commit, so covered batches (< fence ≤ max committed)
    * can never replay — and a fence implies a committed batch ≥ 1, which
    * keeps [[processBatch]]'s fresh-stream guard sound on consolidated
    * roots (batch 0 can only legitimately replay while NOTHING later
    * committed). Fence at or below the current meta is a validated
    * no-op re-call, not an error. */
  def consolidate(spark: SparkSession, root: String, fence: Long): Unit = {
    require(fence >= 0, s"fence must be non-negative, got $fence")
    recoverBoth(spark, root)
    val current = fenceOf(spark, root)
    if (fence > current) {
      val committed = batchDirs(spark, s"$root/responses")
        .map(_._1).filter(_ >= 0)
      require(committed.nonEmpty && fence <= committed.max,
        s"fence=$fence is beyond the highest committed batch " +
          s"(${committed.maxOption.getOrElse(-1L)}) at $root — a fence " +
          "past the committed frontier would cover batches that can " +
          "still replay (and break the fresh-stream guard's soundness); " +
          "fence at or below the last committed batch id")
      // writeAtomic, not write: the fence ADVANCES, so the plain
      // create-with-overwrite truncate window would leave an empty meta
      // every probe and batch then dies parsing (the HH fence lesson)
      LayoutMeta.writeAtomic(spark, root, FenceFile, fence.toString)
    }
    val f = math.max(fence, current)
    if (f == 0) return
    val target = s"batch=-$f"
    // a single old CONSOLIDATED dir means nothing new is below the fence
    // — re-merging one aggregate into itself under a new name is a full
    // rewrite for zero information gain (the HH needsSwap rule; no
    // erasure exception here — this layout has no tombstones)
    def needsSwap(olds: Seq[(Long, String)]): Boolean =
      olds.nonEmpty && !(olds.size == 1 && olds.head._1 < 0)
    val dRoot = s"$root/deltas"
    val dOlds = batchDirs(spark, dRoot).filter(_._1 < f)
    if (needsSwap(dOlds)) {
      val merged = spark.read.parquet(dOlds.map(_._2): _*)
        .groupBy(col("model_a"), col("model_b"))
        .agg(CountCols.map(c => sum(col(c)).as(c)).head,
          CountCols.map(c => sum(col(c)).as(c)).tail: _*)
      Compaction.replaceDirs(spark, new Path(dRoot),
        dOlds.map(d => s"batch=${d._1}"), target, merged)
    }
    val rRoot = s"$root/responses"
    val rOlds = batchDirs(spark, rRoot).filter(_._1 < f)
    if (needsSwap(rOlds)) {
      val merged = spark.read.parquet(rOlds.map(_._2): _*)
      Compaction.replaceDirs(spark, new Path(rRoot),
        rOlds.map(d => s"batch=${d._1}"), target, merged)
    }
    ()
  }

  /** Finish or roll back a half-done [[consolidate]] swap in either
    * layer — at every probe and consolidate entry, the HH discipline. */
  private def recoverBoth(spark: SparkSession, root: String): Unit = {
    val conf = LayoutMeta.hadoopConf(spark)
    Seq(s"$root/deltas", s"$root/responses").foreach { p =>
      val r = new Path(p)
      val fs = r.getFileSystem(conf)
      if (fs.exists(r)) Compaction.recoverRoot(fs, r)
    }
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
    recoverBoth(spark, root) // heal a crashed consolidation swap first
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
