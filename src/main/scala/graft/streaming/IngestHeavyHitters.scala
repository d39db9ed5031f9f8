package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.HeavyHitters
import graft.sources.{Compaction, LayoutMeta, Retention}

/** Continuous per-group heavy hitters — "top boilerplate per domain,
  * continuously": the streaming face of
  * [[HeavyHitters.heavyHittersByGroup]].
  *
  * The design rides Misra-Gries MERGEABILITY (the Agarwal et al. framing
  * already underpinning the batch operator): each micro-batch lands
  *
  *   1. its raw (group, token [, doc id]) rows into a token corpus, and
  *   2. its per-(partition, group) MG candidate summaries — (group,
  *      token, lower_bound) rows plus the exact per-group count
  *      sentinels — into a summary layout,
  *
  * both under a `batch=<id>` directory written with OVERWRITE, so an
  * at-least-once replay of a batch rewrites its own directory instead of
  * double-counting — delivery converges to exactly-once per batch id by
  * construction (the deterministic-directory discipline; a crash
  * mid-overwrite leaves a partial dir the replay overwrites again).
  * Corpus-before-summaries write order: a crash between the two writes
  * leaves batch N's rows in the corpus but not in the sketches, so until
  * the replay lands a [[probe]] is TRANSIENTLY inexact for tokens whose
  * status depends on batch N (its mass is recounted but not reflected in
  * the candidate bounds or group totals); the replay overwrites both dirs
  * and restores exactness. The reverse order would instead UNDER-recount
  * tokens the sketches already counted — the same one-batch window, but
  * dropping real heavy hitters rather than admitting borderline ones, the
  * worse failure direction for a curation signal.
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
  * **Consolidation** ([[consolidate]]): `batch=` directories are the
  * replay mechanism, so the generic leaf-dir compactor must not merge
  * across them while the stream can still replay those ids — but a
  * deployment running for months would otherwise accumulate one dir per
  * micro-batch in BOTH layouts, every probe paying the LIST + footer
  * costs. Consolidation merges all batches below a caller-supplied FENCE
  * — a batch id at or below the stream's committed checkpoint frontier,
  * which Structured Streaming guarantees will never replay — into one
  * `batch=-<fence>` dir per layout: summaries merge LOSSLESSLY by summing
  * `lower_bound` per (group, token) (MG mergeability — the exact merge
  * [[probe]] performs anyway), and the token corpus AGGREGATES to one
  * (group, token, count) row per key, which the weighted recount consumes
  * with bit-identical results. The fence rides the summary layout: a
  * replayed batch below it is skipped as the no-op it is (its rows are
  * already inside the consolidated aggregates). Both swaps run under
  * [[Compaction.replaceDirs]]' crash-safe temp/marker/manifest discipline,
  * recovered at every probe and consolidate entry. Post-consolidation the
  * layouts hold O(1) consolidated dirs + one dir per post-fence batch,
  * and probe cost is flat in how MANY batches delivered a given corpus.
  *
  * **Erasure** ([[deleteIds]]): when [[ingest]] is configured with an
  * `idCol`, raw corpus rows carry the source document id, and erasing a
  * document tombstones it ([[Retention]]'s dir convention inside the
  * corpus layout): every probe's recount anti-joins the tombstones
  * IMMEDIATELY, and the next [[consolidate]] drops the rows physically
  * while it is rewriting anyway (tombstones persist — post-fence raw
  * batches or a replayed batch may still carry the id). Consolidation is
  * normally the AGGREGATION BOUNDARY for erasure: the collapsed
  * (group, token, count) rows hold no ids, so a request arriving after
  * the fence has no handle on them — [[deleteIds]] REFUSES loudly in
  * that state rather than silently leaving the tokens in the merged
  * counts. Deployments that must honor late erasure consolidate with
  * `retainIds = true` from the start: the corpus aggregate then keys on
  * (group, token, id) — probe-identical, erasable forever, aggregate
  * size following distinct triples instead of pairs. Summaries keep
  * their aggregate counts either way: they hold no document ids, so
  * after an erasure the support thresholds remain computed against
  * INGESTED group totals while erased occurrences no longer count toward
  * any token's frequency — a stricter-only filter. For bulk age-out,
  * rebuild the layouts instead. */
object IngestHeavyHitters {

  private[graft] val CapacityFile = "_graft_hh_capacity"
  private[graft] val FenceFile = "_graft_hh_fence"
  private[graft] val IdColFile = "_graft_hh_id"
  private[graft] val RetainFile = "_graft_hh_retain"
  private[graft] val AppliedFile = "_graft_hh_hb_applied"
  private[graft] val WeightCol = "__graft_tc"
  private[graft] val BucketCol = "__graft_hb"

  /** An erasable retain mode: plain `ids` or bucketed `ids:<B>`. */
  private def modeRetainsIds(m: String): Boolean =
    m == "ids" || m.startsWith("ids:")

  /** The bucket count of a bucketed retain mode (`ids:<B>`), None for
    * `ids`/`agg`. */
  private def bucketsOf(m: String): Option[Int] =
    if (m.startsWith("ids:")) Some(m.drop(4).toInt) else None

  /** A document id's retention bucket: the portable md5 48-bit prefix mod
    * the layout's bucket count — deterministic, engine-mirrorable, stable
    * across consolidations (the bucket IS part of the aggregate key, so
    * the formula is part of the layout's on-disk contract; consolidation-
    * time only, never a hot-path cost). */
  private[graft] def bucketOf(id: Column, buckets: Int): Column =
    pmod(graft.operators.Dedup.md5Prefix48(
      md5(id.cast("string").cast("binary"))), lit(buckets.toLong))

  /** Start the ingest stream. `rows` is a STREAMING frame carrying at
    * least (`groupCol`, `tokenCol`) — plus `idCol`'s column when erasure
    * by document id must be possible; both layouts are created by the
    * first non-empty batch. `consolidateEvery` > 0 consolidates all
    * batches below the current one on that cadence (safe: foreachBatch
    * only receives batch N after batch N−1 committed, so ids < N never
    * replay). */
  def ingest(
      rows: DataFrame,
      summaryPath: String,
      corpusPath: String,
      groupCol: String,
      tokenCol: String,
      capacity: Int,
      idCol: Option[String] = None,
      checkpointDir: Option[String] = None,
      consolidateEvery: Int = 0,
      retainIds: Boolean = false,
      idBuckets: Int = 0): StreamingQuery = {
    // late-erasure deployments consolidate with retainIds from the FIRST
    // consolidation (the mode is write-once per layout) — without this
    // pass-through the cadence path could only ever stamp 'agg', and on a
    // layout already stamped 'ids' the mode-drift require would fail the
    // whole stream at the first cadence tick
    require(!retainIds || idCol.nonEmpty,
      "retainIds = true needs idCol: the corpus aggregate can only keep " +
        "an id column the ingest records")
    val writer = rows.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, summaryPath, corpusPath,
          groupCol, tokenCol, capacity, idCol)
        if (consolidateEvery > 0 && batchId > 0 && batchId % consolidateEvery == 0)
          consolidate(batch.sparkSession, summaryPath, corpusPath,
            batchId, groupCol, tokenCol, retainIds, idBuckets)
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** One micro-batch — also the unit driven directly in batch mode by the
    * spec (the streaming harness adds only delivery). Batch-id-keyed
    * OVERWRITE makes this idempotent under replay; batches below the
    * consolidation fence are skipped (their rows already live inside the
    * consolidated aggregates — rewriting their dirs would double-count). */
  def processBatch(
      batch: DataFrame,
      batchId: Long,
      summaryPath: String,
      corpusPath: String,
      groupCol: String,
      tokenCol: String,
      capacity: Int,
      idCol: Option[String] = None): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    if (ready(spark, summaryPath)) {
      if (batchId < fenceOf(spark, summaryPath)) return
      val c = capacityOf(spark, summaryPath)
      require(c == capacity,
        s"summary layout at $summaryPath was built with capacity=$c, " +
          s"batch offered $capacity")
    } else {
      // meta FIRST (the BucketedCorpus discipline): a first-batch crash
      // after the data writes but before the meta would let a replay with
      // a DIFFERENT capacity pass the drift check against its own sketches
      LayoutMeta.write(spark, summaryPath, CapacityFile, capacity.toString)
    }
    // corpus column-set drift guard (the schema discipline): the probe
    // reads all raw batch dirs as ONE parquet read, which silently
    // misresolves columns across a mixed-schema layout
    val idStamp = idCol.getOrElse("")
    LayoutMeta.readOpt(spark, corpusPath, IdColFile) match {
      case Some(rec) => require(rec.trim == idStamp,
        s"corpus at $corpusPath was built with idCol='${rec.trim}', " +
          s"batch offered '$idStamp'")
      case None =>
        // grandfathering a NEW column stamp onto dirs that already exist
        // would create exactly the mixed-schema layout this guard is for:
        // pre-guard layouts (no meta) may only continue id-less
        require(idStamp.isEmpty || batchDirs(spark, corpusPath).isEmpty,
          s"corpus at $corpusPath already holds batches without an id " +
            s"column — cannot start carrying '$idStamp' mid-layout " +
            "(rebuild the layout to enable erasure)")
        LayoutMeta.write(spark, corpusPath, IdColFile, idStamp)
    }
    // corpus BEFORE summaries — see the object doc's crash-window analysis
    batch.select(col(groupCol) +: col(tokenCol) +: idCol.map(col).toSeq: _*)
      .write.mode("overwrite").parquet(s"$corpusPath/batch=$batchId")
    HeavyHitters.candidateSummariesByGroup(batch, groupCol, tokenCol, capacity)
      .write.mode("overwrite").parquet(s"$summaryPath/batch=$batchId")
    ()
  }

  /** True once [[processBatch]] has recorded the layout metadata. */
  def ready(spark: SparkSession, summaryPath: String): Boolean =
    LayoutMeta.exists(spark, summaryPath, CapacityFile)

  def ready(summaryPath: String): Boolean =
    ready(SparkSession.active, summaryPath)

  /** The capacity the summary layout was built with. */
  def capacityOf(spark: SparkSession, summaryPath: String): Int =
    LayoutMeta.read(spark, summaryPath, CapacityFile).trim.toInt

  def capacityOf(summaryPath: String): Int =
    capacityOf(SparkSession.active, summaryPath)

  /** The consolidation fence: batch ids below it must never be written
    * (their contents live in the consolidated dirs). 0 when none set.
    * The fence ADVANCES across consolidations, so it is written via
    * [[LayoutMeta.writeAtomic]] and read back here with the matching
    * old-or-new read — a crashed consolidation can never leave an empty
    * fence file that takes every probe and ingest batch down with a
    * parse error (plain create-with-overwrite truncates first). */
  def fenceOf(spark: SparkSession, summaryPath: String): Long =
    LayoutMeta.readAtomicOpt(spark, summaryPath, FenceFile)
      .map(_.trim.toLong).getOrElse(0L)

  def fenceOf(summaryPath: String): Long =
    fenceOf(SparkSession.active, summaryPath)

  /** The corpus consolidation retain mode: `Some("ids")` when consolidated
    * aggregates keep the document id column (late erasure reaches them
    * exactly), `Some("ids:<B>")` when they keep the id's RETENTION BUCKET
    * instead (late erasure reaches them with bucket-granular over-erasure
    * — aggregate size bounded by pairs × B), `Some("agg")` when they
    * collapsed to (group, token, count) (ids gone — the aggregation
    * boundary), `None` before any consolidation stamped a mode.
    * Write-once: the first [[consolidate]] fixes it for the layout's
    * lifetime (mixing shapes in one layout would leave NULL-keyed rows no
    * erasure request could ever name). */
  def retainModeOf(spark: SparkSession, corpusPath: String): Option[String] =
    LayoutMeta.readOpt(spark, corpusPath, RetainFile).map(_.trim)

  /** Logically erase a document's token rows: `ids` is a single-column
    * frame of the id column the corpus was ingested with. Probes exclude
    * the rows immediately (tombstone anti-join over raw batch dirs AND —
    * under `retainIds` consolidation — the consolidated aggregates); the
    * next [[consolidate]] drops them physically from everything below its
    * fence.
    *
    * FAILS LOUDLY when consolidated aggregates exist that the erasure
    * cannot reach: a layout consolidated WITHOUT `retainIds = true` has
    * collapsed pre-fence rows to (group, token, count) with no id, so an
    * id-keyed request arriving after that point would silently leave the
    * erased document's tokens inside the merged counts forever. The
    * remedies are named in the error: consolidate with retainIds from the
    * start, or rebuild the layout. */
  def deleteIds(ids: DataFrame, corpusPath: String, idCol: String): Unit = {
    val spark = ids.sparkSession
    val recorded =
      LayoutMeta.readOpt(spark, corpusPath, IdColFile).map(_.trim)
    require(recorded.contains(idCol),
      s"corpus at $corpusPath does not carry id column '$idCol' " +
        s"(ingested with idCol='${recorded.getOrElse("<no layout>")}') — " +
        "an erasure request with no handle must fail loudly")
    val consolidated = batchDirs(spark, corpusPath).exists(_._1 < 0)
    if (consolidated && !retainModeOf(spark, corpusPath).exists(modeRetainsIds))
      throw new IllegalStateException(
        s"corpus at $corpusPath holds consolidated aggregates WITHOUT " +
          "document ids (consolidate ran with retainIds = false): an " +
          "id-keyed erasure cannot reach rows already merged — " +
          "consolidate with retainIds = true from the first consolidation " +
          "to keep late erasure possible, or rebuild the layout to erase " +
          "what this one already merged")
    Retention.appendTombstones(ids, corpusPath, idCol)
  }

  /** The layout's `batch=<id>` directories as (id, path string). */
  private def batchDirs(spark: SparkSession, root: String): Seq[(Long, String)] = {
    val r = new Path(root)
    val fs = r.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(r)) return Seq.empty
    fs.listStatus(r).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(s => (s.getPath.getName.drop("batch=".length).toLong,
        s.getPath.toString))
  }

  /** Merge every batch below `fence` (including earlier consolidations)
    * into one `batch=-<fence>` dir per layout — lossless by MG
    * mergeability on the summary side, exact by weighted recount on the
    * corpus side (see the object doc). The fence meta is advanced FIRST:
    * from that moment replays of covered batches are skipped, which is
    * safe whether or not the physical merge below ever completes (probe
    * reads are unaffected by the fence, and a half-done swap recovers at
    * the next entry). Idempotent; a no-op when nothing new is covered.
    * Offline-maintenance caveat: a probe running CONCURRENTLY with the
    * swap window can see a row twice ([[Compaction.replaceDirs]]).
    *
    * `retainIds = true` keeps the ingest-recorded document id in the
    * corpus aggregate — (group, token, id, count) instead of
    * (group, token, count) — so an erasure request arriving AFTER
    * consolidation still has a handle on the merged rows ([[deleteIds]]
    * refuses otherwise). The probe is bit-identical either way (summing
    * per-id weights ≡ summing the collapsed weight); the cost is aggregate
    * size following distinct (group, token, id) triples instead of
    * (group, token) pairs — for a high-churn corpus where most documents
    * contribute distinct tokens that approaches raw-corpus size, i.e.
    * consolidation stops compacting exactly where it is needed most.
    *
    * `idBuckets = B > 0` (requires `retainIds`) BOUNDS that growth: the
    * aggregate keys on the id's retention BUCKET ([[bucketOf]] —
    * hash(id) mod B) instead of the id itself, so its size is capped at
    * distinct (group, token) pairs × B regardless of churn. The trade,
    * spec-pinned: erasing one id drops its buckets' ENTIRE rows — every
    * co-bucketed document's occurrences of those (group, token) keys go
    * with it (≈ 1/B of the aggregate mass per erased bucket). Over-
    * erasure is the SAFE direction for a curation signal (tokens only
    * ever under-count, thresholds stay against ingested totals — the
    * summary-side argument in the object doc), B dials the blast radius,
    * and the loss is ONE-TIME: applied tombstones are recorded
    * ([[unappliedTombstoneFiles]]) so a dropped bucket does not keep
    * eating future co-bucketed rows. The probe remains bit-identical
    * BEFORE any erasure (summing
    * per-bucket weights ≡ summing the collapsed weight). The mode —
    * including B — is WRITE-ONCE per layout (stamped at the first
    * consolidation, drift rejected): mixing shapes would leave NULL-keyed
    * rows no erasure request could ever name. */
  def consolidate(
      spark: SparkSession,
      summaryPath: String,
      corpusPath: String,
      fence: Long,
      groupCol: String,
      tokenCol: String,
      retainIds: Boolean = false,
      idBuckets: Int = 0): Unit = {
    require(fence >= 0, s"fence must be non-negative, got $fence")
    require(idBuckets >= 0, s"idBuckets must be non-negative, got $idBuckets")
    require(idBuckets == 0 || retainIds,
      "idBuckets > 0 is a retainIds mode — bucketed retention without " +
        "retainIds = true is a misconfiguration, not a layout shape")
    if (!ready(spark, summaryPath)) return
    val idCol =
      LayoutMeta.readOpt(spark, corpusPath, IdColFile).map(_.trim).filter(_.nonEmpty)
    require(!retainIds || idCol.nonEmpty,
      s"retainIds = true but the corpus at $corpusPath was ingested " +
        "without an id column — there is nothing to retain (re-ingest " +
        "with idCol to make late erasure possible)")
    val mode =
      if (!retainIds) "agg"
      else if (idBuckets > 0) s"ids:$idBuckets"
      else "ids"
    // drift against an existing stamp is rejected loudly AT ENTRY (a
    // cadence tick configured with the wrong mode is a misconfiguration
    // even when it merges nothing); the FIRST stamp is deferred to the
    // moment a corpus aggregate is actually created (below) — a no-op
    // consolidation (nothing below the fence yet) must not lock a fresh
    // layout's retain mode forever
    retainModeOf(spark, corpusPath).foreach(m => require(m == mode,
      s"corpus at $corpusPath consolidates with retain mode '$m', " +
        s"caller asked '$mode' — the mode is fixed when the layout's " +
        "first aggregate is created (mixed aggregates would hold NULL-id " +
        "rows no erasure could name); rebuild the layout to change it"))
    // grandfathering, checked EARLY so a misconfigured retainIds call
    // cannot advance the fence / merge the summaries before throwing —
    // and re-checked post-recovery below, because recovery can
    // materialize a crashed prior consolidation's aggregate dir that
    // this pre-recovery listing cannot see
    def requireNoIdlessAggregates(): Unit =
      require(!retainIds ||
        retainModeOf(spark, corpusPath).exists(modeRetainsIds) ||
        batchDirs(spark, corpusPath).forall(_._1 >= 0),
        s"corpus at $corpusPath already holds consolidated aggregates " +
          "without ids — cannot begin retaining ids mid-layout; rebuild " +
          "the layout")
    requireNoIdlessAggregates()
    // recover any half-done swap BEFORE listing: a crash after a previous
    // swap's rename-but-before-deletes would otherwise list the target AND
    // the olds, and replaceDirs' target-not-in-olds require would throw
    // out of the very call that should be healing it
    recoverBoth(spark, summaryPath, corpusPath)
    // re-checked AFTER recovery and BEFORE the fence advance / summary
    // swap (ADVICE r14): recovery can materialize a crashed prior
    // consolidation's id-less aggregate; rejecting here keeps a pure
    // misconfiguration from advancing the fence and paying the summary
    // merge before it throws (the swap-site check below stays as the
    // backstop for listings that change under us)
    requireNoIdlessAggregates()
    val f = math.max(fence, fenceOf(spark, summaryPath))
    if (f > fenceOf(spark, summaryPath))
      // writeAtomic, not write: the fence is the one meta whose value
      // ADVANCES, so the create-with-overwrite truncate window would be a
      // real crash mode here (empty fence file → every probe and batch
      // throws until hand-repair) — see the LayoutMeta scaladoc
      LayoutMeta.writeAtomic(spark, summaryPath, FenceFile, f.toString)
    val target = s"batch=-$f"
    // a single old CONSOLIDATED dir — whether it already carries the
    // current fence's name or a previous fence's — means nothing new is
    // below the fence: re-merging one aggregate into itself under a new
    // name is a full rewrite for zero information gain, which a
    // defensive fence re-advance (or a cadence tick after an empty-batch
    // stretch) would otherwise pay on every call. Skip the IO; the meta
    // advance above is the whole operation (the dir keeps its old name
    // and merges normally once real raw batches land). Erasure exception,
    // corpus side: UNAPPLIED tombstones force the rewrite even with
    // nothing new below the fence — the rewrite IS the physical purge,
    // and skipping it would leave erased rows on disk indefinitely on a
    // layout that never sees another raw batch (probes filter them
    // logically, but a compliance deletion needs the bytes gone; calling
    // consolidate after deleteIds is the documented force-purge). Every
    // mode records the tombstone files it physically applied
    // ([[AppliedFile]]), so the forced rewrite happens ONCE per erasure,
    // not on every re-fence.
    def needsSwap(olds: Seq[(Long, String)]): Boolean =
      olds.nonEmpty && !(olds.size == 1 && olds.head._1 < 0)

    val sumOlds = batchDirs(spark, summaryPath).filter(_._1 < f)
    if (needsSwap(sumOlds)) {
      val merged = spark.read.parquet(sumOlds.map(_._2): _*)
        .groupBy(col(groupCol), col(tokenCol))
        .agg(sum(col("lower_bound")).as("lower_bound"))
      Compaction.replaceDirs(spark, new Path(summaryPath),
        sumOlds.map(d => s"batch=${d._1}"), target, merged)
    }

    val corOlds = batchDirs(spark, corpusPath).filter(_._1 < f)
    // SNAPSHOT the unapplied tombstone files before the merge — exactly
    // this set is physically dropped below and exactly this set is
    // recorded applied after the swap (a tombstone appended mid-merge
    // stays unapplied and filters at the next probe). Unapplied
    // tombstones also FORCE the rewrite (the needsSwap erasure
    // exception): this is deleteIds' physical purge.
    val pendingErasure = unappliedTombstoneFiles(spark, corpusPath)
    // the forced purge needs a fresh target name — a single old dir that
    // already carries batch=-f cannot be replaced with itself, so a
    // same-fence consolidate leaves the purge to the next fence advance
    // (the streaming cadence always advances; a maintenance purge calls
    // consolidate with fence+1 after deleteIds)
    val forcePurge = corOlds.nonEmpty && pendingErasure.nonEmpty &&
      !(corOlds.size == 1 && corOlds.head._1 == -f)
    if (needsSwap(corOlds) || forcePurge) {
      if (retainModeOf(spark, corpusPath).isEmpty) {
        // grandfathering: aggregates consolidated before a mode was
        // stamped collapsed their ids — beginning to retain mid-layout
        // would mix id-less and id-keyed rows in one aggregate (every
        // consolidated dir is negative, hence below f and in corOlds)
        require(!retainIds || corOlds.forall(_._1 >= 0),
          s"corpus at $corpusPath already holds consolidated aggregates " +
            "without ids (built before a retain mode was stamped) — " +
            "cannot begin retaining ids mid-layout; rebuild the layout")
        // meta BEFORE the swap (the capacity discipline): a crash after
        // the merged dir lands but before the stamp would let a re-run
        // with the OTHER mode pass its own drift check against dirs of
        // the first mode's shape
        LayoutMeta.write(spark, corpusPath, RetainFile, mode)
      }
      // tombstoned rows drop here, physically, while the rewrite is free.
      // Without retainIds the id column does not survive into the
      // aggregate, so this is their now-or-never exit; with retainIds the
      // aggregate keys on the id (or its retention bucket) too and stays
      // erasable afterwards.
      val carryId = if (retainIds && idBuckets == 0) idCol else None
      val carryBucket =
        if (idBuckets > 0) Some((idCol.get, idBuckets)) else None
      val keyCols = (Seq(groupCol, tokenCol) ++ carryId.toSeq).map(col) ++
        carryBucket.map(_ => col(BucketCol)).toSeq
      val merged = weightedTokens(spark, corpusPath, corOlds, groupCol,
        tokenCol, carryId, carryBucket,
        deadBucketFiles = if (idBuckets > 0) Some(pendingErasure) else None)
        .groupBy(keyCols: _*)
        .agg(sum(col(WeightCol)).as(WeightCol))
      Compaction.replaceDirs(spark, new Path(corpusPath),
        corOlds.map(d => s"batch=${d._1}"), target, merged)
      // every mode records: "applied" means PHYSICALLY purged from the
      // dirs this rewrite replaced (plain-ids and id-less modes still
      // filter probes by ALL tombstones — the record only keeps the
      // needsSwap erasure exception from re-forcing a rewrite per fence
      // tick after the bytes are already gone)
      recordApplied(spark, corpusPath, pendingErasure)
    }
    ()
  }

  private def recoverBoth(spark: SparkSession,
      summaryPath: String, corpusPath: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    Seq(summaryPath, corpusPath).foreach { p =>
      val root = new Path(p)
      val fs = root.getFileSystem(conf)
      if (fs.exists(root)) {
        Compaction.recoverRoot(fs, root)
        Compaction.leafDirs(fs, root).foreach(d => Compaction.recoverDir(fs, d))
      }
    }
  }

  /** The token corpus as ONE weighted (group, token [, id], weight) frame:
    * raw batch dirs at weight 1 — tombstone-filtered, the erasure
    * contract — unioned with consolidated aggregates' carried counts.
    * Consolidated dirs are tombstone-filtered too WHEN the layout retains
    * ids (`retainIds` consolidation — late erasure reaches the merged
    * rows on the very next probe); id-less aggregates pass through as-is,
    * which is why [[deleteIds]] refuses on such layouts. `carryId` keeps
    * the id column in the output ([[consolidate]]'s retained merge needs
    * it as a grouping key; the probe recount does not). The single
    * definition [[probe]]'s recount and [[consolidate]]'s merge both
    * consume, so their tombstone/weight semantics can never diverge
    * (consolidation must stay bit-identical to the probe). */
  private def weightedTokens(spark: SparkSession, corpusPath: String,
      dirs: Seq[(Long, String)], groupCol: String, tokenCol: String,
      carryId: Option[String] = None,
      carryBucket: Option[(String, Int)] = None,
      deadBucketFiles: Option[Vector[String]] = None): DataFrame = {
    // reachable: a replayed ONLY batch crashing mid-overwrite deletes its
    // corpus dir before rewriting it while the summary dirs survive — give
    // the crash-window contract message, not an opaque empty.reduce
    require(dirs.nonEmpty,
      s"token corpus at $corpusPath holds no committed batches (replay " +
        "crash window or empty layout) — replay the batch before probing")
    require(carryId.isEmpty || carryBucket.isEmpty,
      "internal: at most one of carryId/carryBucket")
    val (cons, raw) = dirs.partition(_._1 < 0)
    val idCols = carryId.map(col).toSeq
    val bucketCols = carryBucket.map(_ => col(BucketCol)).toSeq
    val rawT = if (raw.isEmpty) None else {
      val live = Retention.filterLive(spark, corpusPath,
        spark.read.parquet(raw.map(_._2): _*))
      // raw rows carry the id; the bucket is derived here (consolidated
      // rows carry it as a stored column)
      val bucketed = carryBucket match {
        case Some((idc, b)) => live.withColumn(BucketCol, bucketOf(col(idc), b))
        case None => live
      }
      Some(bucketed.select(Seq(col(groupCol), col(tokenCol)) ++ idCols ++
        bucketCols :+ lit(1L).as(WeightCol): _*))
    }
    val consT = if (cons.isEmpty) None else {
      val read = spark.read.parquet(cons.map(_._2): _*)
      val live = retainModeOf(spark, corpusPath) match {
        case Some("ids") => Retention.filterLive(spark, corpusPath, read)
        case Some(m) if bucketsOf(m).nonEmpty =>
          // bucketed aggregates hold no ids: erasure drops every row in a
          // tombstoned id's bucket — the documented one-time over-erasure
          // (unapplied tombstones only; see unappliedTombstoneFiles)
          filterDeadBuckets(spark, read, bucketsOf(m).get,
            deadBucketFiles.getOrElse(unappliedTombstoneFiles(spark, corpusPath)))
        case _ => read
      }
      Some(live.select(Seq(col(groupCol), col(tokenCol)) ++ idCols ++
        bucketCols :+ col(WeightCol): _*))
    }
    (rawT.toSeq ++ consT.toSeq).reduce(_ unionByName _)
  }

  /** Tombstone files whose bucket-drop has NOT yet been applied to the
    * consolidated aggregate. Bucket erasure must be ONE-TIME: tombstones
    * persist forever (post-fence raw batches may still carry the erased
    * id, and the exact id-level filter needs them), but once a
    * consolidation has physically dropped a tombstone's buckets, keeping
    * the bucket filter live would silently eat every FUTURE co-bucketed
    * document's rows too — over-erasure growing without bound instead of
    * the documented one-time ≤1/B loss. [[consolidate]] records the
    * tombstone files it applied ([[AppliedFile]], advancing meta); probes
    * and merges filter by the unapplied remainder only. A crash between
    * the swap and the record leaves the files unapplied — probes
    * over-filter already-dropped buckets (a no-op) until the next
    * consolidation re-applies and records. */
  private def unappliedTombstoneFiles(spark: SparkSession,
      corpusPath: String): Vector[String] = {
    val all = Retention.tombstoneFiles(spark, corpusPath)
    if (all.isEmpty) return Vector.empty
    val applied = LayoutMeta.readAtomicOpt(spark, corpusPath, AppliedFile)
      .map(_.split("\n").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    all.filterNot(f => applied(baseName(f)))
  }

  private def baseName(path: String): String =
    path.substring(path.lastIndexOf('/') + 1)

  /** Record tombstone files as bucket-applied: union with the previous
    * record, pruned to files that still exist (keeps the meta bounded if
    * the tombstone dir is ever cleared). */
  private def recordApplied(spark: SparkSession, corpusPath: String,
      appliedNow: Vector[String]): Unit = {
    if (appliedNow.isEmpty) return
    val prev = LayoutMeta.readAtomicOpt(spark, corpusPath, AppliedFile)
      .map(_.split("\n").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    val current = Retention.tombstoneFiles(spark, corpusPath)
      .map(baseName).toSet
    val merged = (prev ++ appliedNow.map(baseName)).intersect(current)
    LayoutMeta.writeAtomic(spark, corpusPath, AppliedFile,
      merged.toSeq.sorted.mkString("\n"))
  }

  /** Anti-join away every consolidated row whose retention bucket matches
    * an UNAPPLIED tombstoned id's bucket — the bucketed layout's erasure
    * contract (co-bucketed survivors' already-merged occurrences go with
    * it; dial `idBuckets` to bound the blast radius). The bucket set is
    * ≤ the tombstone count and ≤ B — always tiny. */
  private def filterDeadBuckets(spark: SparkSession, df: DataFrame,
      buckets: Int, tombstoneFiles: Vector[String]): DataFrame =
    if (tombstoneFiles.isEmpty) df
    else {
      val ts = spark.read.parquet(tombstoneFiles: _*)
      val idc = ts.columns.head
      val dead = ts
        .select(bucketOf(col(idc), buckets).as("__graft_dead_hb")).distinct()
      df.join(dead, df(BucketCol) === col("__graft_dead_hb"), "left_anti")
    }

  /** Exact per-group heavy hitters over EVERYTHING ingested so far:
    * merged persisted summaries → per-group provable prune → exact
    * recount against the accumulated token corpus (raw batches at weight
    * 1 unioned with consolidated (group, token, count) aggregates — the
    * weighted recount, bit-identical to recounting the raw stream).
    * Hash-equal to running [[HeavyHitters.heavyHittersByGroup]] over the
    * concatenated batches (mergeability, see the object doc), minus any
    * tombstoned documents' rows ([[deleteIds]]). Recovers half-done
    * consolidation swaps and dir rewrites at entry, so a crashed
    * maintenance pass can never double-count. */
  def probe(
      spark: SparkSession,
      summaryPath: String,
      corpusPath: String,
      groupCol: String,
      tokenCol: String,
      denominator: Long): DataFrame = {
    val capacity = capacityOf(spark, summaryPath)
    recoverBoth(spark, summaryPath, corpusPath)
    require(batchDirs(spark, summaryPath).nonEmpty,
      s"summary layout at $summaryPath holds no committed batches " +
        "(meta-first crash window or empty layout)")
    val summaries = spark.read.parquet(summaryPath)
      .select(col(groupCol), col(tokenCol), col("lower_bound"))
    val tokens = weightedTokens(spark, corpusPath,
      batchDirs(spark, corpusPath), groupCol, tokenCol)
    HeavyHitters.heavyHittersByGroupFromSummaries(summaries, tokens,
      groupCol, tokenCol, denominator, capacity,
      weightCol = Some(WeightCol))
  }
}
