package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delete-by-predicate with index-safe semantics for the streaming corpus
  * sinks — the retention story a long-running ingest deployment needs
  * (GDPR erasure, license takedowns, age-out policies) once a corpus
  * accumulates for months.
  *
  * The design is tombstone + vacuum, the production split between logical
  * and physical delete:
  *
  *   - **Logical delete now**: [[deleteWhere]]/[[deleteIds]] append the
  *     doomed ids to an underscore-prefixed tombstone directory inside
  *     the corpus layout (invisible to plain parquet readers — the same
  *     Spark visibility rule the layouts' metadata files ride).
  *     [[graft.sources.BucketedCorpus.readAll]]/`readForIds` anti-join
  *     the tombstones, so every downstream read — including the ingest
  *     loops' exact-verify probes — stops seeing the rows IMMEDIATELY,
  *     at the cost of one bounded anti-join (zero when no tombstones
  *     exist). No index rewrite is needed for correctness: a dead
  *     corpus row's postings become orphans, and orphan postings are
  *     already harmless by the ingest loops' crash-window contract (a
  *     candidate that cannot verify against a live corpus row confirms
  *     nothing).
  *   - **Physical delete at maintenance time**: [[vacuum]] rewrites ONLY
  *     the bucket directories the tombstoned ids hash into (the same
  *     pruning the probes use — dead ids → ≤ buckets dirs), dropping
  *     dead rows under [[Compaction]]'s crash-safe temp/marker/manifest
  *     discipline, then clears the tombstones. A crash anywhere
  *     converges: half-rewritten dirs recover at the next maintenance
  *     entry, and tombstones outliving their rows anti-join to nothing.
  *
  * Deletion predicates follow SQL semantics: a row is deleted when the
  * predicate is TRUE (not NULL), so `col("lang") === "en"` never deletes
  * NULL-lang rows. */
object Retention {

  private[graft] val TombstoneDir = "_graft_tombstones"

  private def tombstonePath(corpusPath: String): String =
    s"$corpusPath/$TombstoneDir"

  /** The current tombstone data files — the one definition of "what is a
    * tombstone file" ([[hasTombstones]], [[tombstones]], and [[vacuum]]'s
    * entry snapshot all go through it). Listed through the LAYOUT's
    * filesystem ([[LayoutMeta]]): erasure correctness must not depend on
    * the driver's local disk when the corpus lives on an object store. */
  private[graft] def tombstoneFiles(spark: SparkSession, corpusPath: String): Vector[String] =
    LayoutMeta.listFiles(spark, tombstonePath(corpusPath), _.endsWith(".parquet"))

  private def readTombstones(spark: SparkSession,
      files: Seq[String], idCol: String): DataFrame =
    spark.read.parquet(files: _*)
      .select(col(idCol)).distinct()

  /** True if any ids are currently tombstoned (logically deleted but not
    * yet vacuumed). */
  def hasTombstones(spark: SparkSession, corpusPath: String): Boolean =
    tombstoneFiles(spark, corpusPath).nonEmpty

  /** [[hasTombstones]] via the active session (see [[LayoutMeta]]'s
    * session note). */
  def hasTombstones(corpusPath: String): Boolean =
    hasTombstones(SparkSession.active, corpusPath)

  /** The tombstoned id set (single column named `idCol`), empty-safe. */
  def tombstones(spark: SparkSession, corpusPath: String, idCol: String): Option[DataFrame] = {
    val files = tombstoneFiles(spark, corpusPath)
    if (files.isEmpty) None else Some(readTombstones(spark, files, idCol))
  }

  /** Logically delete the given ids: append them to the tombstone set.
    * `ids` is a single-column frame of the corpus id column's name and
    * type. Idempotent — re-deleting an id (or a replayed delete batch)
    * only adds duplicate tombstone rows, which [[tombstones]] distincts
    * away. */
  def deleteIds(ids: DataFrame, corpusPath: String, idCol: String): Unit = {
    // public API, same misconfiguration guard as deleteWhere: an erasure
    // job pointed at a mistyped or unmounted path must fail loudly, not
    // "succeed" into a fresh tombstone dir nobody will ever read
    require(BucketedCorpus.ready(ids.sparkSession, corpusPath),
      s"no BucketedCorpus layout at $corpusPath (missing bucket metadata) — " +
        "refusing to tombstone against a path with no layout")
    appendTombstones(ids, corpusPath, idCol)
  }

  /** The tombstone APPEND itself, usable by non-[[BucketedCorpus]] layouts
    * that carry their own readiness guard (the heavy-hitters token corpus —
    * [[graft.streaming.IngestHeavyHitters.deleteIds]]). Callers outside
    * this file must wrap it in their layout's misconfiguration check. */
  private[graft] def appendTombstones(
      ids: DataFrame, layoutPath: String, idCol: String): Unit = {
    ids.select(col(idCol))
      .write.mode("append").parquet(tombstonePath(layoutPath))
    ()
  }

  /** UNDO a logical delete: remove `ids` from the tombstone set, making
    * any still-physical rows visible again and allowing the ids to be
    * re-ingested. The answer to "a user re-consents / a document's new
    * version arrives after an erasure" — without it, a tombstoned id
    * stays deleted until a vacuum clears the tombstones, and re-appended
    * content is indistinguishable from the dead rows. Semantics:
    *   - rows not yet vacuumed become LIVE again (the tombstone was the
    *     only thing hiding them);
    *   - rows already vacuumed are gone — reinstating just lifts the
    *     id-keyed block so a fresh append is visible;
    *   - index postings already reclaimed by [[vacuumPostings]] are NOT
    *     restored: the corpus row is live again (and the exact-verify
    *     reads see it), but it no longer surfaces as an index CANDIDATE —
    *     if the postings were reclaimed, re-append the content through
    *     the ingest loop (which re-indexes on append) or rebuild the
    *     index. Reinstate alone fully restores a document only while its
    *     postings still exist (orphan postings are kept precisely so the
    *     usual erasure flow — tombstone now, reclaim at maintenance —
    *     stays reversible until the maintenance pass runs).
    * Crash-ordered via [[replaceTombstoneSnapshot]] (the
    * [[clearCoveredTombstones]] discipline): the surviving tombstones are
    * re-appended FIRST, the entry snapshot's files deleted LAST — a crash
    * leaves duplicate tombstones (distinct'd on read), never a lost
    * erasure. Ids deleted CONCURRENTLY land in files outside the snapshot
    * and stay deleted; a concurrent delete of an id being reinstated
    * resolves to deleted (its tombstone file is not in this snapshot).
    * Returns the number of ids removed from the snapshot's tombstone
    * set. */
  def reinstate(ids: DataFrame, corpusPath: String, idCol: String,
      broadcastLimit: Long = 4000000L): Long = {
    val spark = ids.sparkSession
    require(BucketedCorpus.ready(spark, corpusPath),
      s"no BucketedCorpus layout at $corpusPath (missing bucket metadata) — " +
        "refusing to reinstate against a path with no layout")
    val snapshot = tombstoneFiles(spark, corpusPath)
    if (snapshot.isEmpty) return 0L
    val ts = readTombstones(spark, snapshot, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // unlike deleteIds' erasure sets, a reinstate can be BULK (a mass
      // re-consent) — gate the broadcast on the lift set's size instead
      // of assuming it, the HeavyHitters candidate-gate pattern: small
      // sets take the broadcast anti-join, anything larger falls back to
      // the shuffled anti-join rather than collecting onto the driver
      val lift = ids.select(col(idCol).as("__graft_lift_id")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val small = lift.count() <= broadcastLimit
        val remainder = ts.join(if (small) broadcast(lift) else lift,
          col(idCol) === col("__graft_lift_id"), "left_anti")
        val total = ts.count()
        replaceTombstoneSnapshot(spark, corpusPath, snapshot,
          remainder, idCol, total)
      } finally { lift.unpersist(); () }
    } finally { ts.unpersist(); () }
  }

  /** The snapshot-replacement tail shared by [[reinstate]] and
    * [[clearCoveredTombstones]] — ONE copy of the crash ordering: persist
    * and count the remainder, re-append it FIRST (a crash leaves
    * duplicate tombstones, distinct'd on read), delete exactly the
    * snapshot's files LAST. Returns how many ids the snapshot lost.
    * No-op (returns 0) when the remainder equals the snapshot. */
  private def replaceTombstoneSnapshot(spark: SparkSession,
      corpusPath: String, snapshotFiles: Seq[String],
      remainder: DataFrame, idCol: String, snapshotCount: Long): Long = {
    val rem = remainder
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kept = rem.count()
      val removed = snapshotCount - kept
      if (removed == 0) return 0L
      if (kept > 0) appendTombstones(rem, corpusPath, idCol)
      val fs = new Path(corpusPath).getFileSystem(
        spark.sessionState.newHadoopConf())
      snapshotFiles.foreach(f => fs.delete(new Path(f), false))
      removed
    } finally { rem.unpersist(); () }
  }

  /** Logically delete every LIVE corpus row matching `predicate` (one
    * corpus scan — the cost of any DELETE WHERE). Returns the number of
    * newly tombstoned ids; 0 without touching anything when the layout is
    * ready but holds no committed data yet (the meta-first crash window —
    * there is nothing a delete could match). A path with NO layout at all
    * fails loudly: an erasure job pointed at a typo'd or unmounted path
    * must surface the misconfiguration, not report success. */
  def deleteWhere(spark: SparkSession, corpusPath: String,
      predicate: Column, idCol: String): Long = {
    require(BucketedCorpus.ready(spark, corpusPath),
      s"no BucketedCorpus layout at $corpusPath (missing bucket metadata) — " +
        "refusing to silently skip a delete against a mistyped path")
    if (!BucketedCorpus.hasData(spark, corpusPath)) return 0L
    val doomed = BucketedCorpus.readAll(spark, corpusPath)
      .where(predicate).select(col(idCol)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = doomed.count()
      if (n > 0) deleteIds(doomed, corpusPath, idCol)
      n
    } finally { doomed.unpersist(); () }
  }

  /** Anti-join `df` against the corpus's tombstones — the filter every
    * [[BucketedCorpus]] read applies. The id column is the tombstone
    * set's own (single) column, so callers need not thread it through;
    * zero-cost when no tombstones exist. */
  def filterLive(spark: SparkSession, corpusPath: String, df: DataFrame): DataFrame =
    if (!hasTombstones(spark, corpusPath)) df
    else {
      val ts = spark.read.parquet(tombstonePath(corpusPath))
      val idc = ts.columns.head
      df.join(ts.select(col(idc).as("__graft_dead_id")).distinct(),
        df(idc) === col("__graft_dead_id"), "left_anti")
    }

  /** Physically remove tombstoned rows and clear the tombstones. Only the
    * bucket directories the dead ids hash into are rewritten (computed
    * from the tombstone set — ≤ the layout's bucket count, driver-safe),
    * each under [[Compaction]]'s crash-safe discipline; untouched buckets
    * keep their files byte-identical. Returns the rewritten directories.
    * Crash-safe end to end: tombstones are cleared LAST, so a crash
    * mid-vacuum leaves rows that are still tombstone-filtered on read and
    * get dropped by the next vacuum. */
  def vacuum(spark: SparkSession, corpusPath: String, idCol: String): Seq[String] = {
    // SNAPSHOT the tombstone files at entry: the whole pass — bucket
    // derivation, every per-dir anti-join, and the final clear — must see
    // ONE id set. A lazy read of the directory would let ids deleted
    // mid-vacuum leak into later buckets but not earlier ones, and a
    // wholesale directory delete at the end would silently DISCARD them —
    // permanently resurrecting concurrently-erased rows. Tombstones
    // appended after this snapshot survive untouched for the next vacuum.
    val snapshot = tombstoneFiles(spark, corpusPath)
    if (snapshot.isEmpty) return Seq.empty
    val ts = readTombstones(spark, snapshot, idCol)
    val buckets = BucketedCorpus.bucketsOf(spark, corpusPath)
    // the writer's own routing hash — vacuum must never disagree with
    // append/readForIds about where an id's rows live
    val wanted = ts
      .select(BucketedCorpus.bucketOf(col(idCol), buckets).as("cb"))
      .distinct().collect().map(_.getLong(0)).toSet
    val dead = broadcast(ts.withColumnRenamed(idCol, "__graft_dead_id"))
    val root = new Path(corpusPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // recover EVERY leaf (not just the touched set): this pass clears the
    // layout's maintenance marker on success, which asserts "no crashed
    // manifest remains anywhere" to the readers' fast path — an untouched
    // dir's stale manifest must not outlive that claim
    val leaves = Compaction.leafDirs(fs, root)
    leaves.foreach(d => Compaction.recoverDir(fs, d))
    val touched = leaves.filter { d =>
      val n = d.getName
      n.startsWith(BucketedCorpus.BucketCol + "=") &&
        wanted.contains(n.drop(BucketedCorpus.BucketCol.length + 1).toLong)
    }
    if (touched.nonEmpty) Compaction.markMaintenance(fs, root)
    val rewritten = touched.flatMap { dir =>
      val files = Compaction.dataFiles(fs, dir)
      if (files.isEmpty) None
      else {
        val live = spark.read.parquet(files.map(_.getPath.toString): _*)
          .join(dead, col(idCol) === col("__graft_dead_id"), "left_anti")
        Compaction.rewriteDir(spark, fs, dir, files, live, targetFiles = 1)
        Some(dir.toString)
      }
    }
    Compaction.clearMaintenance(fs, root)
    // clear LAST, and only the snapshot's own files: a crash above leaves
    // tombstones that still filter reads; concurrent deletes stay queued.
    // Deletes go through the Hadoop filesystem so checksum twins (.crc on
    // local FS) die with their parquet. The tombstone DIRECTORY is never
    // recursively deleted — a check-then-rmdir here would race a
    // concurrent deleteIds (its freshly landed files, or its in-flight
    // job's _temporary dir) and silently destroy an erasure request
    // forever. Only the snapshot's files and the job-commit _SUCCESS
    // sidecar (rewritten by every append, read by nobody) go; an empty
    // directory shell costs one LIST and nothing else.
    snapshot.foreach(f => fs.delete(new Path(f), false))
    fs.delete(new Path(tombstonePath(corpusPath), "_SUCCESS"), false)
    rewritten
  }

  /** Clear the tombstones that a tombstone-aware compaction pass
    * ([[BucketedCorpus.compact]]) just made PHYSICALLY true: an id whose
    * bucket directory was rewritten through the snapshot anti-join has no
    * rows left anywhere (an id's rows live only in its bucket), so its
    * tombstone is spent. Ids in the snapshot whose buckets were NOT
    * rewritten stay queued — re-appended as a fresh tombstone file before
    * the snapshot files are deleted, so a crash anywhere leaves at worst
    * duplicate tombstones (distinct'd on read), never a lost erasure.
    * `snapshotFiles` must be the exact tombstone files whose ids the
    * compaction filtered with (the caller snapshots BEFORE compacting);
    * concurrent deletes land in files outside the snapshot and are
    * untouched. */
  private[sources] def clearCoveredTombstones(spark: SparkSession,
      corpusPath: String, snapshotFiles: Seq[String],
      rewrittenDirs: Seq[String]): Unit = {
    if (snapshotFiles.isEmpty || rewrittenDirs.isEmpty) return
    val rewrittenBuckets = rewrittenDirs.flatMap { d =>
      val n = new Path(d).getName
      if (n.startsWith(BucketedCorpus.BucketCol + "="))
        Some(n.drop(BucketedCorpus.BucketCol.length + 1).toLong)
      else None
    }.toSet
    if (rewrittenBuckets.isEmpty) return
    val ts = spark.read.parquet(snapshotFiles: _*)
    val idc = ts.columns.head
    val buckets = BucketedCorpus.bucketsOf(spark, corpusPath)
    val remainder = ts.select(col(idc)).distinct()
      .where(!BucketedCorpus.bucketOf(col(idc), buckets)
        .isin(rewrittenBuckets.toSeq: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // remainder FIRST, snapshot deletes LAST (crash ⇒ duplicates, not loss)
      if (remainder.count() > 0) appendTombstones(remainder, corpusPath, idc)
      val fs = new Path(corpusPath).getFileSystem(
        spark.sessionState.newHadoopConf())
      snapshotFiles.foreach(f => fs.delete(new Path(f), false))
    } finally { remainder.unpersist(); () }
  }

  /** Physically drop the POSTINGS of erased ids from a persisted index
    * layout (MinHash `pfx=`, phash/video `bp=`, LSH `tp=`, trigram
    * `bucket=` — any leaf-partitioned postings dir whose rows carry the
    * id in `idCol`). Orphan postings are correctness-harmless by the
    * probe contract (they can never verify against a live corpus row),
    * so this is a WEIGHT reclaim, not a correctness pass — run it in the
    * maintenance window alongside compaction once erased mass is worth
    * the rewrite. Unlike [[vacuum]], postings of one id live in MANY
    * partitions (one per band/table/block) with no id-derived directory
    * scheme shared across layouts, so the touched set is DISCOVERED with
    * one cheap read-only pass — the id column of the whole index,
    * semi-joined against the dead set, collecting the distinct files that
    * still hold dead postings (bounded by the erasure set's posting
    * spread) — and only THEIR directories are rewritten under the
    * crash-safe discipline; untouched dirs keep their files
    * byte-identical. `deadIds` is broadcast (erasure sets are small
    * relative to the corpus — for bulk age-out, rebuild the index
    * instead). Returns the rewritten directories. */
  def vacuumPostings(spark: SparkSession, indexPath: String,
      deadIds: DataFrame, idCol: String): Seq[String] = {
    // localCheckpoint cuts the dead set's lineage to an in-memory RDD:
    // the discovery pass below evaluates input_file_name(), which Spark
    // rejects when MORE THAN ONE file source feeds the plan — a dead set
    // that arrives as a parquet read (an erasure job's id list usually
    // does) would otherwise fail the whole vacuum. Materializing is free
    // by contract: erasure sets are broadcast-small.
    val dead = broadcast(
      deadIds.select(col(deadIds.columns.head).as("__graft_dead_id")).distinct()
        .localCheckpoint(true))
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val leaves = Compaction.leafDirs(fs, root)
    leaves.foreach(d => Compaction.recoverDir(fs, d))
    // an index root that exists but holds no committed data (writer
    // crashed pre-commit, or a rollback emptied it) has nothing to vacuum
    // and no schema to infer — return instead of crashing the pass
    if (!leaves.exists(d => Compaction.dataFiles(fs, d).nonEmpty))
      return Seq.empty
    // read-only discovery pass: which files still hold dead postings?
    // (column-pruned to the id column — a tiny fraction of a rewrite).
    // Both sides of the directory match are fs-QUALIFIED Hadoop paths —
    // comparing decoded URI strings against on-disk names diverges on
    // escapable partition values and would silently skip rewrites.
    val idx = spark.read.parquet(indexPath)
    val hitDirs = idx
      .join(dead, idx(idCol) === col("__graft_dead_id"), "left_semi")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).filter(_.nonEmpty)
      .map(s => fs.makeQualified(new Path(s).getParent).toString).toSet
    leaves.filter(d => hitDirs.contains(fs.makeQualified(d).toString))
      .flatMap { dir =>
        val files = Compaction.dataFiles(fs, dir)
        if (files.isEmpty) None
        else {
          val rows = spark.read.parquet(files.map(_.getPath.toString): _*)
          val live = rows.join(dead,
            rows(idCol) === col("__graft_dead_id"), "left_anti")
          Compaction.rewriteDir(spark, fs, dir, files, live, targetFiles = 1)
          Some(dir.toString)
        }
      }
  }
}
