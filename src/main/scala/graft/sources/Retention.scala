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

  private def tombstonePath(corpusPath: String) =
    java.nio.file.Paths.get(corpusPath, TombstoneDir)

  /** The current tombstone data files — the one definition of "what is a
    * tombstone file" ([[hasTombstones]], [[tombstones]], and [[vacuum]]'s
    * entry snapshot all go through it). */
  private def tombstoneFiles(corpusPath: String): Vector[java.nio.file.Path] = {
    val p = tombstonePath(corpusPath)
    if (!java.nio.file.Files.isDirectory(p)) return Vector.empty
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toVector
    finally s.close()
  }

  private def readTombstones(spark: SparkSession,
      files: Seq[java.nio.file.Path], idCol: String): DataFrame =
    spark.read.parquet(files.map(_.toString): _*)
      .select(col(idCol)).distinct()

  /** True if any ids are currently tombstoned (logically deleted but not
    * yet vacuumed). */
  def hasTombstones(corpusPath: String): Boolean =
    tombstoneFiles(corpusPath).nonEmpty

  /** The tombstoned id set (single column named `idCol`), empty-safe. */
  def tombstones(spark: SparkSession, corpusPath: String, idCol: String): Option[DataFrame] = {
    val files = tombstoneFiles(corpusPath)
    if (files.isEmpty) None else Some(readTombstones(spark, files, idCol))
  }

  /** Logically delete the given ids: append them to the tombstone set.
    * `ids` is a single-column frame of the corpus id column's name and
    * type. Idempotent — re-deleting an id (or a replayed delete batch)
    * only adds duplicate tombstone rows, which [[tombstones]] distincts
    * away. */
  def deleteIds(ids: DataFrame, corpusPath: String, idCol: String): Unit = {
    ids.select(col(idCol))
      .write.mode("append").parquet(tombstonePath(corpusPath).toString)
    ()
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
    require(BucketedCorpus.ready(corpusPath),
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
    if (!hasTombstones(corpusPath)) df
    else {
      val ts = spark.read.parquet(tombstonePath(corpusPath).toString)
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
    val snapshot = tombstoneFiles(corpusPath)
    if (snapshot.isEmpty) return Seq.empty
    val ts = readTombstones(spark, snapshot, idCol)
    val buckets = BucketedCorpus.bucketsOf(corpusPath)
    // the writer's own routing hash — vacuum must never disagree with
    // append/readForIds about where an id's rows live
    val wanted = ts
      .select(BucketedCorpus.bucketOf(col(idCol), buckets).as("cb"))
      .distinct().collect().map(_.getLong(0)).toSet
    val dead = broadcast(ts.withColumnRenamed(idCol, "__graft_dead_id"))
    val root = new Path(corpusPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val touched = Compaction.leafDirs(fs, root).filter { d =>
      val n = d.getName
      n.startsWith(BucketedCorpus.BucketCol + "=") &&
        wanted.contains(n.drop(BucketedCorpus.BucketCol.length + 1).toLong)
    }
    touched.foreach(d => Compaction.recoverDir(fs, d))
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
    // clear LAST, and only the snapshot's own files: a crash above leaves
    // tombstones that still filter reads; concurrent deletes stay queued.
    // Deletes go through the Hadoop filesystem so checksum twins (.crc on
    // local FS) die with their parquet; once no tombstone remains, the
    // directory and its write sidecars (_SUCCESS) go too — otherwise
    // months of delete/vacuum cycles leak orphan metadata files.
    snapshot.foreach(f => fs.delete(new Path(f.toString), false))
    if (!hasTombstones(corpusPath))
      fs.delete(new Path(corpusPath, TombstoneDir), true)
    rewritten
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
    val dead = broadcast(
      deadIds.select(col(deadIds.columns.head).as("__graft_dead_id")).distinct())
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
