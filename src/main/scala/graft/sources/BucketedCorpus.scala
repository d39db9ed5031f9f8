package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed corpus sink for the streaming ingest loops — the layout
  * that makes the per-batch exact-verify read PRUNABLE.
  *
  * The problem it solves: a plain `.write.mode("append").parquet(path)`
  * corpus gives the probe's exact-verification join no partition or file
  * pruning handle on id, so every micro-batch pays a full map-side scan of
  * the accumulated corpus — a 100 TB read per minute once the corpus IS
  * 100 TB, the one term that made [[graft.streaming.IngestDedup]] /
  * [[graft.streaming.IngestLsh]] unsustainable under an unbounded stream.
  *
  * The layout: rows land dir-partitioned on
  * `__graft_cb = pmod(xxhash64(id), buckets)` — the trigram-index
  * `bucket=` discipline applied to the corpus itself. A probe that needs
  * the payloads of a bounded candidate-id set computes those ids' buckets
  * (≤ `buckets` distinct values, driver-safe by construction) and reads
  * ONLY those partition directories ([[readForIds]]); the scan cost
  * follows the candidate count, not the corpus. The bucket count rides the
  * layout in [[MetaFile]], so appends and reads can never disagree on the
  * hash scheme; `xxhash64` is over the id column's SPARK type, so writer
  * and prober must present ids with the same type (they do — the probe's
  * candidate ids come from index postings written from the same column).
  *
  * Bucketed dirs are exactly the leaf-dir shape
  * [[Compaction.compactLeafPartitions]] handles, so the same crash-safe
  * maintenance pass that bounds the INDEX file counts bounds the corpus
  * sink's too — a year-long stream compacts to ≤ `buckets` files instead
  * of one file per micro-batch forever.
  */
object BucketedCorpus {

  private[graft] val MetaFile = "_graft_corpus_buckets"
  private[graft] val SchemaFile = "_graft_corpus_schema"
  private[graft] val BucketCol = "__graft_cb"

  /** The schema stamp recorded in the layout meta: order-insensitive
    * (parquet reads resolve columns BY NAME, so a reordered append is
    * harmless) but name- and type-exact. */
  private def schemaStamp(df: DataFrame): Seq[String] =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.catalogString}")
      .sorted.toSeq

  /** The bucket-routing hash — ONE definition shared by the writer
    * ([[append]]), the pruned reads ([[readForIds]]), and
    * [[Retention.vacuum]]'s touched-bucket derivation, so the three can
    * never disagree on where an id's rows live. */
  private[sources] def bucketOf(id: Column, buckets: Int): Column =
    pmod(xxhash64(id), lit(buckets.toLong))

  /** Append one batch, creating the layout (and its bucket-count metadata)
    * on first write. Appends with a drifting bucket count are rejected —
    * a different modulus would silently route probe reads to the wrong
    * directories.
    *
    * The metadata file is written BEFORE the data commit: the first
    * batch's crash windows must all leave a state whose replay converges.
    * Meta-first, a crash before the data job commits leaves a layout that
    * is [[ready]] but holds no data files ([[hasData]] false — the ingest
    * loops skip the probe and the replay appends exactly once); the
    * reverse order would leave COMMITTED data invisible to `ready`, so a
    * replay's probe would be skipped and the rows appended twice,
    * permanently. (Parquet job commits are atomic at job granularity —
    * uncommitted task output stays under `_temporary`, which every reader
    * here ignores.) */
  def append(df: DataFrame, path: String, idCol: String, buckets: Int): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = df.sparkSession
    if (LayoutMeta.exists(spark, path, MetaFile)) {
      val b = bucketsOf(spark, path)
      require(b == buckets,
        s"corpus at $path was written with buckets=$b, append requested $buckets")
    } else {
      LayoutMeta.write(spark, path, MetaFile, buckets.toString)
    }
    // Schema-drift guard — the bucket-count discipline extended to the
    // column set: a parquet append with a DIFFERENT schema "succeeds" and
    // creates a mixed-schema layout whose later reads resolve arbitrarily
    // (columns silently dropped or nulled depending on which footer wins
    // the inference), so reject it at the door, naming the diff. Layouts
    // created before the guard existed have no schema meta: record it on
    // the next append instead of rejecting them.
    val stamp = schemaStamp(df)
    LayoutMeta.readOpt(spark, path, SchemaFile) match {
      case Some(recorded) =>
        val rec = recorded.linesIterator.filter(_.nonEmpty).toSeq
        if (rec != stamp) {
          val missing = rec.diff(stamp)
          val extra = stamp.diff(rec)
          throw new IllegalArgumentException(
            s"corpus at $path schema drift — layout has [${rec.mkString(", ")}]; " +
              s"append ${
                Seq(
                  if (missing.nonEmpty) s"lacks [${missing.mkString(", ")}]" else "",
                  if (extra.nonEmpty) s"adds [${extra.mkString(", ")}]" else ""
                ).filter(_.nonEmpty).mkString(" and ")
              }")
        }
      case None =>
        LayoutMeta.write(spark, path, SchemaFile, stamp.mkString("\n"))
    }
    df.withColumn(BucketCol, bucketOf(col(idCol), buckets))
      .write.mode("append").partitionBy(BucketCol).parquet(path)
    ()
  }

  /** True once [[append]] has recorded the layout metadata. A layout can
    * be ready with no data yet (the meta-first crash window) — probes
    * gate on `ready && hasData`. */
  def ready(spark: SparkSession, path: String): Boolean =
    LayoutMeta.exists(spark, path, MetaFile)

  /** [[ready]] via the active session — correct whenever one session owns
    * the layout (see [[LayoutMeta]]'s session note). */
  def ready(path: String): Boolean = LayoutMeta.exists(path, MetaFile)

  /** True once at least one data file is committed. Resolved through the
    * session's Hadoop configuration like every other filesystem touch
    * here — a bare Configuration would miss `spark.hadoop.*` settings
    * (object-store credentials, endpoints) and fail on exactly the
    * deployments the layout is for. */
  def hasData(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(root) && Compaction.leafDirs(fs, root)
      .exists(d => Compaction.dataFiles(fs, d).nonEmpty)
  }

  /** The bucket count a layout was written with. */
  def bucketsOf(spark: SparkSession, path: String): Int =
    LayoutMeta.read(spark, path, MetaFile).trim.toInt

  def bucketsOf(path: String): Int =
    LayoutMeta.read(path, MetaFile).trim.toInt

  /** ONE walk doing both read preconditions: finish or roll back any
    * half-done maintenance rewrite (a crashed [[Retention.vacuum]] or
    * compaction would otherwise leave every LIVE row of a bucket visible
    * twice until the next maintenance entry), and report whether any
    * committed data file exists. Folded together because reads run this
    * per call and separate recover + hasData walks would double the
    * recursive LIST cost that dominates small reads on object stores. The
    * per-leaf recovery probes run ONLY when the layout-root maintenance
    * marker is present ([[Compaction.MaintenanceMarker]] — every
    * maintenance pass sets it before its first rewrite and clears it only
    * after a full recovery walk), so the common nothing-ever-crashed read
    * pays one root stat instead of one per bucket per probe. */
  private def prepareRead(spark: SparkSession, path: String): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return false
    val leaves = Compaction.leafDirs(fs, root)
    val pending = fs.exists(
      new org.apache.hadoop.fs.Path(root, Compaction.MaintenanceMarker))
    val walked = fs.exists(
      new org.apache.hadoop.fs.Path(root, Compaction.RecoveryCleanStamp))
    // recover when a pass is (or may have crashed) pending — AND once per
    // layout when its history predates the marker discipline (a
    // pre-marker crashed rewrite has a manifest but no marker; skipping
    // it would double-count that bucket's rows on every read forever)
    if (pending || !walked) {
      leaves.foreach(d => Compaction.recoverDir(fs, d))
      // best-effort: the stamp is a pure optimization, and this is a READ
      // path — a read-only principal (a consumer credential on an object
      // store) must not start failing reads because it cannot write the
      // stamp; it just walks again next time
      if (!walked) try {
        val st = fs.create(new org.apache.hadoop.fs.Path(
          root, Compaction.RecoveryCleanStamp), true)
        st.close()
      } catch { case _: java.io.IOException | _: SecurityException => () }
    }
    leaves.exists(d => Compaction.dataFiles(fs, d).nonEmpty)
  }

  /** Tombstone-aware small-file compaction for corpus sinks — what the
    * ingest loops run on their cadence. Identical to
    * [[Compaction.compactLeafPartitions]] except that rows of ids
    * tombstoned at ENTRY (a file snapshot, the [[Retention.vacuum]]
    * discipline) are dropped while each over-threshold bucket is being
    * rewritten anyway — vacuum-for-free on the ingest cadence — and the
    * tombstones those rewrites made physically true are cleared
    * ([[Retention.clearCoveredTombstones]]); ids whose buckets stayed
    * under the threshold remain queued for the next pass or an explicit
    * vacuum. Read results are identical before and after by construction
    * (dropped rows were already tombstone-filtered from every read). */
  def compact(spark: SparkSession, path: String,
      maxFiles: Int = 16, targetFiles: Int = 1): Seq[String] = {
    val snapshot = Retention.tombstoneFiles(spark, path)
    // ONE dead-id frame, materialized once (localCheckpoint) — the
    // transform closure runs per rewritten bucket, and re-reading +
    // re-broadcasting the snapshot for each of them would pay N identical
    // jobs on the ingest cadence. LAZY: the steady state on the cadence is
    // "tombstones queued for under-threshold buckets, nothing to rewrite",
    // and that case must keep paying zero jobs, not one materialize per
    // call forever.
    lazy val dead: (String, DataFrame) = {
      val ts = spark.read.parquet(snapshot: _*)
      val idc = ts.columns.head
      (idc, broadcast(ts.select(col(idc).as("__graft_dead_id"))
        .distinct().localCheckpoint(true)))
    }
    val transform: DataFrame => DataFrame =
      if (snapshot.isEmpty) identity
      else { rows =>
        rows.join(dead._2, rows(dead._1) === col("__graft_dead_id"), "left_anti")
      }
    val rewritten = Compaction.compactLeafPartitions(
      spark, path, maxFiles, targetFiles, transform)
    Retention.clearCoveredTombstones(spark, path, snapshot, rewritten)
    rewritten
  }

  /** The whole corpus, original schema (bucket column dropped), LIVE rows
    * only: ids logically deleted via [[Retention]] are tombstone-filtered
    * until a vacuum removes them physically (zero cost when nothing is
    * tombstoned). Note the corollary: re-appending a tombstoned id before
    * the vacuum is indistinguishable from the dead row — a deleted id
    * stays deleted until [[Retention.vacuum]] clears the tombstones. */
  def readAll(spark: SparkSession, path: String): DataFrame = {
    // a ready-but-empty layout (the meta-first crash window) has no files
    // to infer a schema from — fail with the contract, not an opaque
    // AnalysisException; probe paths gate on `ready && hasData` already
    require(prepareRead(spark, path),
      s"corpus at $path has no committed data files (meta-first crash " +
        "window or empty layout) — gate reads on ready && hasData")
    Retention.filterLive(spark, path,
      spark.read.parquet(path).drop(BucketCol))
  }

  /** The corpus rows that could hold any of `ids` — a SUPERSET of the rows
    * with those ids (the whole bucket each id hashes into), which is what
    * an exact-verify join needs: the caller's semi/inner join on id does
    * the exact filtering, this read just prunes the scan to the candidate
    * buckets. `ids` must be a single-column frame of the id column's
    * original type; its distinct bucket set (≤ the layout's bucket count,
    * always driver-safe) becomes the partition filter. */
  def readForIds(spark: SparkSession, path: String, ids: DataFrame): DataFrame = {
    val b = bucketsOf(spark, path)
    val idc = ids.columns match {
      case Array(only) => only
      case other => throw new IllegalArgumentException(
        s"readForIds wants a single-column id frame, got ${other.mkString(", ")}")
    }
    val wanted = ids.select(bucketOf(col(idc), b).as(BucketCol)).distinct()
      .collect().map(_.getLong(0)).toSeq
    require(prepareRead(spark, path),
      s"corpus at $path has no committed data files (meta-first crash " +
        "window or empty layout) — gate reads on ready && hasData")
    Retention.filterLive(spark, path,
      spark.read.parquet(path)
        .where(col(BucketCol).isin(wanted: _*))
        .drop(BucketCol))
  }
}
