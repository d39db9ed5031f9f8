package graft.sources

import org.apache.hadoop.fs.{FileSystem, FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic small-file compaction for PARTITIONED parquet layouts — the
  * maintenance pass every streaming-appended index in this repo eventually
  * needs: each ingest batch adds one file per partition directory
  * (minhash/trigram/BM25 postings under `pfx=`/`bucket=`, phash postings
  * under `bp=`, corpus rows under `__graft_cb=`), so a long-running
  * stream turns every probe's partition read into thousands of file
  * opens. This pass rewrites any LEAF partition directory holding more
  * than `maxFiles` data files into `targetFiles` files, in place, leaving
  * reader results byte-identical (same rows, same directory, same
  * partition pruning).
  *
  * Crash safety without a transaction log — per directory, in this order:
  * (1) all rows are rewritten into an underscore-prefixed temp subdir
  * (invisible to Spark readers), (2) a manifest records the OLD file names
  * to delete, (3) the new files move in one by one under collision-free
  * `graft-compact-*` names, (4) the listed old files are deleted, the
  * manifest and temp dir removed. Recovery at every call entry: a
  * manifest WITHOUT its temp's marker rolls BACK (drop temp + manifest,
  * originals untouched); a manifest WITH the temp marker rolls FORWARD
  * (finish the moves — idempotent, names are unique — then the deletes).
  * The marker (`_graft_ready`, written after the temp write commits) is
  * what distinguishes "temp half-written" from "moves half-done".
  * Concurrent readers during (3)–(4) can see a row twice — run this as
  * the offline maintenance pass it is, like any compactor without
  * snapshot isolation.
  *
  * The same per-directory rewrite discipline (exposed as [[rewriteDir]] /
  * [[recoverDir]]) also powers [[Retention.vacuum]]'s physical deletes —
  * one crash-safety implementation, two maintenance passes.
  *
  * [[graft.operators.Pq.compactCodes]] stays the right tool for the
  * `cluster=N/batch=B` codes layout (it must preserve the replay
  * frontier's batch ids); this pass is for layouts whose partition values
  * are stable across batches. Returns the compacted directory paths. */
object Compaction {

  // Spark's own visibility rule: underscore/dot names are hidden UNLESS
  // they are partition directories (contain '='). Without the exemption
  // an underscore-prefixed partition column (BucketedCorpus's
  // `__graft_cb=`) would be invisible to the compactor while perfectly
  // visible to every Spark reader.
  private[sources] def isHidden(n: String): Boolean =
    (n.startsWith("_") || n.startsWith(".")) && !n.contains("=")

  private[graft] def dataFiles(fs: FileSystem, d: Path): Seq[FileStatus] =
    fs.listStatus(d).toSeq.filter(s => s.isFile && !isHidden(s.getPath.getName))

  private[graft] def leafDirs(fs: FileSystem, d: Path): Seq[Path] = {
    val entries = fs.listStatus(d).toSeq
    val subDirs = entries.filter(s => s.isDirectory && !isHidden(s.getPath.getName))
    if (subDirs.isEmpty) Seq(d) else subDirs.flatMap(s => leafDirs(fs, s.getPath))
  }

  /** Finish or roll back a half-done [[rewriteDir]] in `dir` — call at
    * every maintenance-pass entry before trusting the dir's file list.
    * Tolerant of the LIVE-writer race (the mirror of [[rewriteDir]]'s
    * rename tolerance): if the in-flight rewrite COMPLETES while this
    * recovery is mid-pass, the manifest/temp paths vanish underneath it —
    * that is the writer finishing its own cleanup, not a failure, so
    * vanished paths end the recovery instead of throwing out of a read. */
  private[graft] def recoverDir(fs: FileSystem, dir: Path): Unit = try {
    val manifest = new Path(dir, "_graft_compacting")
    if (!fs.exists(manifest)) return
    val tmp = new Path(dir, "_graft_compact_tmp")
    val ready = new Path(tmp, "_graft_ready")
    if (!fs.exists(ready)) { // temp write never committed: roll back
      fs.delete(tmp, true)
      fs.delete(manifest, false)
    } else { // moves may be half-done: finish them, then the deletes
      fs.listStatus(tmp).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("graft-compact-"))
        .foreach { s =>
          val target = new Path(dir, s.getPath.getName)
          if (!fs.exists(target)) fs.rename(s.getPath, target)
        }
      val in = fs.open(manifest)
      val listed = try scala.io.Source.fromInputStream(in).getLines().toSeq
      finally in.close()
      listed.filter(_.nonEmpty).foreach(n => fs.delete(new Path(dir, n), false))
      fs.delete(manifest, false)
      fs.delete(tmp, true)
    }
    ()
  } catch {
    case _: java.io.FileNotFoundException => () // live writer finished first
  }

  /** Crash-safely replace `dir`'s data files (currently `files`) with the
    * rows of `rows`, written as `targetFiles` files. The caller decides
    * WHAT the replacement rows are (compaction passes the same rows
    * through; a vacuum filters them); this owns the temp/marker/manifest
    * discipline described in the object doc. */
  private[sources] def rewriteDir(spark: SparkSession, fs: FileSystem,
      dir: Path, files: Seq[FileStatus], rows: DataFrame,
      targetFiles: Int): Unit = {
    val tmp = new Path(dir, "_graft_compact_tmp")
    fs.delete(tmp, true)
    rows.coalesce(targetFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // rename the committed part files to collision-free final names
    // INSIDE the temp dir, then mark the temp complete
    val parts = fs.listStatus(tmp).toSeq
      .filter(s => s.isFile && !isHidden(s.getPath.getName))
    val stamp = java.util.UUID.randomUUID().toString
    val finalNames = parts.zipWithIndex.map { case (s, i) =>
      val n = s"graft-compact-$stamp-$i${s.getPath.getName.dropWhile(_ != '.')}"
      if (!fs.rename(s.getPath, new Path(tmp, n)))
        throw new java.io.IOException(s"compaction staging rename failed in $tmp")
      n
    }
    val ready = fs.create(new Path(tmp, "_graft_ready"), true)
    ready.close()
    val manifest = new Path(dir, "_graft_compacting")
    val out = fs.create(manifest, true)
    try out.write(files.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    finalNames.foreach { n =>
      val target = new Path(dir, n)
      // a CONCURRENT reader's recovery pass may have finished this move
      // already (BucketedCorpus reads self-recover manifests they find) —
      // a failed rename whose target exists is that benign race, not a
      // filesystem fault; names are unique, so the move is idempotent
      if (!fs.rename(new Path(tmp, n), target) && !fs.exists(target))
        throw new java.io.IOException(s"compaction move failed into $dir")
    }
    files.foreach(s => fs.delete(s.getPath, false))
    fs.delete(manifest, false)
    fs.delete(tmp, true)
    ()
  }

  // ---- cross-directory consolidation -----------------------------------
  // replaceDirs swaps a SET of sibling directories for ONE merged
  // directory — the primitive behind batch-dir consolidation
  // ([[graft.streaming.IngestHeavyHitters.consolidate]]), where the
  // per-dir rewrite above doesn't apply (the dirs being merged cease to
  // exist). Same log-free crash discipline, one level up: (1) the merged
  // rows land in an underscore temp dir and get a ready marker, (2) a
  // root manifest records the target name and the doomed dir names,
  // (3) the temp RENAMES to the target (one atomic-ish move), (4) the
  // listed old dirs are deleted, the manifest removed. [[recoverRoot]] at
  // every entry rolls a half-done swap forward (temp marker present) or
  // back (absent); between (3) and (4) a concurrent reader can see a row
  // twice — run it as the offline maintenance pass it is, or recover at
  // probe entry like the heavy-hitters loop does.

  private[graft] val ConsolidateTmp = "_graft_consolidate_tmp"
  private[graft] val ConsolidateManifest = "_graft_consolidating"

  /** Finish or roll back a half-done [[replaceDirs]] under `root`. */
  private[graft] def recoverRoot(fs: FileSystem, root: Path): Unit = try {
    val manifest = new Path(root, ConsolidateManifest)
    if (!fs.exists(manifest)) return
    val in = fs.open(manifest)
    val lines = try scala.io.Source.fromInputStream(in).getLines().toVector
    finally in.close()
    if (lines.isEmpty) {
      // crash between manifest create and write: the target is unknown,
      // but nothing was deleted yet — roll back (originals intact, the
      // staged temp is re-derivable) rather than throw out of a probe
      fs.delete(new Path(root, ConsolidateTmp), true)
      fs.delete(manifest, false)
      return
    }
    val target = new Path(root, lines.head)
    val olds = lines.tail.filter(_.nonEmpty).map(n => new Path(root, n))
    val tmp = new Path(root, ConsolidateTmp)
    if (fs.exists(new Path(tmp, "_graft_ready"))) {
      // merged rows fully committed: roll FORWARD. A pre-existing target
      // is a stale old dir (replaceDirs requires target ∈ olds when it
      // already exists) — clear it so the rename lands.
      if (fs.exists(target)) fs.delete(target, true)
      if (!fs.rename(tmp, target) && !fs.exists(target))
        throw new java.io.IOException(s"consolidation move failed into $target")
    } else if (fs.exists(tmp)) {
      // temp half-written: roll BACK — originals untouched
      fs.delete(tmp, true)
      fs.delete(manifest, false)
      return
    } else if (!fs.exists(target)) {
      // no temp, no target: the rename never ran and the temp is gone
      // (rollback raced us) — originals intact, drop the manifest
      fs.delete(manifest, false)
      return
    }
    // target committed: finish the deletes (idempotent)
    olds.filterNot(_.getName == target.getName).foreach(p => fs.delete(p, true))
    fs.delete(new Path(target, "_graft_ready"), false)
    fs.delete(manifest, false)
    ()
  } catch {
    case _: java.io.FileNotFoundException => () // live consolidator finished first
  }

  /** Crash-safely replace the sibling directories `oldDirNames` (immediate
    * children of `root`) with ONE directory `targetDirName` holding `rows`
    * written as `targetFiles` files. If the target name already exists it
    * must be among the old names (a re-run merging a previous
    * consolidation into a new one). `rows` may — and typically does —
    * read from the old dirs: it is fully materialized into the temp
    * before anything is deleted. */
  private[graft] def replaceDirs(spark: SparkSession, root: Path,
      oldDirNames: Seq[String], targetDirName: String, rows: DataFrame,
      targetFiles: Int = 1): Unit = {
    val fs: FileSystem = root.getFileSystem(spark.sessionState.newHadoopConf())
    recoverRoot(fs, root)
    val target = new Path(root, targetDirName)
    require(!fs.exists(target) || oldDirNames.contains(targetDirName),
      s"replaceDirs target $targetDirName exists but is not among the " +
        "directories being replaced")
    val tmp = new Path(root, ConsolidateTmp)
    fs.delete(tmp, true)
    rows.coalesce(targetFiles).write.mode("overwrite").parquet(tmp.toString)
    val ready = fs.create(new Path(tmp, "_graft_ready"), true)
    ready.close()
    val manifest = new Path(root, ConsolidateManifest)
    val out = fs.create(manifest, true)
    try out.write((targetDirName +: oldDirNames).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // the swap itself IS the recovery's forward path — one implementation
    recoverRoot(fs, root)
  }

  /** Layout-root marker meaning "a maintenance rewrite may have crashed
    * here": written by every maintenance pass BEFORE its first rewrite and
    * cleared only after a full entry-recovery walk plus all of the pass's
    * own rewrites complete. The invariant readers rely on: marker absent ⇒
    * no crashed-rewrite manifest exists anywhere in the layout — so a read
    * path ([[BucketedCorpus.prepareRead]]) can skip its per-leaf recovery
    * probes (≈ buckets × one stat each, per read, per micro-batch on an
    * object store) with a single root stat in the common
    * nothing-ever-crashed case. A LIVE maintenance job is still the
    * documented concurrent-reader caveat, marker or not; concurrent
    * maintenance JOBS on one layout are outside the single-writer
    * maintenance contract. */
  private[graft] val MaintenanceMarker = "_graft_maintenance_pending"

  /** Companion stamp meaning "this layout has had at least one FULL
    * recovery walk under the marker discipline". Layouts written before
    * the marker existed can carry a crashed-rewrite manifest with no
    * marker over it — the invariant the fast path relies on only holds
    * from the first full walk onward, so reads treat a missing stamp as
    * "unknown history" and walk once ([[BucketedCorpus.prepareRead]]). */
  private[graft] val RecoveryCleanStamp = "_graft_recovery_clean"

  private[graft] def markMaintenance(fs: FileSystem, root: Path): Unit = {
    val m = fs.create(new Path(root, MaintenanceMarker), true)
    m.close()
  }

  private[graft] def clearMaintenance(fs: FileSystem, root: Path): Unit = {
    // a full recovery walk preceded every clear — stamp it so reads can
    // trust the marker's absence from here on
    val st = fs.create(new Path(root, RecoveryCleanStamp), true)
    st.close()
    fs.delete(new Path(root, MaintenanceMarker), false)
    ()
  }

  /** `transform` rewrites each over-threshold directory's rows through the
    * caller's filter before they land — identity (the default) keeps the
    * byte-identical-reads contract; [[BucketedCorpus.compact]] passes a
    * tombstone anti-join so physically deleting logically-dead rows rides
    * a rewrite that was happening anyway. */
  def compactLeafPartitions(spark: SparkSession, path: String,
      maxFiles: Int = 16, targetFiles: Int = 1,
      transform: DataFrame => DataFrame = identity): Seq[String] = {
    require(maxFiles > 0 && targetFiles > 0,
      s"bad compaction params ($maxFiles, $targetFiles)")
    val root = new Path(path)
    val fs: FileSystem = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val leaves = leafDirs(fs, root)
    leaves.foreach(d => recoverDir(fs, d))
    val over = leaves.map(dir => dir -> dataFiles(fs, dir))
      .filter(_._2.size > maxFiles)
    if (over.nonEmpty) markMaintenance(fs, root)
    val rewritten = over.map { case (dir, files) =>
      rewriteDir(spark, fs, dir, files,
        transform(spark.read.parquet(files.map(_.getPath.toString): _*)),
        targetFiles)
      dir.toString
    }
    // every leaf recovered at entry + our own rewrites done ⇒ no manifest
    // can remain: safe to clear even a PREVIOUS crashed pass's marker
    clearMaintenance(fs, root)
    rewritten
  }
}
