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

  private[sources] def dataFiles(fs: FileSystem, d: Path): Seq[FileStatus] =
    fs.listStatus(d).toSeq.filter(s => s.isFile && !isHidden(s.getPath.getName))

  private[sources] def leafDirs(fs: FileSystem, d: Path): Seq[Path] = {
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
  private[sources] def recoverDir(fs: FileSystem, dir: Path): Unit = try {
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

  def compactLeafPartitions(spark: SparkSession, path: String,
      maxFiles: Int = 16, targetFiles: Int = 1): Seq[String] = {
    require(maxFiles > 0 && targetFiles > 0,
      s"bad compaction params ($maxFiles, $targetFiles)")
    val root = new Path(path)
    val fs: FileSystem = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val leaves = leafDirs(fs, root)
    leaves.foreach(d => recoverDir(fs, d))
    leaves.flatMap { dir =>
      val files = dataFiles(fs, dir)
      if (files.size <= maxFiles) None
      else {
        rewriteDir(spark, fs, dir, files,
          spark.read.parquet(files.map(_.getPath.toString): _*), targetFiles)
        Some(dir.toString)
      }
    }
  }
}
