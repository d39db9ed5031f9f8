package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** ONE implementation of "a small metadata file riding a persisted layout"
  * — bucket counts ([[BucketedCorpus]]), MinHash prefix widths, LSH / phash
  * parameter stamps, BM25 / trigram bucket markers, sketch capacities, and
  * [[Retention]]'s tombstone listings all go through here.
  *
  * The point is WHICH filesystem the metadata lives on. Every data read and
  * write in this repo already resolves the LAYOUT's filesystem from the
  * session's Hadoop configuration (`path.getFileSystem(spark.sessionState
  * .newHadoopConf())` — the [[Compaction]] discipline, which is what makes
  * `s3a://…` layouts work with `spark.hadoop.*` credentials). The metas
  * used to be the one exception: `java.nio` resolves `"s3a://…"` to a
  * LOCAL path, so on an object-store deployment the meta would land on
  * whichever driver node ran the write — and after a driver restart
  * `ready()` / `indexReady()` silently report false, which makes the
  * streaming ingest loops SKIP their cross-corpus probes and append every
  * batch undeduplicated. Not a crash: a silent correctness degradation on
  * exactly the deployments the bucketed layouts were built for. Routing
  * all metadata I/O through the layout's own filesystem removes that
  * failure mode; a spec drives a layout through a non-`file:`-scheme
  * Hadoop filesystem to pin that no `java.nio` touch remains on the path.
  *
  * Every method takes the caller's session explicitly — metadata must
  * resolve through the SAME session as the layout's data I/O (a
  * multi-session driver can carry per-session credentials/endpoints).
  * The session-less overloads delegate to `SparkSession.active` for
  * convenience entry points whose public signatures predate this module
  * (`BucketedCorpus.ready(path)` and friends); they are correct whenever
  * one session owns the layout, which is every deployment shape this
  * repo ships.
  *
  * [[write]] is create-with-overwrite of a few bytes — fine for metas
  * that are written once at layout creation and only ever re-written with
  * the identical value (every parameter stamp here). A meta whose value
  * ADVANCES over time must use [[writeAtomic]] instead: create-with-
  * overwrite truncates before the new bytes land, so a crash in that
  * window leaves an EMPTY file where a committed value used to be — for
  * the heavy-hitter consolidation fence that would take every probe and
  * ingest batch down with a parse error until someone hand-repaired a
  * hidden meta file. */
object LayoutMeta {

  def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(hadoopConf(spark))

  /** The session's Hadoop configuration — or, on a NON-classic session
    * (a Spark Connect client, whose `sessionState` lives server-side and
    * throws here), a default CLIENT-LOCAL `Configuration`. This is what
    * lets read-only, path-taking entry points (the streaming probes,
    * manifest reads) run over Connect at all; the documented reduced
    * guarantee is that the meta/listing I/O then resolves with the
    * client's ambient filesystem config — `file://` layouts and
    * ambient-credential object stores work, server-only `spark.hadoop.*`
    * confs do not apply to the metas (the DATA reads inside the plans
    * still run server-side with full server config). */
  private[graft] def hadoopConf(
      spark: SparkSession): org.apache.hadoop.conf.Configuration =
    spark match {
      case c: org.apache.spark.sql.classic.SparkSession =>
        c.sessionState.newHadoopConf()
      case _ => new org.apache.hadoop.conf.Configuration()
    }

  def exists(spark: SparkSession, dir: String, name: String): Boolean =
    fs(spark, dir).exists(new Path(dir, name))

  def exists(dir: String, name: String): Boolean =
    exists(SparkSession.active, dir, name)

  /** Read the meta's full contents as UTF-8 (callers trim / split). */
  def read(spark: SparkSession, dir: String, name: String): String = {
    val in = fs(spark, dir).open(new Path(dir, name))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  def read(dir: String, name: String): String =
    read(SparkSession.active, dir, name)

  def readOpt(spark: SparkSession, dir: String, name: String): Option[String] =
    if (exists(spark, dir, name)) Some(read(spark, dir, name)) else None

  def readOpt(dir: String, name: String): Option[String] =
    readOpt(SparkSession.active, dir, name)

  /** Write (creating the layout directory if needed), overwriting any
    * previous value. */
  def write(spark: SparkSession, dir: String, name: String, value: String): Unit = {
    val f = fs(spark, dir)
    val d = new Path(dir)
    if (!f.exists(d)) f.mkdirs(d)
    val out = f.create(new Path(dir, name), true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    ()
  }

  def write(dir: String, name: String, value: String): Unit =
    write(SparkSession.active, dir, name, value)

  /** Atomic replacement for a meta whose value ADVANCES across re-writes
    * (the consolidation fence): a crashed writer leaves the OLD value or
    * the NEW value on disk, never an empty or partial file. Read it back
    * with [[readAtomicOpt]].
    *
    * Discipline (single advancing writer — maintenance passes are
    * serialized by the stream's foreachBatch; readers concurrent):
    *
    *   1. heal: if the live file is missing but a tmp exists, a previous
    *      writer crashed between its delete and rename — promote the tmp
    *      (it is complete by construction, see 2) BEFORE anything can
    *      truncate the only copy;
    *   2. write `<name>.tmp` fully and close it — the live file is
    *      untouched through this, so a crash here leaves the old value;
    *   3. delete the live file, rename the tmp into place — a crash
    *      between the two leaves no live file but a COMPLETE tmp, which
    *      readers and the next writer's heal both resolve to the new
    *      value. (Delete-then-rename because `FileSystem.rename` onto an
    *      existing destination is not portable across Hadoop FSes.)
    *
    * Readers check the live name first and fall back to the tmp, so the
    * only window where they consult the tmp is after the delete — when it
    * is already complete. The tmp name starts with the meta's own
    * underscore-prefixed name, so Spark's file index never reads it as
    * data. */
  def writeAtomic(spark: SparkSession, dir: String, name: String,
      value: String): Unit = {
    val f = fs(spark, dir)
    val d = new Path(dir)
    if (!f.exists(d)) f.mkdirs(d)
    val live = new Path(dir, name)
    val tmp = new Path(dir, name + ".tmp")
    if (!f.exists(live) && f.exists(tmp)) {
      if (!f.rename(tmp, live))
        throw new java.io.IOException(
          s"healing rename $tmp -> $live failed — refusing to truncate " +
            "the only committed copy of an advancing meta")
    }
    val out = f.create(tmp, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    if (f.exists(live)) f.delete(live, false)
    if (!f.rename(tmp, live))
      throw new java.io.IOException(s"rename $tmp -> $live failed")
    ()
  }

  def writeAtomic(dir: String, name: String, value: String): Unit =
    writeAtomic(SparkSession.active, dir, name, value)

  /** Read a meta written by [[writeAtomic]]: the live file when present,
    * else a crashed writer's complete tmp (old-or-new, never partial —
    * see [[writeAtomic]]'s window analysis). A reader racing the
    * delete→rename window can observe BOTH names missing (live already
    * deleted, tmp checked only after the rename completed) or see the
    * live file vanish between its existence probe and the open. Both
    * windows resolve with ONE re-probe of the live name: if the rename
    * completed, the live file exists by the time both probes have missed
    * (returning None there would hand a fence consumer the 0 default and
    * let a replayed batch below the real fence double-count). None after
    * the re-probe means the meta genuinely was never written — with the
    * single serialized writer [[writeAtomic]] assumes, a SECOND full
    * advance cannot start (let alone reach its delete) inside this call.
    * Cost on the never-written path (every fenceless stream batch): three
    * existence stats, not a retry loop's six. */
  def readAtomicOpt(spark: SparkSession, dir: String,
      name: String): Option[String] = {
    val tmpName = name + ".tmp"
    val first =
      try {
        if (exists(spark, dir, name)) Some(read(spark, dir, name))
        else if (exists(spark, dir, tmpName)) Some(read(spark, dir, tmpName))
        else None
      } catch {
        case _: java.io.FileNotFoundException =>
          if (exists(spark, dir, tmpName)) Some(read(spark, dir, tmpName))
          else readOpt(spark, dir, name)
      }
    first.orElse(readOpt(spark, dir, name))
  }

  def readAtomicOpt(dir: String, name: String): Option[String] =
    readAtomicOpt(SparkSession.active, dir, name)

  def delete(spark: SparkSession, dir: String, name: String): Unit = {
    fs(spark, dir).delete(new Path(dir, name), false)
    ()
  }

  def delete(dir: String, name: String): Unit =
    delete(SparkSession.active, dir, name)

  /** List a layout SUBDIRECTORY's immediate files whose names pass
    * `keep` — [[Retention]]'s tombstone listing, resolved through the
    * layout's filesystem like everything else here. Returns fully
    * qualified path strings (directly readable by `spark.read`);
    * empty when the directory does not exist. */
  def listFiles(spark: SparkSession, dir: String,
      keep: String => Boolean): Vector[String] = {
    val f = fs(spark, dir)
    val d = new Path(dir)
    if (!f.exists(d)) return Vector.empty
    f.listStatus(d).toVector.collect {
      case s: FileStatus if s.isFile && keep(s.getPath.getName) =>
        s.getPath.toString
    }
  }

  def listFiles(dir: String, keep: String => Boolean): Vector[String] =
    listFiles(SparkSession.active, dir, keep)
}
