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
  * Writes are create-with-overwrite of a few bytes — the same atomicity
  * the metas always had (they are written once at layout creation and
  * only ever re-written with the identical value). */
object LayoutMeta {

  /** The layout's filesystem, resolved from the ACTIVE session's Hadoop
    * configuration — the session carries the `spark.hadoop.*` settings
    * (credentials, endpoints) a bare Configuration would miss. All layout
    * metadata is driver-side I/O on paths derived from a running query or
    * ingest loop, so an active session always exists. */
  def fs(dir: String): FileSystem =
    new Path(dir).getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  def exists(dir: String, name: String): Boolean =
    fs(dir).exists(new Path(dir, name))

  /** Read the meta's full contents as UTF-8 (callers trim / split). */
  def read(dir: String, name: String): String = {
    val f = fs(dir)
    val in = f.open(new Path(dir, name))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, "UTF-8")
    } finally in.close()
  }

  def readOpt(dir: String, name: String): Option[String] =
    if (exists(dir, name)) Some(read(dir, name)) else None

  /** Write (creating the layout directory if needed), overwriting any
    * previous value. */
  def write(dir: String, name: String, value: String): Unit = {
    val f = fs(dir)
    val d = new Path(dir)
    if (!f.exists(d)) f.mkdirs(d)
    val out = f.create(new Path(dir, name), true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
    ()
  }

  def delete(dir: String, name: String): Unit = {
    fs(dir).delete(new Path(dir, name), false)
    ()
  }

  /** List a layout SUBDIRECTORY's immediate files whose names pass
    * `keep` — [[Retention]]'s tombstone listing, resolved through the
    * layout's filesystem like everything else here. Returns fully
    * qualified path strings (directly readable by `spark.read`);
    * empty when the directory does not exist. */
  def listFiles(dir: String, keep: String => Boolean): Vector[String] = {
    val f = fs(dir)
    val d = new Path(dir)
    if (!f.exists(d)) return Vector.empty
    f.listStatus(d).toVector.collect {
      case s: FileStatus if s.isFile && keep(s.getPath.getName) =>
        s.getPath.toString
    }
  }
}
