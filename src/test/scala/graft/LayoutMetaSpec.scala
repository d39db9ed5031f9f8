package graft

import java.io.File
import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem
import org.apache.spark.sql.functions._

import graft.sources.{BucketedCorpus, Retention}
import graft.operators.Dedup

/** A Hadoop filesystem with a NON-`file:` scheme, backed by local disk —
  * the stand-in for an object store. Any code path that touches a layout
  * through `java.nio` instead of the layout's Hadoop filesystem would
  * resolve a `grafttest://…` path string as a RELATIVE local path (a file
  * literally named `grafttest:…` under the JVM's cwd) and the round-trip
  * assertions below would fail — which is exactly the deployment bug this
  * suite pins closed ([[graft.sources.LayoutMeta]]). */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "grafttest"
  override def getUri: URI = URI.create("grafttest:///")
}

class LayoutMetaSpec extends SparkTestBase {

  private def registerScheme(): Unit =
    spark.sparkContext.hadoopConfiguration
      .set("fs.grafttest.impl", classOf[GraftTestFs].getName)

  private def fresh(name: String): String = {
    val local = new File(s"target/$name").getAbsoluteFile
    graft.operators.Utils.deleteRecursively(local.toPath)
    s"grafttest://${local.getPath}"
  }

  private def noLocalLeak(): Unit = {
    // a java.nio touch on a grafttest:// path string lands as a local file
    // whose name starts with the scheme — in cwd or under target/
    val bad = Option(new File(".").listFiles()).toSeq.flatten ++
      Option(new File("target").listFiles()).toSeq.flatten
    assert(!bad.exists(_.getName.startsWith("grafttest:")),
      s"java.nio leak: ${bad.filter(_.getName.startsWith("grafttest:")).toList}")
  }

  test("bucketed corpus + retention + minhash index run END-TO-END through " +
    "a non-file Hadoop scheme (no java.nio touch on any layout path)") {
    registerScheme()
    import spark.implicits._
    val corpus = fresh("grafttest_corpus")
    val docs = (0L until 60L)
      .map(i => (i, s"alpha beta gamma delta epsilon token$i zeta"))
      .toDF("doc_id", "text")
    BucketedCorpus.append(docs.where($"doc_id" < 30), corpus, "doc_id", 8)
    BucketedCorpus.append(docs.where($"doc_id" >= 30), corpus, "doc_id", 8)
    assert(BucketedCorpus.ready(corpus))
    assert(BucketedCorpus.hasData(spark, corpus))
    assert(BucketedCorpus.bucketsOf(corpus) == 8)
    assert(BucketedCorpus.readAll(spark, corpus).count() == 60)
    // drift guards fire through the scheme too
    intercept[IllegalArgumentException] {
      BucketedCorpus.append(docs.limit(1), corpus, "doc_id", 16)
    }
    // pruned candidate read
    val someIds = docs.where($"doc_id" % 13 === 0).select("doc_id")
    val got = BucketedCorpus.readForIds(spark, corpus, someIds)
      .join(someIds.withColumnRenamed("doc_id", "want"),
        col("doc_id") === col("want"), "left_semi")
    assert(got.count() == 5)

    // retention: tombstones + vacuum live on the layout's filesystem
    val nDel = Retention.deleteWhere(spark, corpus, $"doc_id" % 3 === 0, "doc_id")
    assert(nDel == 20)
    assert(Retention.hasTombstones(corpus))
    assert(BucketedCorpus.readAll(spark, corpus).count() == 40)
    val rewritten = Retention.vacuum(spark, corpus, "doc_id")
    assert(rewritten.nonEmpty)
    assert(!Retention.hasTombstones(corpus))
    assert(BucketedCorpus.readAll(spark, corpus).count() == 40)

    // a persisted minhash index: meta write, ready gate, probe mask read
    val idx = fresh("grafttest_idx")
    Dedup.writeMinhashIndexMd5(docs, "text", "doc_id", idx,
      numHashes = 16, bands = 8, prefixBits = 4)
    assert(Dedup.minhashIndexReady(idx))
    val probeBatch = docs.where($"doc_id" === 7)
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
    val hits = Dedup.minhashProbeIndexMd5Resolved(idx,
      ids => BucketedCorpus.readForIds(spark, corpus, ids),
      probeBatch, "text", "doc_id", threshold = 0.4,
      numHashes = 16, bands = 8)
    // doc 7 survives retention (7 % 3 != 0) and is a near-dup of itself
    assert(hits.where($"corpus_id" === 7).count() == 1)
    noLocalLeak()
  }

  test("heavy-hitters ingest + fence consolidation (dir-swap renames) run " +
    "end-to-end through the non-file scheme") {
    registerScheme()
    import spark.implicits._
    import graft.streaming.IngestHeavyHitters
    val sp = fresh("grafttest_hh_sum")
    val cp = fresh("grafttest_hh_cor")
    val b0 = Seq.fill(12)(("g1", "hot")).toDF("g", "token")
    val b1 = (Seq.fill(6)(("g1", "warm")) ++ Seq.fill(2)(("g1", "cold")))
      .toDF("g", "token")
    IngestHeavyHitters.processBatch(b0, 0L, sp, cp, "g", "token", 16)
    IngestHeavyHitters.processBatch(b1, 1L, sp, cp, "g", "token", 16)
    assert(IngestHeavyHitters.ready(spark, sp))
    assert(IngestHeavyHitters.capacityOf(spark, sp) == 16)
    def probed = IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 4L)
      .orderBy(col("freq").desc).as[(String, String, Long)].collect().toSeq
    val expected = Seq(("g1", "hot", 12L), ("g1", "warm", 6L))
    assert(probed == expected)
    // the crash-safe dir swap (temp → marker → manifest → rename → deletes)
    // through the scheme's own rename/delete semantics
    IngestHeavyHitters.consolidate(spark, sp, cp, 2L, "g", "token")
    assert(IngestHeavyHitters.fenceOf(spark, sp) == 2L)
    assert(probed == expected)
    // stale replay below the fence is skipped through the scheme too
    IngestHeavyHitters.processBatch(b0, 0L, sp, cp, "g", "token", 16)
    assert(probed == expected)
    noLocalLeak()
  }

  test("writeAtomic: an advancing meta reads as either the old or the new " +
    "value at EVERY crash window — never empty or partial (the fence " +
    "contract; plain write truncates first)") {
    registerScheme()
    import graft.sources.LayoutMeta
    val dir = fresh("grafttest_atomic")
    def got: Option[String] =
      LayoutMeta.readAtomicOpt(spark, dir, "_fence").map(_.trim)
    assert(got.isEmpty)
    LayoutMeta.writeAtomic(spark, dir, "_fence", "5")
    assert(got.contains("5"))
    LayoutMeta.writeAtomic(spark, dir, "_fence", "9")
    assert(got.contains("9"))
    // crash window A — tmp fully written, live not yet deleted: readers
    // resolve to the OLD value (live wins while it exists)
    LayoutMeta.write(spark, dir, "_fence.tmp", "12")
    assert(got.contains("9"))
    // the next writer heals the stray tmp and completes its own advance
    LayoutMeta.writeAtomic(spark, dir, "_fence", "13")
    assert(got.contains("13"))
    assert(!LayoutMeta.exists(spark, dir, "_fence.tmp"))
    // crash window B — live deleted, rename not yet done: the tmp is
    // complete by construction, and readers resolve to the NEW value
    LayoutMeta.write(spark, dir, "_fence.tmp", "20")
    LayoutMeta.delete(spark, dir, "_fence")
    assert(got.contains("20"))
    // a writer entering on that crash state heals FIRST (promote tmp to
    // live) before anything can truncate the only committed copy
    LayoutMeta.writeAtomic(spark, dir, "_fence", "21")
    assert(got.contains("21"))
    assert(!LayoutMeta.exists(spark, dir, "_fence.tmp"))
    noLocalLeak()
  }

  test("fenceOf parses at every consolidation crash state — a crashed " +
    "fence advance can no longer take probes and batches down") {
    registerScheme()
    import spark.implicits._
    import graft.sources.LayoutMeta
    import graft.streaming.IngestHeavyHitters
    val sp = fresh("grafttest_hh_fence_sum")
    val cp = fresh("grafttest_hh_fence_cor")
    val b = Seq.fill(8)(("g1", "hot")).toDF("g", "token")
    IngestHeavyHitters.processBatch(b, 0L, sp, cp, "g", "token", 16)
    IngestHeavyHitters.consolidate(spark, sp, cp, 1L, "g", "token")
    assert(IngestHeavyHitters.fenceOf(spark, sp) == 1L)
    def probeCount: Long =
      IngestHeavyHitters.probe(spark, sp, cp, "g", "token", 4L).count()
    // window A: advancing writer crashed after writing the tmp
    LayoutMeta.write(spark, sp, "_graft_hh_fence.tmp", "2")
    assert(IngestHeavyHitters.fenceOf(spark, sp) == 1L)
    assert(probeCount == 1L)
    // window B: crashed between delete and rename — fence resolves to the
    // tmp's complete NEW value, probes keep answering
    LayoutMeta.delete(spark, sp, "_graft_hh_fence")
    assert(IngestHeavyHitters.fenceOf(spark, sp) == 2L)
    assert(probeCount == 1L)
    // the next consolidate heals and advances on top
    IngestHeavyHitters.consolidate(spark, sp, cp, 3L, "g", "token")
    assert(IngestHeavyHitters.fenceOf(spark, sp) == 3L)
    assert(!LayoutMeta.exists(spark, sp, "_graft_hh_fence.tmp"))
    assert(probeCount == 1L)
    noLocalLeak()
  }

  test("after a 'driver restart' (fresh filesystem instance), layout " +
    "readiness still reads true through the scheme") {
    registerScheme()
    import spark.implicits._
    val corpus = fresh("grafttest_restart")
    BucketedCorpus.append(
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), corpus, "doc_id", 4)
    // the object-store failure mode was: meta on the old driver's local
    // disk, gone after restart, ready() false, probes silently skipped.
    // Clearing Hadoop's FileSystem cache is the closest local stand-in
    // for "a different driver node asks".
    org.apache.hadoop.fs.FileSystem.closeAll()
    assert(BucketedCorpus.ready(corpus))
    assert(BucketedCorpus.bucketsOf(corpus) == 4)
    noLocalLeak()
  }

  test("grep pin: no java.nio.file on layout paths in sources/, " +
    "streaming/, or the layout-carrying operators") {
    def scalaFiles(dir: String): Seq[File] = {
      val d = new File(dir)
      Option(d.listFiles()).toSeq.flatten.filter(_.getName.endsWith(".scala"))
    }
    def offenders(files: Seq[File], allow: Set[String]): Seq[String] =
      files.filterNot(f => allow.contains(f.getName)).flatMap { f =>
        val src = new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        // comments may MENTION java.nio (the LayoutMeta doc does); only
        // code lines count
        val hits = src.linesIterator.zipWithIndex.filter { case (l, _) =>
          l.contains("java.nio.file") && !l.trim.startsWith("*") &&
            !l.trim.startsWith("//")
        }
        hits.map { case (_, i) => s"${f.getName}:${i + 1}" }.toSeq
      }
    assert(offenders(scalaFiles("src/main/scala/graft/sources"), Set.empty).isEmpty)
    assert(offenders(scalaFiles("src/main/scala/graft/streaming"), Set.empty).isEmpty)
    // SparkCompare.scala hosts Utils.deleteRecursively — a local-target
    // test/bench helper, never pointed at a layout
    assert(offenders(scalaFiles("src/main/scala/graft/operators"),
      Set("SparkCompare.scala")).isEmpty)
  }
}
