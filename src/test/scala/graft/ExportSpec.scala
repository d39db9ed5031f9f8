package graft

import org.apache.spark.sql.functions._

import graft.operators.Export

class ExportSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus = (1 to 200)
    .map(i => (i.toLong, (i * 37 % 100).toLong, s"doc$i"))
    .toDF("id", "size", "body")

  test("writeSortedShards: one file per shard, rows sorted within each file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    val n = Export.writeSortedShards(corpus, "id", Seq("size"), 4, dir)
    assert(n == 200L)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(shardDirs.length == 4)
    for (sd <- shardDirs) {
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName}: expected one file, got ${files.length}")
      // a single-file read of one parquet file preserves row order
      val rows = spark.read.parquet(files.head.getPath)
        .select("size", "id").as[(Long, Long)].collect().toSeq
      assert(rows == rows.sortBy(identity), s"${sd.getName} not sorted")
    }
    // nothing lost or duplicated
    val back = spark.read.parquet(dir).select("id").as[Long].collect().sorted
    assert(back.toSeq == (1L to 200L))
  }

  test("manifest checksum is order-sensitive and matches the physical layout") {
    val m = Export.sortedShardManifest(corpus, "id", Seq("size"), "size", 4)
      .orderBy("shard").collect()
    assert(m.map(_.getLong(1)).sum == 200L)
    // recompute each shard's checksum from the physically written files,
    // folding in file order — must equal the manifest's value
    val dir = java.nio.file.Files.createTempDirectory("graft_export2").toString
    Export.writeSortedShards(corpus, "id", Seq("size"), 4, dir)
    val manifest = m.map(r => r.getLong(0) -> r.getString(4)).toMap
    for (sd <- new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))) {
      val shard = sd.getName.stripPrefix("shard=").toLong
      val f = sd.listFiles().filter(_.getName.endsWith(".parquet")).head
      val ids = spark.read.parquet(f.getPath).select("id").as[Long].collect()
      val sum = ids.zipWithIndex.map { case (id, i) =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${i + 1}:$id".getBytes("UTF-8"))
        BigInt(md.take(6).map(b => f"$b%02x").mkString, 16)
      }.sum
      assert(sum.toString == manifest(shard), s"shard $shard checksum")
    }
    // permuting two rows' sort positions changes the checksum
    val swapped = corpus.withColumn("size",
      when(col("id") === 1, lit(999L)).otherwise(col("size")))
    val m2 = Export.sortedShardManifest(swapped, "id", Seq("size"), "size", 4)
      .orderBy("shard").collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    val shard1 = Export.shardOf(lit(1L), 4)
    val s1 = spark.range(1).select(shard1.as("s")).as[Long].head()
    assert(m2(s1) != manifest(s1))
  }

  test("rangeShardedPositions: empty and all-NULL inputs yield empty output") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Option[Long])].toDF("id", "k")
    assert(Export.rangeShardedPositions(empty, "k", "id", 4).count() == 0L)
    val allNull = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])).toDF("id", "k")
    assert(Export.rangeShardedPositions(allNull, "k", "id", 4).count() == 0L)
    // single-value key: one shard holds everything, positions still total-order
    val const = Seq((1L, Some(5L)), (2L, Some(5L)), (3L, Some(5L))).toDF("id", "k")
    val got = Export.rangeShardedPositions(const, "k", "id", 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._2).distinct.length == 1)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L)) // tie → id order
  }

  test("rangeShardedPositions: string keys — degenerate inputs and lexicographic total order") {
    import spark.implicits._
    // empty / all-NULL / single-value pins, mirroring the numeric ones
    val empty = Seq.empty[(Long, Option[String])].toDF("id", "k")
    assert(Export.rangeShardedPositions(empty, "k", "id", 4).count() == 0L)
    val allNull = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "k")
    assert(Export.rangeShardedPositions(allNull, "k", "id", 4).count() == 0L)
    val const = Seq((1L, Some("same")), (2L, Some("same")), (3L, Some("same"))).toDF("id", "k")
    val gotC = Export.rangeShardedPositions(const, "k", "id", 4)
      .select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(gotC.map(_._2).distinct.length == 1)
    assert(gotC.map(_._3).toSeq == Seq(1L, 2L, 3L))
    // long-shared-prefix keys (the case the prefix stripping exists for) +
    // ties + a NULL: (shard, pos) must read back the global (k, id) sort
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(301)(i =>
      (i.toLong, Option(f"corpus/doc_${rnd.nextInt(120)}%05d"))) :+
      (999L, Option.empty[String])
    val df = rows.toDF("id", "k")
    val got = Export.rangeShardedPositions(df, "k", "id", numShards = 4)
      .select("id", "k", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 301)
    val byLayout = got.sortBy { case (_, _, s, p) => (s, p) }.map(t => (t._2, t._1))
    val globalSort = rows.collect { case (id, Some(k)) => (k, id) }.sorted
    assert(byLayout.toSeq == globalSort)
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.size >= 3 && sizes.values.max <= 301 / 2, s"shard sizes $sizes")
  }

  test("rangeShardedPositions: (shard, pos) is a global total order with balanced shards") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // heavy ties + a NULL key (must be excluded)
    val rows = Seq.tabulate(403)(i => (i.toLong, Option((rnd.nextInt(40) * 10).toLong))) :+
      (999L, Option.empty[Long])
    val df = rows.toDF("id", "k")
    val got = Export.rangeShardedPositions(df, "k", "id", numShards = 4)
      .select("id", "k", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 403) // NULL key excluded
    // concatenating shards in (shard, pos) order reads the global (k, id) sort
    val byLayout = got.sortBy { case (_, _, s, p) => (s, p) }.map(t => (t._2, t._1))
    val globalSort = rows.collect { case (id, Some(k)) => (k, id) }.sorted
    assert(byLayout.toSeq == globalSort)
    // equi-depth boundaries keep shards near-balanced despite the tie-heavy key
    val sizes = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.size >= 3 && sizes.values.max <= 403 / 2,
      s"shard sizes $sizes")
  }

  test("compactLeafPartitions: appended index shrinks, probe unchanged, crash recovery") {
    import graft.operators.Dedup
    import graft.sources.Compaction
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_idx").toString
    try {
      // 3 ingest batches → 3 files per touched prefix directory
      Dedup.writeMinhashIndexMd5(docs.where(col("doc_id") % 3 === 0),
        "text", "doc_id", dir, prefixBits = 4)
      for (r <- Seq(1, 2))
        Dedup.writeMinhashIndexMd5(docs.where(col("doc_id") % 3 === r),
          "text", "doc_id", dir, prefixBits = 4, mode = "append")
      def allFiles() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      }
      val before = allFiles().size
      val batch = docs.where(col("doc_id") % 50 === 0)
      val corpus = docs.where(col("doc_id") % 50 =!= 0)
      def probe() = Dedup.minhashProbeIndexMd5(dir, corpus, batch,
        "text", "doc_id", threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ref = probe()
      val compacted = Compaction.compactLeafPartitions(spark, dir, maxFiles = 1)
      assert(compacted.nonEmpty)
      val after = allFiles().size
      assert(after < before, s"expected fewer files, got $before -> $after")
      assert(probe() == ref)
      // crash recovery, roll-back: a manifest WITHOUT the temp-ready marker
      // means the temp write never committed — originals must survive
      val leaf = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("pfx=")).head
      java.nio.file.Files.write(
        new java.io.File(leaf, "_graft_compacting").toPath, "bogus".getBytes("UTF-8"))
      Compaction.compactLeafPartitions(spark, dir, maxFiles = 1000000)
      assert(!new java.io.File(leaf, "_graft_compacting").exists)
      assert(probe() == ref)
      // roll-forward: ready temp + staged file + manifest listing an old file
      val victim = leaf.listFiles().filter(_.getName.endsWith(".parquet")).head
      val tmp = new java.io.File(leaf, "_graft_compact_tmp")
      java.nio.file.Files.createDirectory(tmp.toPath)
      val staged = new java.io.File(tmp, s"graft-compact-test-0.parquet")
      java.nio.file.Files.copy(victim.toPath, staged.toPath)
      java.nio.file.Files.write(new java.io.File(tmp, "_graft_ready").toPath,
        Array.emptyByteArray)
      java.nio.file.Files.write(new java.io.File(leaf, "_graft_compacting").toPath,
        victim.getName.getBytes("UTF-8"))
      Compaction.compactLeafPartitions(spark, dir, maxFiles = 1000000)
      assert(!victim.exists, "roll-forward must delete the manifest-listed file")
      assert(new java.io.File(leaf, staged.getName).exists,
        "roll-forward must finish the staged move")
      assert(!tmp.exists)
      assert(probe() == ref) // the staged copy replaced the victim: same rows
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }
}
