package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Filtered ANN + kNN majority-vote classification. */
class KnnSpec extends SparkTestBase {
  import spark.implicits._

  // two tight clusters on orthogonal axes + one outlier
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 1),
    (1L, Array(0.9f, 0.1f, 0.0f), 1),
    (2L, Array(0.8f, 0.2f, 0.0f), 1),
    (3L, Array(0.0f, 1.0f, 0.0f), 2),
    (4L, Array(0.1f, 0.9f, 0.0f), 2),
    (5L, Array(0.0f, 0.8f, 0.2f), 2),
    (6L, Array(0.0f, 0.0f, 1.0f), 3)
  ).toDF("vec_id", "embedding", "label")

  test("filteredTopK searches only the label slice") {
    val r = Ann.filteredTopK(vecs, "embedding", "vec_id",
      col("label") === 2, Seq(1.0, 0.0, 0.0), k = 5)
      .collect().map(_.getLong(0))
    assert(r.toSet == Set(3L, 4L, 5L)) // only label-2 vectors, all 3 of them
    assert(r.head == 4L) // highest x-component of the label-2 cluster
  }

  test("knnClassify predicts by neighbor majority, excluding self") {
    val queries = vecs.where(col("vec_id").isin(0L, 3L))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val r = Ann.knnClassify(vecs, "embedding", "vec_id", "label",
      queries, "qv", "qid", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // vec 0's 3 nearest excluding itself: 1, 2 (label 1) and one label-2 -> 1
    assert(r(0L)._1 == 1L && r(0L)._2 == 2L)
    assert(r(3L)._1 == 2L && r(3L)._2 == 2L)
  }

  test("knnClassify vote tie breaks toward the smaller label") {
    // query equidistant from one label-5 and one label-4 vector, k=2
    val corpus = Seq(
      (10L, Array(1.0f, 1.0f, 0.0f), 5),
      (11L, Array(1.0f, -1.0f, 0.0f), 4)
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((99L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qv")
    val r = Ann.knnClassify(corpus, "embedding", "vec_id", "label",
      q, "qv", "qid", k = 2).collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L)
  }

  test("knnClassify plan: corpus is never shuffled — broadcast joins only") {
    val queries = vecs.limit(1).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val plan = Ann.knnClassify(vecs, "embedding", "vec_id", "label",
      queries, "qv", "qid", k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    // the only hash exchanges are the tiny top-k aggregate + vote rollups,
    // never a repartition of the corpus by id
    assert(!plan.contains("SortMergeJoin"))
  }

  test("mutualNearestNeighbors keeps only pairs that are each other's argmax") {
    // big side: two tight clusters + a decoy closer to b0 than any b is to it
    val big = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),   // best for b10; b10 best for it → mutual
      (2L, Array(0.95f, 0.05f, 0.0f)), // b10's second choice → NOT mutual
      (3L, Array(0.0f, 1.0f, 0.0f)),   // mutual with b11
      (4L, Array(0.0f, 0.0f, 1.0f)))   // its best is b10 (cos 0) — not b10's best
      .toDF("vec_id", "embedding")
    val small = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val got = Ann.mutualNearestNeighbors(big, small, "embedding", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (3L, 11L)))
    // the pair cosines are the true pairwise cosines
    val c = Ann.mutualNearestNeighbors(big, small, "embedding", "vec_id")
      .where(col("a_id") === 1L).select("cosine").first().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("margin alignment: ratio margin from rank-ordered top-2 sums; k > |side| safe") {
    val big = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val small = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Ann.mutualNearestNeighborsWithMargin(big, small, "embedding", "vec_id", k = 2)
      .collect().map(r => (r.getLong(1), r.getLong(0)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    // mutual pairs: (1,10) and (2,11); vec 3 is nobody's best
    assert(got.keySet == Set((10L, 1L), (11L, 2L)))
    // driver-side margin reference for (1,10): cos(1,·) = {1.0, 0.0};
    // cos(10,·) over big = {1.0, 0.0, 0.6}: top2 = 1.0 + 0.6
    val (c, m) = got((10L, 1L))
    assert(math.abs(c - 1.0) < 1e-12)
    val expected = 1.0 / ((1.0 + 0.0) / 4.0 + (1.0 + 0.6f.toDouble / 1.0) / 4.0)
    assert(math.abs(m - expected) < 1e-6, s"margin $m vs $expected")
    // k larger than the small side: absent ranks contribute 0, no ANSI throw
    val one = Seq((10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val g2 = Ann.mutualNearestNeighborsWithMargin(big, one, "embedding", "vec_id", k = 3)
      .collect()
    assert(g2.length == 1 && g2.head.getLong(0) == 1L)
  }

  test("LSH-pruned alignment: equals the exact form when tables saturate; plan has no cross fan-out") {
    val big = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.6f, 0.8f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val small = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(0.0f, 0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    // 1-bit signatures over many tables: candidate coverage saturates, so
    // the pruned result must EQUAL the exact mutual-top-1 (same tie rules)
    val lsh = Ann.mutualNearestNeighborsLsh(big, small, "embedding", "vec_id",
      dim = 3, bits = 1, tables = 16)
    val exact = Ann.mutualNearestNeighbors(big, small, "embedding", "vec_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9))).toSet
    assert(rows(lsh) == rows(exact) && rows(lsh).nonEmpty)
    // margin twin agrees with the exact margin form under the same saturation
    val lshM = Ann.mutualNearestNeighborsLshWithMargin(big, small, "embedding",
      "vec_id", dim = 3, bits = 1, tables = 16, k = 2)
    val exactM = Ann.mutualNearestNeighborsWithMargin(big, small, "embedding", "vec_id", k = 2)
    def rowsM(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9), math.rint(r.getDouble(3) * 1e9))).toSet
    assert(rowsM(lshM) == rowsM(exactM) && rowsM(lshM).nonEmpty)
    // the whole point of the pruned form: every join is an equi-join
    val plan = lshM.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "LSH-pruned alignment must not plan a cross fan-out")
  }

  // ---- product quantization --------------------------------------------

  import graft.operators.Pq

  private val PqDim = 8
  private lazy val pqBooks = Pq.codebooks(PqDim, subspaces = 2,
    codebookSize = 4, planeOffset = 900)

  /** Driver-side reference encode: argmin_j ‖v_m − c_mj‖² (first on ties),
    * via the same c²−2vc form the engine uses. */
  private def refCodes(v: Seq[Double]): Seq[Int] =
    pqBooks.zipWithIndex.map { case (book, m) =>
      val sub = v.slice(m * 4, m * 4 + 4)
      val dists = book.map { c =>
        val c2 = c.map(x => x * x).sum
        var dot = 0.0
        for (i <- 0 until 4) dot += sub(i) * c(i)
        c2 - 2.0 * dot
      }
      dists.indexOf(dists.min)
    }

  private lazy val pqVecs = {
    val rnd = new scala.util.Random(11)
    (0L until 40L).map(i => (i, Array.fill(PqDim)(rnd.nextFloat() * 2 - 1)))
  }

  test("pq encode matches driver-side argmin; codes bounded by codebook size") {
    val df = pqVecs.toDF("vec_id", "embedding")
    val got = Pq.encode(df, "embedding", "vec_id", pqBooks)
      .collect().map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2))).toMap
    pqVecs.foreach { case (id, v) =>
      val ref = refCodes(v.map(_.toDouble).toSeq)
      assert(got(id) == ref, s"vec $id")
      assert(ref.forall(c => c >= 0 && c < 4))
    }
    // a vector assembled FROM codebook entries must encode to those codes
    val exact = (pqBooks(0)(2) ++ pqBooks(1)(1)).toArray.map(_.toFloat)
    val g = Pq.encode(Seq((99L, exact)).toDF("vec_id", "embedding"),
      "embedding", "vec_id", pqBooks).collect().head
    assert(g.getInt(1) == 2 && g.getInt(2) == 1)
  }

  test("pq ADC top-k equals the driver-side table-lookup ranking exactly") {
    val df = pqVecs.toDF("vec_id", "embedding")
    val query = pqVecs(7)._2.map(_.toDouble).toSeq
    val table = Pq.adcTable(query, pqBooks)
    val ref = pqVecs.map { case (id, v) =>
      val codes = refCodes(v.map(_.toDouble).toSeq)
      id -> codes.zipWithIndex.map { case (c, m) => table(m)(c) }.sum
    }.sortBy { case (id, d) => (d, id) }.take(10)
    val got = Pq.adcTopK(df, "embedding", "vec_id", query, 10, pqBooks)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == ref)
    // persisted-codes path is identical to the fused path
    val codes = Pq.encode(df, "embedding", "vec_id", pqBooks)
    val fromCodes = Pq.adcTopKFromCodes(codes, "id", query, 10, pqBooks)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(fromCodes == got)
  }

  test("ivf+pq: probes the right clusters and matches the driver-side composition") {
    val cents = Pq.coarseCentroids(PqDim, k = 4, planeOffset = 950)
    val df = pqVecs.toDF("vec_id", "embedding")
    val query = pqVecs(3)._2.map(_.toDouble).toSeq
    def refAssign(v: Seq[Double]): Int = {
      val dists = cents.map { c =>
        val c2 = c.map(x => x * x).sum
        var dot = 0.0
        for (i <- v.indices) dot += v(i) * c(i)
        c2 - 2.0 * dot
      }
      dists.indexOf(dists.min)
    }
    val probe = Pq.probeClusters(query, cents, nprobe = 2)
    assert(probe.length == 2 && probe.distinct.length == 2)
    // the query's own cluster is always probed first
    assert(probe.head == refAssign(query))
    // composition ≡ ADC ranking restricted to the probed members
    val probedIds = pqVecs.filter { case (_, v) =>
      probe.contains(refAssign(v.map(_.toDouble).toSeq))
    }.map(_._1).toSet
    val table = Pq.adcTable(query, pqBooks)
    val ref = pqVecs.filter(p => probedIds(p._1)).map { case (id, v) =>
      val codes = refCodes(v.map(_.toDouble).toSeq)
      id -> codes.zipWithIndex.map { case (c, m) => table(m)(c) }.sum
    }.sortBy { case (id, d) => (d, id) }.take(10)
    val got = Pq.ivfPqTopK(df, "embedding", "vec_id", query, 10, cents,
        pqBooks, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == ref)
    assert(got.map(_._1).toSet.subsetOf(probedIds))
  }

  test("residual ivf+pq matches the driver-side residual composition") {
    val cents = Pq.coarseCentroids(PqDim, k = 4, planeOffset = 950)
    val df = pqVecs.toDF("vec_id", "embedding")
    val query = pqVecs(5)._2.map(_.toDouble).toSeq
    def refAssign(v: Seq[Double]): Int = {
      val dists = cents.map { c =>
        val c2 = c.map(x => x * x).sum
        var dot = 0.0
        for (i <- v.indices) dot += v(i) * c(i)
        c2 - 2.0 * dot
      }
      dists.indexOf(dists.min)
    }
    val probe = Pq.probeClusters(query, cents, nprobe = 2)
    val tables = probe.map { c =>
      c -> Pq.adcTable(query.zip(cents(c)).map { case (q, w) => q - w }, pqBooks)
    }.toMap
    val ref = pqVecs.flatMap { case (id, vf) =>
      val v = vf.map(_.toDouble).toSeq
      val cl = refAssign(v)
      if (!probe.contains(cl)) None
      else {
        val rv = v.zip(cents(cl)).map { case (a, b) => a - b }
        val codes = refCodes(rv)
        Some(id -> codes.zipWithIndex.map { case (c, m) => tables(cl)(m)(c) }.sum)
      }
    }.sortBy { case (id, d) => (d, id) }.take(10)
    val got = Pq.ivfPqResidualTopK(df, "embedding", "vec_id", query, 10,
        cents, pqBooks, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == ref && got.nonEmpty)
  }

  test("persisted pq-codes probe prunes to the probed cluster directories") {
    val dir = "/root/testdata/sf0.001"
    val out = OpsPack.annPqPersisted(spark, dir)
    // result parity with the fused composition (same oracle by design)
    val fused = OpsPack.annIvfPq(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq == fused)
    // the probe's scan carries PartitionFilters on cluster — planning-time
    // pruning, so only the probed directories' files are ever read
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    val cents = graft.operators.Pq.coarseCentroids(
      OpsPack.EmbeddingDim, OpsPack.IvfPqClusters, OpsPack.IvfPqPlaneOffset)
    val q = spark.read.parquet(s"$dir/embeddings.parquet")
      .where(col("vec_id") === 0).select(col("embedding")).first()
      .getSeq[Float](0).map(_.toDouble)
    val probe = graft.operators.Pq.probeClusters(q, cents, OpsPack.IvfPqNprobe)
    // every probed cluster id appears in the pushed partition filter
    probe.foreach(c => assert(plan.contains(c.toString), s"probed $c missing"))
  }

  test("pq top-k plan: TakeOrdered over column algebra, no shuffle of the corpus") {
    val df = pqVecs.toDF("vec_id", "embedding")
    val plan = Pq.adcTopK(df, "embedding", "vec_id",
        pqVecs.head._2.map(_.toDouble).toSeq, 5, pqBooks)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("randomProjectionTopK: candidates saturate → equals brute force; plan is TakeOrdered") {
    val df = pqVecs.toDF("vec_id", "embedding")
    val query = pqVecs(11)._2.map(_.toDouble).toSeq
    // candidates = corpus size: the prefilter passes everything through,
    // so the rerank IS brute force — exact equality, not recall
    val got = Ann.randomProjectionTopK(df, "embedding", "vec_id", query,
        k = 10, projDim = 4, planeOffset = 4000, candidates = 40)
      .collect().map(_.getLong(0)).toSeq
    val ref = Ann.bruteForceTopK(df, "embedding", "vec_id", query, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(got == ref)
    // tight candidates: top-k still comes back k-sized and from the corpus
    val tight = Ann.randomProjectionTopK(df, "embedding", "vec_id", query,
        k = 5, projDim = 4, planeOffset = 4000, candidates = 8)
      .collect().map(_.getLong(0))
    assert(tight.length == 5 && tight.toSet.subsetOf(pqVecs.map(_._1).toSet))
    // both stages are bounded heaps — the corpus never shuffles
    val plan = Ann.randomProjectionTopK(df, "embedding", "vec_id", query,
        k = 5, projDim = 4, planeOffset = 4000, candidates = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("retrievalMetrics: per-query hits, first rank, exact scaled RR") {
    val retrieved = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), // q1: truth hit at rank 2
      (2L, 20L, 1L), (2L, 21L, 2L),                // q2: no truth hits
      (3L, 31L, 1L), (3L, 32L, 2L)                 // q3: hits at ranks 1 and 2
    ).toDF("query_id", "id", "rank")
    val truth = Seq(
      (1L, 11L), (1L, 99L),
      (2L, 98L),
      (3L, 31L), (3L, 32L), (3L, 97L),
      (4L, 96L) // query with truth but nothing retrieved at all
    ).toDF("query_id", "id")
    val got = Ann.retrievalMetrics(retrieved, truth)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got(1L) == ((2L, 1L, 2L, 500000000000L))) // scale DIV 2
    assert(got(2L) == ((1L, 0L, 0L, 0L)))
    assert(got(3L) == ((3L, 2L, 1L, 1000000000000L)))
    assert(got(4L) == ((1L, 0L, 0L, 0L)))
    assert(got.size == 4)
  }

  test("retrievalSummary: exact integer rollup of the per-query metrics") {
    val retrieved = Seq(
      (1L, 11L, 1L), (1L, 12L, 2L), (1L, 13L, 3L),
      (2L, 21L, 1L), (2L, 22L, 2L),
      (3L, 31L, 1L), (3L, 32L, 2L)
    ).toDF("query_id", "id", "rank")
    val truth = Seq(
      (1L, 11L), (1L, 99L), (2L, 98L), (3L, 31L), (3L, 32L), (3L, 97L), (4L, 96L)
    ).toDF("query_id", "id")
    val got = Ann.retrievalSummary(retrieved, truth).collect().head
    assert(got.getLong(0) == 4L)                      // n_queries (truth-driven)
    assert(got.getLong(1) == 7L && got.getLong(2) == 3L)
    assert(got.getLong(3) == 3L * 1000000000000L / 7L) // recall_scaled, integer div
    // rr: q1 = scale/1, q2 = 0, q3 = scale/1, q4 = 0 → mean over 4
    assert(got.getLong(4) == (1000000000000L + 0L + 1000000000000L + 0L) / 4L)
  }

  test("rpTopKFromProjected: narrow-layout prefilter, result equals the fused RP operator") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rp_layout").toString
    try {
      val vecs = pqVecs.toDF("vec_id", "embedding")
      Ann.writeRpProjected(vecs, "embedding", "vec_id", dir,
        projDim = 4, planeOffset = 7000)
      val query = pqVecs(3)._2.map(_.toDouble).toSeq
      val probe = Ann.rpTopKFromProjected(spark, dir, vecs, "embedding", "vec_id",
        query, k = 5, projDim = 4, planeOffset = 7000, candidates = 12)
      val got = probe.collect().map(r => r.getLong(0)).toSeq
      val ref = Ann.randomProjectionTopK(vecs, "embedding", "vec_id",
        query, 5, 4, 7000, 12).collect().map(r => r.getLong(0)).toSeq
      assert(got == ref)
      // stage 1 reads ONLY the narrow projection columns — the parquet scan
      // of the layout must project (vec_id, p0..p3), never a vector column
      val plan = probe.queryExecution.executedPlan.toString
      val layoutScan = plan.linesIterator
        .filter(l => l.contains("ReadSchema") && l.contains("p0")).mkString("\n")
      assert(layoutScan.nonEmpty, s"expected a narrow layout scan:\n$plan")
      assert(!layoutScan.contains("embedding"),
        s"layout scan must not read the vector column:\n$layoutScan")
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("appendCodesBatch: replaying a batch is idempotent, probe sees no dupes") {
    val cents = Pq.coarseCentroids(PqDim, k = 4, planeOffset = 950)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_batch").toString
    try {
      val half1 = pqVecs.take(20).toDF("vec_id", "embedding")
      val half2 = pqVecs.drop(20).toDF("vec_id", "embedding")
      Pq.appendCodesBatch(half1, "embedding", "vec_id", cents, pqBooks, dir, 0L)
      Pq.appendCodesBatch(half2, "embedding", "vec_id", cents, pqBooks, dir, 1L)
      // at-least-once redelivery of batch 0: dynamic overwrite, not append
      Pq.appendCodesBatch(half1, "embedding", "vec_id", cents, pqBooks, dir, 0L)
      val codes = spark.read.parquet(dir)
      assert(codes.count() == 40L)
      assert(codes.select("vec_id").distinct().count() == 40L)
      // probe ranking over the replayed layout ≡ the fused one-shot ranking
      val query = pqVecs(5)._2.map(_.toDouble).toSeq
      val got = Pq.adcTopKFromCodes(codes, "vec_id", query, 10, pqBooks)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      val ref = Pq.adcTopK(pqVecs.toDF("vec_id", "embedding"),
          "embedding", "vec_id", query, 10, pqBooks)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      assert(got == ref)
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("compactCodes: merges batch partitions, probe unchanged, replay frontier kept") {
    val cents = Pq.coarseCentroids(PqDim, k = 4, planeOffset = 950)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_compact").toString
    try {
      // 10 micro-batches of 4 vectors each — one tiny file per (cluster, batch)
      val batches = pqVecs.grouped(4).toSeq
      batches.zipWithIndex.foreach { case (b, i) =>
        Pq.appendCodesBatch(b.toDF("vec_id", "embedding"), "embedding", "vec_id",
          cents, pqBooks, dir, i.toLong)
      }
      def files(sub: String => Boolean): Seq[java.io.File] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(dir)).filter(f => f.getName.endsWith(".parquet") &&
          sub(f.getParentFile.getName))
      }
      val before = files(_ => true).size
      val query = pqVecs(5)._2.map(_.toDouble).toSeq
      val ref = Pq.adcTopKFromCodes(spark.read.parquet(dir), "vec_id", query, 10, pqBooks)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq

      val compacted = Pq.compactCodes(spark, dir, maxFilesPerCluster = 2)
      assert(compacted.nonEmpty)
      // fewer files, identical rows and probe ranking
      val after = files(_ => true).size
      assert(after < before, s"expected compaction to shrink $before files, got $after")
      val codes = spark.read.parquet(dir)
      assert(codes.count() == pqVecs.size.toLong)
      assert(codes.select("vec_id").distinct().count() == pqVecs.size.toLong)
      val got = Pq.adcTopKFromCodes(codes, "vec_id", query, 10, pqBooks)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      assert(got == ref)
      // the newest batch id survives compaction, so a checkpoint-frontier
      // replay still dynamic-overwrites its own partitions (idempotent)
      assert(files(_ == s"batch=${batches.size - 1}").nonEmpty)
      Pq.appendCodesBatch(batches.last.toDF("vec_id", "embedding"), "embedding",
        "vec_id", cents, pqBooks, dir, (batches.size - 1).toLong)
      assert(spark.read.parquet(dir).count() == pqVecs.size.toLong)
      // merged partitions carry negative ids — re-compaction is collision-free
      Pq.compactCodes(spark, dir, maxFilesPerCluster = 1, targetFiles = 1)
      assert(spark.read.parquet(dir).select("vec_id").distinct().count()
        == pqVecs.size.toLong)
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("streaming PQ ingest self-compacts codes on its batch schedule") {
    import graft.streaming.IngestPq
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cents = Pq.coarseCentroids(PqDim, k = 4, planeOffset = 950)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_stream_compact").toString
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    // four micro-batches, compaction every 2: fires after batchIds 1 and 3,
    // so all but the frontier batch dirs merge into negative ids
    val q = IngestPq.ingestToCodes(
      input.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
      cents, pqBooks, dir,
      compactEveryBatches = 2, compactMaxFiles = 1, compactKeepLatestBatches = 1)
    try {
      pqVecs.grouped(10).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    def batchDirs: Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) :+ f else Seq.empty
      walk(new java.io.File(dir)).map(_.getName).filter(_.startsWith("batch="))
    }
    // evidence the wired compactor ran: merged (negative-id) partitions
    // exist, and the replay frontier (the newest batch id) survived
    assert(batchDirs.exists(_.startsWith("batch=-")),
      s"expected merged negative-id batch partitions, got $batchDirs")
    assert(batchDirs.contains("batch=3"), s"frontier batch must survive: $batchDirs")
    // nothing lost or duplicated, probe ranking ≡ the fused one-shot ADC
    val codes = spark.read.parquet(dir)
    assert(codes.count() == pqVecs.size.toLong)
    assert(codes.select("vec_id").distinct().count() == pqVecs.size.toLong)
    val query = pqVecs(5)._2.map(_.toDouble).toSeq
    val got = Pq.adcTopKFromCodes(codes, "vec_id", query, 10, pqBooks)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    val ref = Pq.adcTopK(pqVecs.toDF("vec_id", "embedding"),
        "embedding", "vec_id", query, 10, pqBooks)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
    assert(got == ref)
    graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("compactCodes: interrupted swap rolls forward from the manifest") {
    val cents = Pq.coarseCentroids(PqDim, k = 4, planeOffset = 950)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_crash").toString
    try {
      pqVecs.grouped(10).zipWithIndex.foreach { case (b, i) =>
        Pq.appendCodesBatch(b.toDF("vec_id", "embedding"), "embedding", "vec_id",
          cents, pqBooks, dir, i.toLong)
      }
      val ref = spark.read.parquet(dir).select("vec_id").distinct().count()
      // simulate a crash after the rename but before the deletes: a cluster
      // holds both the merged batch=-1 AND a stale batch dir listed in a
      // leftover manifest — the next compactCodes call must finish the swap
      val cluster = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("cluster=")).head
      val stale = cluster.listFiles().filter(_.getName.startsWith("batch=")).head
      val merged = new java.io.File(cluster, "batch=-1")
      // "merged" partition := a copy of the stale batch (same rows)
      java.nio.file.Files.createDirectory(merged.toPath)
      stale.listFiles().foreach { f =>
        java.nio.file.Files.copy(f.toPath, merged.toPath.resolve(f.getName))
      }
      java.nio.file.Files.write(new java.io.File(cluster, "_graft_compacting").toPath,
        stale.getName.getBytes("UTF-8"))
      Pq.compactCodes(spark, dir, maxFilesPerCluster = 1000000) // recovery only
      assert(!stale.exists, "roll-forward must delete the manifest-listed dir")
      assert(!new java.io.File(cluster, "_graft_compacting").exists)
      assert(spark.read.parquet(dir).select("vec_id").distinct().count() == ref)
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  // two near-dup pairs on orthogonal axes, a loner, and a mid vector below
  // every pair threshold — the LSH-index fixtures
  private lazy val lshVecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.01f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.01f, 0.99f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f)),
    (5L, Array(0.5f, 0.5f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("persisted LSH signature index: pairs ≡ the in-memory multi-table path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_idx").toString
    try {
      // two-half build exercises the append path streaming ingest rides
      Ann.writeLshSigIndex(lshVecs.where(col("vec_id") % 2 === 0), "embedding",
        "vec_id", dir, dim = 3, bits = 8, tables = 6, prefixBits = 3)
      Ann.writeLshSigIndex(lshVecs.where(col("vec_id") % 2 =!= 0), "embedding",
        "vec_id", dir, dim = 3, bits = 8, tables = 6, prefixBits = 3,
        mode = "append")
      def pairSet(df: org.apache.spark.sql.DataFrame) =
        df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fromIdx = pairSet(Ann.cosinePairsFromLshIndex(
        spark, dir, lshVecs, "embedding", "vec_id", 0.95))
      val direct = pairSet(Ann.cosineNearDuplicatesMultiTable(
        lshVecs, "embedding", "vec_id", 0.95, dim = 3, bits = 8, tables = 6))
      assert(fromIdx == direct)
      assert(fromIdx == Set((0L, 1L), (2L, 3L)))
      // parameter drift on append is rejected, not silently mixed
      intercept[IllegalArgumentException] {
        Ann.writeLshSigIndex(lshVecs, "embedding", "vec_id", dir,
          dim = 3, bits = 4, tables = 6, prefixBits = 3, mode = "append")
      }
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("LSH index probe prunes partitions and finds the batch's near-dups") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh_probe").toString
    try {
      Ann.writeLshSigIndex(lshVecs, "embedding", "vec_id", dir,
        dim = 3, bits = 8, tables = 6, prefixBits = 3)
      val batch = Seq((100L, Array(0.999f, 0.001f, 0.0f))).toDF("vec_id", "embedding")
      val probe = Ann.lshProbeIndex(spark, dir, lshVecs, batch,
        "embedding", "vec_id", 0.95)
      // the layout scan carries a PartitionFilter on tp — planning-time
      // pruning, unprobed signature directories never open
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("tp"), plan)
      val got = probe.select("batch_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((100L, 0L), (100L, 1L)))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(dir))
  }

  test("IngestLsh streaming face: micro-batches dedup against earlier ones, index self-compacts") {
    import graft.streaming.IngestLsh
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("graft_lsh_stream").toString
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    // compaction fires after batch 2 (batchId 1); prefixBits=1 keeps the tp
    // space small so both batches hit shared partition dirs
    val q = IngestLsh.ingestWithDedup(
      input.toDF().toDF("vec_id", "embedding"), idx, cor, "embedding", "vec_id",
      threshold = 0.95, dim = 3, bits = 8, tables = 6, prefixBits = 1,
      compactEveryBatches = 2, compactMaxFiles = 1)
    try {
      def corpusIds = spark.read.parquet(cor)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      input.addData(Seq(
        (0L, Array(1.0f, 0.0f, 0.0f)),
        (1L, Array(0.99f, 0.01f, 0.0f)),  // collapses onto 0 in-batch
        (2L, Array(0.0f, 1.0f, 0.0f))))
      q.processAllAvailable()
      assert(corpusIds == Set(0L, 2L))
      input.addData(Seq(
        (10L, Array(3.0f, 0.0f, 0.0f)),   // cosine 1 vs indexed 0 → dropped
        (11L, Array(0.0f, 0.0f, 1.0f)))) // new direction → survives
      q.processAllAvailable()
      assert(corpusIds == Set(0L, 2L, 11L))
      // the wired compactor ran over the tp= partitions
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val dataFiles = walk(new java.io.File(idx)).filter(f =>
        f.getName.endsWith(".parquet") && f.getParentFile.getName.startsWith("tp="))
      assert(dataFiles.exists(_.getName.startsWith("graft-compact-")),
        s"expected compactor-written files, got ${dataFiles.map(_.getName)}")
      assert(dataFiles.groupBy(_.getParentFile.getName).values.forall(_.size == 1))
      // probes across the rewrite still see everything indexed so far
      input.addData(Seq((20L, Array(0.0f, 2.0f, 0.0f)))) // cosine 1 vs 2 → dropped
      q.processAllAvailable()
      assert(corpusIds == Set(0L, 2L, 11L))
    } finally {
      q.stop()
      graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
    }
  }

  test("IngestLsh ladder: in-batch collapse, cross-batch probe, replay self-heals") {
    import graft.streaming.IngestLsh
    val root = java.nio.file.Files.createTempDirectory("graft_lsh_ingest").toString
    val (idx, cor) = (s"$root/index", s"$root/corpus")
    try {
      def run(b: org.apache.spark.sql.DataFrame): Unit =
        IngestLsh.processBatch(b, idx, cor, "embedding", "vec_id",
          threshold = 0.95, dim = 3, bits = 8, tables = 6, prefixBits = 3)
      def corpusIds = spark.read.parquet(cor)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      // batch 1: each near-dup pair collapses to its min id in-batch
      run(lshVecs)
      assert(corpusIds == Set(0L, 2L, 4L, 5L))
      // batch 2: 10 is a scaled copy of 0 (cosine 1 → probe drops it),
      // 11 is a new direction (survives), 12 is a zero vector (rejected)
      val batch2 = Seq(
        (10L, Array(2.0f, 0.0f, 0.0f)),
        (11L, Array(0.6f, -0.8f, 0.0f)),
        (12L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
      run(batch2)
      assert(corpusIds == Set(0L, 2L, 4L, 5L, 11L))
      // at-least-once replay of batch 2: every live row lands at cosine 1
      // against its first copy — nothing appends twice
      run(batch2)
      assert(spark.read.parquet(cor).count() == 5L)
      assert(corpusIds == Set(0L, 2L, 4L, 5L, 11L))
    } finally graft.operators.Utils.deleteRecursively(java.nio.file.Paths.get(root))
  }
}
