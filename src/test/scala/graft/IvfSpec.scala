package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Ivf}

/** IVF coarse-quantizer ANN: training determinism, probe pruning, and the
  * exact-at-full-probe contract. */
class IvfSpec extends SparkTestBase {
  import spark.implicits._

  // four well-separated 2D clusters, 10 points each
  private lazy val vecs = (0 until 40).map { i =>
    val (cx, cy) = Seq((10f, 0f), (-10f, 0f), (0f, 10f), (0f, -10f))(i % 4)
    (i.toLong, Array(cx + (i / 4) * 0.1f, cy + (i / 4) * 0.05f))
  }.toDF("vec_id", "embedding")

  test("kmeans is deterministic and separates the clusters") {
    val c1 = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 5)
    val c2 = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    // each centroid should sit near one of the four cluster centers
    val centers = Seq((10.0, 0.0), (-10.0, 0.0), (0.0, 10.0), (0.0, -10.0))
    c1.foreach { c =>
      assert(centers.exists { case (x, y) =>
        math.abs(c(0) - x) < 1.5 && math.abs(c(1) - y) < 1.5 }, c.toSeq)
    }
    // every point lands in the cluster of its own center
    val sizes = Ivf.withCluster(vecs, "embedding", c1)
      .groupBy("cluster").count().collect().map(_.getLong(1))
    assert(sizes.sorted.toSeq == Seq(10L, 10L, 10L, 10L))
  }

  test("k = 1 assigns everything to cluster 0 (least() arity guard)") {
    val cents = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 1, iters = 2)
    assert(cents.length == 1)
    val clusters = Ivf.withCluster(vecs, "embedding", cents)
      .select("cluster").distinct().collect().map(_.getInt(0)).toSeq
    assert(clusters == Seq(0))
    val top = Ivf.ivfTopK(vecs, "embedding", "vec_id", cents, Seq(10.0, 0.5), 3, nprobe = 1)
    assert(top.count() == 3)
  }

  test("full probe equals brute force; partial probe stays in-cluster") {
    val cents = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 5)
    val q = Seq(10.0, 0.5)
    val brute = Ann.bruteForceTopK(vecs, "embedding", "vec_id", q, 5)
      .collect().map(_.getLong(0)).toSeq
    val full = Ivf.ivfTopK(vecs, "embedding", "vec_id", cents, q, 5, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute)
    val one = Ivf.ivfTopK(vecs, "embedding", "vec_id", cents, q, 5, nprobe = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(one == brute) // the true neighbours all live in the probed cluster
  }

  test("streaming ingest: two micro-batches yield the batch layout's exact probe") {
    import graft.streaming.IngestIvf
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = "target/ingest_ivf_layout"
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    val cents = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 5)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Array[Float])]
    val q = IngestIvf.ingestToClustered(
      input.toDF().toDF("vec_id", "embedding"), "embedding", cents, path)
    val rows = vecs.as[(Long, Array[Float])].collect().toSeq
    try {
      // batches share clusters (both halves contain all four centers), so
      // the append path must MERGE partition directories, not replace them
      input.addData(rows.take(20))
      q.processAllAvailable()
      input.addData(rows.drop(20))
      q.processAllAvailable()
    } finally q.stop()
    val query = Seq(10.0, 0.5)
    val streamed = Ivf.ivfTopKFromClustered(
      spark, path, "embedding", "vec_id", cents, query, 5, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    val brute = Ann.bruteForceTopK(vecs, "embedding", "vec_id", query, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(streamed == brute)
    // nothing lost or duplicated across the appends
    assert(spark.read.parquet(path).count() == 40L)
  }

  test("clusterStats: counts, extrema, and inertia match hand computation") {
    val cents = Array(Array(10.0, 0.0), Array(-10.0, 0.0), Array(0.0, 10.0), Array(0.0, -10.0))
    val stats = Ivf.clusterStats(vecs, "embedding", cents)
      .orderBy("cluster").collect()
    assert(stats.map(_.getLong(1)).toSeq == Seq(10L, 10L, 10L, 10L))
    // hand-compute cluster 0's members: i % 4 == 0, v = (10 + (i/4)*0.1, (i/4)*0.05)
    val d2s = (0 until 10).map { j =>
      // mirror the float-valued inputs exactly
      val vx = (10f + j * 0.1f).toDouble; val vy = (0f + j * 0.05f).toDouble
      (100.0 - 2.0 * (vx * 10.0 + vy * 0.0)) + (vx * vx + vy * vy)
    }
    val r0 = stats(0)
    assert(r0.getDouble(2) == d2s.min)
    assert(r0.getDouble(3) == d2s.max)
    val expectedInertia = d2s.map(d => BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(BigDecimal(r0.getString(4)) == expectedInertia)
  }

  test("vector_sum aggregate matches the posexplode formulation it replaced") {
    val byHand = vecs
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(sum(col("x").cast("double")).as("s"))
      .orderBy("pos").collect().map(_.getDouble(1)).toSeq
    val fused = vecs.repartition(3)
      .agg(graft.functions.VectorFunctions.vectorSum(col("embedding")).as("vs"))
      .select(col("vs.sums"), col("vs.n")).first()
    assert(fused.getLong(1) == 40L)
    val sums = fused.getSeq[Double](0)
    // same values up to reassociation of the double sum across partitions
    sums.zip(byHand).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9, (a, b)) }
    // training plan carries NO Generate (posexplode) node
    val plan = vecs
      .groupBy(col("vec_id") % 2).agg(graft.functions.VectorFunctions.vectorSum(col("embedding")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("sample-trained kmeans: full probe stays exact, training reads the sample only") {
    val cents = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 3,
      trainFraction = 0.5)
    assert(cents.length == 4)
    val q = Seq(10.0, 0.5)
    val brute = Ann.bruteForceTopK(vecs, "embedding", "vec_id", q, 5)
      .collect().map(_.getLong(0)).toSeq
    val full = Ivf.ivfTopK(vecs, "embedding", "vec_id", cents, q, 5, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    assert(full == brute) // full probe is exact whatever the centroids
    // determinism: the md5 sample is content-keyed, so retraining agrees
    val again = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 3,
      trainFraction = 0.5)
    assert(cents.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("clustered layout prunes unprobed partitions at scan time") {
    val cents = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 5)
    val path = "target/ivf_clustered"
    Ivf.writeClustered(vecs, "embedding", cents, path)
    val topk = Ivf.ivfTopKFromClustered(spark, path, "embedding", "vec_id",
      cents, Seq(10.0, 0.5), 5, nprobe = 1)
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"), plan)
    val brute = Ann.bruteForceTopK(vecs, "embedding", "vec_id", Seq(10.0, 0.5), 5)
      .collect().map(_.getLong(0)).toSeq
    assert(topk.collect().map(_.getLong(0)).toSeq == brute)
  }

  test("append-only ingest: frozen-centroid assignment, pruning still holds") {
    val cents = Ivf.kmeansCentroids(vecs, "embedding", "vec_id", k = 4, iters = 5)
    val path = "target/ivf_append"
    Ivf.writeClustered(vecs, "embedding", cents, path)
    // a later delivery: ids 100+, same distribution
    val delivery = (0 until 8).map { i =>
      val (cx, cy) = Seq((10f, 0f), (-10f, 0f), (0f, 10f), (0f, -10f))(i % 4)
      (100L + i, Array(cx + 0.3f, cy - 0.2f))
    }.toDF("vec_id", "embedding")
    Ivf.appendClustered(delivery, "embedding", cents, path)
    // combined layout answers exactly like brute force over the union
    val all = vecs.union(delivery)
    val topk = Ivf.ivfTopKFromClustered(spark, path, "embedding", "vec_id",
      cents, Seq(10.0, 0.5), 5, nprobe = 4)
    val brute = Ann.bruteForceTopK(all, "embedding", "vec_id", Seq(10.0, 0.5), 5)
      .collect().map(_.getLong(0)).toSeq
    assert(topk.collect().map(_.getLong(0)).toSeq == brute)
    // appended rows landed inside existing cluster partitions (no new
    // top-level dirs) and partial probes still prune at scan time
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("cluster=")).sorted
    assert(dirs.length == 4, dirs.toSeq)
    val partial = Ivf.ivfTopKFromClustered(spark, path, "embedding", "vec_id",
      cents, Seq(10.0, 0.5), 5, nprobe = 1)
    val plan = partial.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"), plan)
  }
}
