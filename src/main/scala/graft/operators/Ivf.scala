package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour: a k-means coarse
  * quantizer assigns every vector to its nearest centroid; queries probe
  * only the `nprobe` nearest clusters. This is the second scale path for
  * similarity search besides hyperplane LSH ([[Ann]]):
  *
  *   - training (Lloyd iterations) is a handful of narrow passes — the
  *     per-iteration shuffle carries (cluster, dim, partial-sum) rows, not
  *     vectors;
  *   - centroids are tiny (k × dim doubles) and live on the driver, so
  *     cluster assignment is a pure codegen'd expression (argmin over k
  *     dot products) — no join;
  *   - at scale the corpus is written `partitionBy(cluster)`
  *     ([[writeClustered]]); probing then prunes whole files at scan time
  *     (`PartitionFilters` in the plan — see `IvfSpec`), so a query reads
  *     nprobe/k of the data;
  *   - `nprobe = k` degrades to exact brute force, which is what makes the
  *     driver query oracle-checkable against the exact top-k SQL.
  *
  * Determinism: init centroids are the k lowest-id vectors and iteration
  * count is fixed, so training is reproducible run-to-run and engine-to-
  * engine (no RNG).
  */
object Ivf {

  /** Squared-distance ranking expression: argmin_c |v-c|² = argmin_c
    * (|c|² - 2·v·c); |v|² is constant per row and drops out. */
  private def clusterExpr(vec: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length == 1) lit(0) // least() needs >= 2 args
    else {
      val ranked = centroids.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(x => x * x).sum
        struct((lit(c2) - lit(2.0) * Ann.dot(vec, Ann.vecLit(c.toSeq))).as("d"),
          lit(i).as("i"))
      }
      least(ranked.toIndexedSeq: _*).getField("i")
    }

  /** Deterministic Lloyd k-means over `vecCol`. Returns k × dim centroids.
    * Empty clusters keep their previous centroid.
    *
    * `trainFraction < 1` trains on a deterministic md5-keyed sample
    * ([[Sampling.hashSample]] on `idCol`) — the 100 TB path: a coarse
    * quantizer's centroids converge on a sample; only ASSIGNMENT must see
    * every row. Each Lloyd iteration is ONE job over the training rows:
    * codegen'd argmin assignment feeding the fused [[graft.functions.VectorSum]]
    * aggregate (element-wise in-place sums — no dim× posexplode fan-out),
    * collecting k tiny (sums, n) buffers to the driver. */
  def kmeansCentroids(
      df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, trainFraction: Double = 1.0): Array[Array[Double]] = {
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    // every iteration (and the init scan) re-reads the training rows; a
    // sample is far smaller than the corpus, so persist it (the full-corpus
    // path deliberately does NOT persist — at scale it wouldn't fit, and
    // the scan cost is then inherent to full-corpus training)
    val sampled = trainFraction < 1.0
    val train =
      if (sampled)
        Sampling.hashSample(df, idCol, trainFraction)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    try {
      var centroids: Array[Array[Double]] = train
        .orderBy(col(idCol)).limit(k)
        .select(col(vecCol)).collect()
        .map(_.getSeq[Number](0).map(_.doubleValue()).toArray)
      require(centroids.length == k, s"need at least $k vectors to train $k centroids")
      for (_ <- 0 until iters) {
        val stats = train
          .select(clusterExpr(col(vecCol), centroids).as("cluster"), col(vecCol).as("v"))
          .groupBy("cluster")
          .agg(graft.functions.VectorFunctions.vectorSum(col("v")).as("vs"))
          .collect()
        val next = centroids.map(_.clone())
        stats.foreach { r =>
          val c = r.getInt(0)
          val vs = r.getStruct(1)
          val sums = vs.getSeq[Double](0)
          val n = vs.getLong(1)
          if (n > 0) next(c) = sums.map(_ / n).toArray
        }
        centroids = next
      }
      centroids
    } finally if (sampled) train.unpersist()
  }

  /** Oracle-portable deterministic twin of [[kmeansCentroids]]: training
    * sums accumulate per (cluster, dimension) in DECIMAL(38,12) — exact
    * and aggregation-order-independent once each component rounds (the
    * [[clusterStats]] inertia discipline) — and each new centroid
    * component is ONE double division of the decimal sum's plain decimal
    * string by the member count (decimal→string→double is the correctly-
    * rounded bridge both engines share). Training is therefore
    * bit-reproducible across engines, partitionings, and runs, which is
    * what lets a DuckDB CTE unroll hash-check the DATA-TRAINED IVF path
    * end to end (q_ann_ivf_trained) rather than only the deterministic
    * plane-family parameterization.
    *
    * The per-iteration pass posexplodes the TRAINING rows ((cluster, dim)
    * grouped decimal sums — a dim× fan-out); coarse-quantizer training is
    * sample-bounded by design at any corpus scale, and the production
    * fast path remains [[kmeansCentroids]]'s fused double VectorSum.
    * Same contract otherwise: k lowest-id init, fixed iterations, empty
    * clusters keep their previous centroid. */
  def kmeansCentroidsPortable(
      df: DataFrame, vecCol: String, idCol: String,
      k: Int, iters: Int, trainFraction: Double = 1.0): Array[Array[Double]] = {
    require(trainFraction > 0 && trainFraction <= 1.0,
      s"trainFraction must be in (0, 1], got $trainFraction")
    val base =
      if (trainFraction < 1.0) Sampling.hashSample(df, idCol, trainFraction) else df
    val train = base
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Array[Array[Double]] = train
        .orderBy(col("__id")).limit(k)
        .select(col("__v")).collect()
        .map(_.getSeq[Double](0).toArray)
      require(centroids.length == k, s"need at least $k vectors to train $k centroids")
      for (_ <- 0 until iters) {
        val stats = train
          .select(clusterExpr(col("__v"), centroids).as("cluster"),
            posexplode(col("__v")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim")
          .agg(count(lit(1)).as("n"), sum(col("x").cast("decimal(38,12)")).as("s"))
          .collect()
        val next = centroids.map(_.clone())
        stats.foreach { r =>
          val c = r.getInt(0)
          val d = r.getInt(1)
          val n = r.getLong(2)
          if (n > 0) next(c)(d) =
            java.lang.Double.parseDouble(r.getDecimal(3).toPlainString) / n
        }
        centroids = next
      }
      centroids
    } finally { train.unpersist(); () }
  }

  /** Attach the cluster id (codegen'd argmin — no join, no shuffle). */
  def withCluster(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame =
    df.withColumn("cluster", clusterExpr(col(vecCol), centroids))

  /** Write the corpus partitioned by cluster so probes prune at scan time. */
  def writeClustered(
      df: DataFrame, vecCol: String, centroids: Array[Array[Double]], path: String): Unit =
    withCluster(df, vecCol, centroids)
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Append-only ingestion into a [[writeClustered]] layout: assign ONLY
    * the new rows under the FROZEN centroids and append their files —
    * existing partitions are untouched, so ingest cost is proportional to
    * the delivery, not the corpus (re-quantizing 100 TB per append would
    * dwarf the ingest). Probes keep pruning at scan time: appended files
    * land inside the same `cluster=N` partition directories.
    *
    * The trade: centroids drift as the distribution shifts, degrading
    * recall at a given nprobe (never correctness — `nprobe = k` stays
    * exact). Retrain + rewrite when drift matters; [[kmeansCentroids]]
    * with `trainFraction` keeps retraining cheap. */
  def appendClustered(
      df: DataFrame, vecCol: String, centroids: Array[Array[Double]], path: String): Unit =
    withCluster(df, vecCol, centroids)
      .write.mode("append").partitionBy("cluster").parquet(path)

  /** The `nprobe` clusters nearest to the query (driver-side — centroids
    * are tiny). */
  def probeClusters(centroids: Array[Array[Double]], query: Seq[Double], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      val d = c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum
      (d, i)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq

  /** IVF top-k by cosine: probe the nearest clusters, brute-force within.
    * `nprobe = centroids.length` is exact. */
  def ivfTopK(
      df: DataFrame, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], query: Seq[Double],
      k: Int, nprobe: Int): DataFrame = {
    val probed = probeClusters(centroids, query, nprobe)
    withCluster(df, vecCol, centroids)
      .where(col("cluster").isin(probed: _*))
      .select(col(idCol), Ann.cosine(col(vecCol), Ann.vecLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Per-cluster quality rollup for a coarse quantizer: member count and
    * squared-distance extrema/total per cluster — the monitoring pass
    * that tells an IVF deployment when centroid drift warrants a retrain
    * (rising inertia, emptying clusters, ballooning max distance).
    *
    * Zero joins: assignment and the per-row squared distance are pure
    * codegen'd expressions (d² = (|c|² − 2·v·c) + |v|², the fixed op
    * order every engine reproduces), and the rollup is one grouped
    * aggregation with k output rows. `inertia` accumulates the per-row
    * double in DECIMAL(38,6) — exact and order-independent once each row
    * is rounded, so the total ignores aggregation order — and is emitted
    * as a string so the 38-digit value never rides a float bridge. */
  def clusterStats(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame = {
    val v = col(vecCol)
    def d2Expr(c: Array[Double]): Column = {
      val c2 = c.map(x => x * x).sum
      (lit(c2) - lit(2.0) * Ann.dot(v, Ann.vecLit(c.toSeq))) + Ann.dot(v, v)
    }
    val d2 =
      if (centroids.length == 1) d2Expr(centroids(0))
      else centroids.zipWithIndex.tail.foldLeft(
        when(col("cluster") === 0, d2Expr(centroids(0)))) {
        case (acc, (c, i)) => acc.when(col("cluster") === i, d2Expr(c))
      }
    withCluster(df, vecCol, centroids)
      .withColumn("d2", d2)
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(
        count(lit(1)).as("n"),
        min(col("d2")).as("min_d2"),
        max(col("d2")).as("max_d2"),
        sum(col("d2").cast("decimal(38,6)")).cast("string").as("inertia"))
  }

  /** Same, over a [[writeClustered]] layout: the cluster filter becomes a
    * partition filter, so unprobed clusters are never read. */
  def ivfTopKFromClustered(
      spark: SparkSession, path: String, vecCol: String, idCol: String,
      centroids: Array[Array[Double]], query: Seq[Double],
      k: Int, nprobe: Int): DataFrame = {
    val probed = probeClusters(centroids, query, nprobe)
    spark.read.parquet(path)
      .where(col("cluster").isin(probed: _*))
      .select(col(idCol), Ann.cosine(col(vecCol), Ann.vecLit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }
}
