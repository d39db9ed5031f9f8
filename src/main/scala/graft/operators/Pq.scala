package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-side half of the standard
  * IVF+PQ ANN recipe (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): the embedding splits into M subspaces,
  * each sub-vector is replaced by the index of its nearest codebook entry,
  * and a query scores a vector by summing per-subspace distances looked up
  * from a precomputed table (asymmetric distance computation, ADC).
  *
  * Why it matters at 100 TB: a 64-float embedding is 256 bytes; its PQ code
  * is M small ints (M bytes at K ≤ 256). A scored scan over a persisted
  * codes table reads ~64× fewer bytes than the raw vectors, and the
  * per-vector score is M array lookups + M−1 adds instead of a dim-length
  * dot product — the scan-side complement of [[Ivf]]'s partition pruning
  * (prune lists with IVF, score cheap with PQ).
  *
  * Determinism/oracle story (the [[Ann]] pattern): codebooks here derive
  * from the shared [[graft.functions.LshPlanes]] family (a disjoint plane
  * offset), so they embed as literals in oracle SQL; production would train
  * them per subspace with [[Ivf.kmeansCentroids]] — the encode/ADC algebra
  * is identical for any codebook array. Every distance is a fixed-order
  * double expression: argmin ties resolve to the SMALLEST code on both
  * engines (Spark `array_position(array_min)` ≡ DuckDB
  * `list_position(list_min)`), so codes, ADC sums, and the final ranking
  * are bit-identical.
  */
object Pq {

  /** Deterministic codebooks: entry (m, j) is the `dim/subspaces`-length
    * plane vector at global index `planeOffset + m·codebookSize + j`. */
  def codebooks(dim: Int, subspaces: Int, codebookSize: Int,
      planeOffset: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % subspaces == 0,
      s"dim $dim not divisible into $subspaces subspaces")
    val subdim = dim / subspaces
    (0 until subspaces).map { m =>
      (0 until codebookSize).map { j =>
        graft.functions.LshPlanes.vector(planeOffset + m * codebookSize + j, subdim)
      }
    }
  }

  /** Code column for subspace `m`: argmin_j ‖v_m − c_mj‖², computed as
    * argmin_j (‖c_mj‖² − 2·v_m·c_mj) — the ‖v_m‖² term is constant across
    * j and drops out. Ties take the smallest j (`array_position` returns
    * the FIRST index equal to the min, mirroring DuckDB `list_position`). */
  def codeExpr(vecCol: Column, books: Seq[Seq[Seq[Double]]], m: Int): Column = {
    val subdim = books(m).head.length
    val sub = slice(vecCol, m * subdim + 1, subdim)
    val dists = books(m).map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * Ann.dot(sub, Ann.vecLit(c))
    }
    val darr = array(dists: _*)
    (array_position(darr, array_min(darr)) - 1).cast("int")
  }

  /** Encode a vector table to (id, code_0 … code_{M−1}) — the persisted PQ
    * layout (one scan, pure codegen'd column algebra, no shuffle). */
  def encode(df: DataFrame, vecCol: String, idCol: String,
      books: Seq[Seq[Seq[Double]]]): DataFrame =
    df.select(col(idCol).as("id") +:
      books.indices.map(m => codeExpr(col(vecCol), books, m).as(s"code_$m")): _*)

  /** Driver-side ADC table: d(m)(j) = ‖q_m − c_mj‖², accumulated
    * left-to-right in subspace order — the fixed double-op sequence the
    * oracle mirrors term by term. */
  def adcTable(query: Seq[Double], books: Seq[Seq[Seq[Double]]]): Seq[Seq[Double]] =
    books.zipWithIndex.map { case (book, m) =>
      val subdim = book.head.length
      val qm = query.slice(m * subdim, (m + 1) * subdim)
      book.map { c =>
        var s = 0.0
        var i = 0
        while (i < subdim) { val d = qm(i) - c(i); s += d * d; i += 1 }
        s
      }
    }

  /** ADC top-k over a codes table (`encode`'s shape): per-vector score is
    * M literal-array lookups + adds; ranking ascends by (adc_dist, id).
    * `orderBy().limit(k)` executes as per-partition top-k heaps +
    * driver merge (TakeOrderedAndProject) — no global sort. */
  def adcTopKFromCodes(codes: DataFrame, idCol: String, query: Seq[Double],
      k: Int, books: Seq[Seq[Seq[Double]]]): DataFrame = {
    val table = adcTable(query, books)
    val adc = table.zipWithIndex.map { case (row, m) =>
      element_at(array(row.map(lit): _*), col(s"code_$m") + 1)
    }.reduce(_ + _)
    codes.select(col(idCol), adc.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
      .limit(k)
  }

  /** ADC top-k straight off the raw vectors (encode fused into the scan —
    * the no-persisted-layout form). */
  def adcTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, books: Seq[Seq[Seq[Double]]]): DataFrame =
    adcTopKFromCodes(encode(df, vecCol, idCol, books), "id", query, k, books)

  // ---- IVF + PQ composition (the full FAISS-style recipe) ---------------

  /** Deterministic full-dim coarse centroids from the plane family —
    * literal-embeddable like the codebooks; production trains them with
    * [[Ivf.kmeansCentroids]] (the probe/score algebra is identical for any
    * centroid array). */
  def coarseCentroids(dim: Int, k: Int, planeOffset: Int): Seq[Seq[Double]] =
    (0 until k).map(j => graft.functions.LshPlanes.vector(planeOffset + j, dim))

  /** Coarse-cluster assignment: argmin_j ‖v − c_j‖² via the same
    * c²−2·v·c / first-on-ties form as [[codeExpr]]. */
  def assignExpr(vecCol: Column, cents: Seq[Seq[Double]]): Column = {
    val dists = cents.map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * Ann.dot(vecCol, Ann.vecLit(c))
    }
    val darr = array(dists: _*)
    (array_position(darr, array_min(darr)) - 1).cast("int")
  }

  /** Driver-side probe list: the `nprobe` coarse clusters nearest to the
    * query, by the same fixed-order c²−2·q·c distances (ties by index). */
  def probeClusters(query: Seq[Double], cents: Seq[Seq[Double]],
      nprobe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x * x).sum
      var dot = 0.0
      var i = 0
      while (i < query.length) { dot += query(i) * c(i); i += 1 }
      (c2 - 2.0 * dot, j)
    }.sorted.take(nprobe).map(_._2)

  /** The persisted-codes row shape: (id, cluster, code_0 … code_{M−1}) —
    * coarse assignment + PQ codes in one zero-shuffle projection. This is
    * the frame [[graft.OpsPack]] persists `partitionBy(cluster)` and the
    * streaming ingest ([[graft.streaming.IngestPq]]) appends batch by
    * batch; the id column keeps its name so probes read it back as-is. */
  def encodeClustered(df: DataFrame, vecCol: String, idCol: String,
      cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]]): DataFrame =
    df.select(col(idCol) +:
      assignExpr(col(vecCol), cents).as("cluster") +:
      books.indices.map(m => codeExpr(col(vecCol), books, m).as(s"code_$m")): _*)

  /** Append-only ingestion into a cluster-partitioned codes layout (the
    * [[Ivf.appendClustered]] pattern): encode ONLY the new rows under the
    * FROZEN centroids/codebooks and append their files — ingest cost is
    * proportional to the delivery, existing partitions untouched, and
    * probes keep pruning at scan time. */
  def appendCodes(df: DataFrame, vecCol: String, idCol: String,
      cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]], path: String): Unit =
    encodeClustered(df, vecCol, idCol, cents, books)
      .write.mode("append").partitionBy("cluster").parquet(path)

  /** IDEMPOTENT batch append into the codes layout: rows land under
    * `cluster=N/batch=B` and the write is a DYNAMIC partition overwrite,
    * so replaying batch B (foreachBatch's at-least-once delivery) rewrites
    * exactly its own `batch=B` sub-partitions instead of double-appending —
    * the layout is safe without any caller-side done-marker discipline.
    * Probes read the layout unchanged: `cluster` stays the leading
    * partition level, so partition pruning is untouched, and the extra
    * `batch` column is dropped by the probe's projection.
    *
    * DETERMINISTIC-REPLAY ASSUMPTION: idempotency holds because a dynamic
    * overwrite rewrites only the (cluster, batch) partitions PRESENT in
    * the replay. A replay of batch B must therefore deliver the same rows
    * as the original attempt (replayable source, same batchId ⇒ same
    * rows — exactly Structured Streaming's foreachBatch contract); if a
    * replay could drop a cluster the first (possibly partial) attempt
    * wrote, that cluster's stale `cluster=N/batch=B` files would survive.
    * Sources without that guarantee need a caller-side done-marker or a
    * pre-delete of every `batch=B` sub-partition instead. */
  def appendCodesBatch(df: DataFrame, vecCol: String, idCol: String,
      cents: Seq[Seq[Double]], books: Seq[Seq[Seq[Double]]], path: String,
      batchId: Long): Unit =
    encodeClustered(df, vecCol, idCol, cents, books)
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cluster", "batch").parquet(path)

  /** IVF+PQ top-k: assign, keep only the probed clusters' members, ADC-score
    * those. At scale the assignment lives in a cluster-partitioned layout
    * ([[Ivf.writeClustered]]-style), so the probe reads nprobe partition
    * directories of CODES — both pruning (IVF) and cheap scoring (PQ). */
  def ivfPqTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]], nprobe: Int): DataFrame = {
    val probe = probeClusters(query, cents, nprobe)
    val probed = df
      .withColumn("__graft_ivfpq_cluster", assignExpr(col(vecCol), cents))
      .where(col("__graft_ivfpq_cluster").isin(probe: _*))
    adcTopK(probed, vecCol, idCol, query, k, books)
  }

  /** CLASSIC residual-encoded IVF-PQ top-k: each probed vector is PQ-coded
    * on its RESIDUAL v − centroid(cluster) (residuals concentrate near the
    * origin, so one shared codebook quantizes them far better than raw
    * vectors — the Jégou et al. §IV form), and the query builds one ADC
    * table PER PROBED CLUSTER from its own residual q − centroid(c).
    * Same literal-exactness discipline throughout: the residual is a
    * per-element single subtraction (`zip_with`), codes and lookups are
    * the fixed-order expressions of [[codeExpr]]/[[adcTable]], and the
    * per-cluster table dispatch is one CASE over ≤ nprobe branches. */
  def ivfPqResidualTopK(df: DataFrame, vecCol: String, idCol: String,
      query: Seq[Double], k: Int, cents: Seq[Seq[Double]],
      books: Seq[Seq[Seq[Double]]], nprobe: Int): DataFrame = {
    val probe = probeClusters(query, cents, nprobe)
    val centArr = array(cents.map(c => array(c.map(lit): _*)): _*)
    val cluster = assignExpr(col(vecCol), cents)
    val residual = zip_with(col(vecCol).cast("array<double>"),
      element_at(centArr, col("__graft_ivfpq_cluster") + 1),
      (a, b) => a - b)
    val coded = df
      .withColumn("__graft_ivfpq_cluster", cluster)
      .where(col("__graft_ivfpq_cluster").isin(probe: _*))
      .withColumn("__graft_ivfpq_rv", residual)
      .select(col(idCol).as("id") +: col("__graft_ivfpq_cluster").as("cluster") +:
        books.indices.map(m =>
          codeExpr(col("__graft_ivfpq_rv"), books, m).as(s"code_$m")): _*)
    // one ADC table per probed cluster, from the query's residual there
    val tables = probe.map { c =>
      val qr = query.zip(cents(c)).map { case (q, w) => q - w }
      c -> adcTable(qr, books)
    }
    val adc = tables.map { case (c, table) =>
      val s = table.zipWithIndex.map { case (row, m) =>
        element_at(array(row.map(lit): _*), col(s"code_$m") + 1)
      }.reduce(_ + _)
      (c, s)
    }.foldLeft(lit(null).cast("double")) { case (acc, (c, s)) =>
      when(col("cluster") === c, s).otherwise(acc)
    }
    coded.select(col("id"), adc.as("adc_dist"))
      .orderBy(col("adc_dist").asc, col("id").asc)
      .limit(k)
  }

  /** Threshold-gated COMPACTION for the per-batch codes layout: the
    * idempotent `cluster=N/batch=B` scheme ([[appendCodesBatch]])
    * accumulates one file per (cluster, batch), and after thousands of
    * micro-batches a probe's nprobe directories are thousands of tiny
    * files — the classic streaming-ingest small-file tax. This pass
    * rewrites each over-threshold cluster's ELIGIBLE batches into one
    * fresh merged batch partition and deletes them, leaving probe results
    * byte-identical (same rows, same layout contract: `cluster` stays the
    * leading partition level).
    *
    * Replay safety: the newest `keepLatestBatches` batch ids (globally,
    * non-negative ids only) are NEVER compacted — Structured Streaming's
    * at-least-once replay can only redeliver batches at the checkpoint
    * frontier, so keeping the newest id(s) out of the merge preserves
    * [[appendCodesBatch]]'s overwrite-idempotency for exactly the batches
    * that can still be replayed. Merged output lands under a NEGATIVE
    * batch id (min(existing, 0) − 1), which no stream ever writes, so
    * re-compaction cycles are collision-free and themselves compactable.
    *
    * Crash safety without a transaction log, per cluster, in this order:
    * (1) merged rows are written to an underscore-prefixed temp dir
    * (invisible to Spark reads), (2) a manifest file records the batch
    * dirs to delete, (3) the temp dir is atomically renamed to its
    * `batch=<newId>` target, (4) the listed dirs are deleted and the
    * manifest removed. A crash before (3) rolls BACK on the next call
    * (temp + manifest dropped, originals untouched); a crash after (3)
    * rolls FORWARD (listed dirs deleted — the merged partition already
    * holds their rows). Concurrent PROBES during (3)–(4) can see a row
    * twice, so run compaction as the offline maintenance pass it is —
    * same discipline as any compactor without snapshot isolation.
    *
    * Returns the compacted cluster ids. */
  def compactCodes(spark: org.apache.spark.sql.SparkSession, path: String,
      maxFilesPerCluster: Int = 16,
      keepLatestBatches: Int = 1,
      targetFiles: Int = 1): Seq[Int] = {
    require(maxFilesPerCluster > 0 && keepLatestBatches >= 0 && targetFiles > 0,
      s"bad compaction params ($maxFilesPerCluster, $keepLatestBatches, $targetFiles)")
    import org.apache.hadoop.fs.{FileSystem, Path}
    val root = new Path(path)
    val fs: FileSystem = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    def clusterDirs() = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cluster="))
    def batchDirs(c: Path) = fs.listStatus(c).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    def dataFiles(d: Path) = fs.listStatus(d).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    // recover any pass interrupted mid-swap (see crash-safety contract)
    clusterDirs().foreach { c =>
      val manifest = new Path(c.getPath, "_graft_compacting")
      if (fs.exists(manifest)) {
        val tmp = new Path(c.getPath, "_graft_compact_tmp")
        if (fs.exists(tmp)) { // rename never happened: roll back
          fs.delete(tmp, true)
          fs.delete(manifest, false)
        } else {              // merged partition is live: roll forward
          val in = fs.open(manifest)
          val listed = try scala.io.Source.fromInputStream(in).getLines().toSeq
          finally in.close()
          listed.foreach(n => fs.delete(new Path(c.getPath, n), true))
          fs.delete(manifest, false)
        }
      }
    }
    val allBatchIds = clusterDirs().flatMap(c => batchDirs(c.getPath))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).distinct
    val latestKept = allBatchIds.filter(_ >= 0).sorted.reverse.take(keepLatestBatches).toSet
    val compacted = clusterDirs().flatMap { c =>
      val batches = batchDirs(c.getPath)
      val nFiles = batches.map(b => dataFiles(b.getPath).size).sum
      val eligible = batches.filterNot(b =>
        latestKept.contains(b.getPath.getName.stripPrefix("batch=").toLong))
      if (nFiles <= maxFilesPerCluster || eligible.size < 2) None
      else {
        val newId = math.min(
          batches.map(_.getPath.getName.stripPrefix("batch=").toLong).min, 0L) - 1L
        val tmp = new Path(c.getPath, "_graft_compact_tmp")
        fs.delete(tmp, true)
        spark.read.parquet(eligible.map(_.getPath.toString): _*)
          .coalesce(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        val manifest = new Path(c.getPath, "_graft_compacting")
        val out = fs.create(manifest, true)
        try out.write(eligible.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
        finally out.close()
        if (!fs.rename(tmp, new Path(c.getPath, s"batch=$newId")))
          throw new java.io.IOException(s"compaction rename failed under ${c.getPath}")
        eligible.foreach(b => fs.delete(b.getPath, true))
        fs.delete(manifest, false)
        Some(c.getPath.getName.stripPrefix("cluster=").toInt)
      }
    }
    compacted
  }
}
