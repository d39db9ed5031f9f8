package graft
import org.apache.spark.sql.functions._
import graft.operators._

/** Ad-hoc plan/timing inspection main (not part of the driver contract). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).headOption.getOrElse("all_mismatch")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    which match {
      case "all_mismatch" =>
        def timed[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
        }
        val df = SparkEntry.queries("q_compare_all_mismatch")(spark, sf)
        println("=== ALL_MISMATCH PLAN ===")
        df.explain("formatted")
        timed("all_mismatch write")(
          df.write.format("noop").mode("overwrite").save())
        val df2 = SparkEntry.queries("q_compare_all_mismatch")(spark, sf)
        timed("all_mismatch warm")(
          df2.write.format("noop").mode("overwrite").save())
      case "clean_phases" =>
        import graft.operators.{Dedup, TextOps}
        def timed[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
        }
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        val quality = docs.where(!TextOps.lowQualityFlag(col("text")))
        timed("quality count")(println("  rows=" + quality.count()))
        val exact = Dedup.exactDedup(quality, "text", "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed("exact dedup")(println("  rows=" + exact.count()))
        val pairs = Dedup.minhashNearDuplicates(exact, "text", "doc_id", 0.5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed("minhash pairs")(println("  pairs=" + pairs.count()))
        val comp = timed("connected components")(
          Dedup.connectedComponents(pairs))
        timed("components count")(println("  nodes=" + comp.count()))
      case "clean_portable" =>
        import graft.operators.{Dedup, TextOps}
        def timed[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
        }
        val docs = spark.read.parquet(s"$sf/documents.parquet")
        val quality = docs.where(!TextOps.lowQualityFlag(col("text")))
        timed("quality count")(println("  rows=" + quality.count()))
        val exact = Dedup.exactDedup(quality, "text", "doc_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed("exact dedup")(println("  rows=" + exact.count()))
        val pairs = Dedup.minhashNearDuplicatesMd5(exact, "text", "doc_id", 0.5)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed("minhash md5 pairs")(println("  pairs=" + pairs.count()))
        val p2 = pairs.select(col("id1").cast("long").as("a"), col("id2").cast("long").as("b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        timed("cc: edge count")(println("  m=" + p2.count()))
        val edges = timed("cc: collect")(p2.collect())
        println("  edges=" + edges.length)
        val comp = timed("connected components")(
          Dedup.connectedComponents(pairs))
        timed("components count")(println("  nodes=" + comp.count()))
        val full = timed("full cleanCorpus portable construct")(
          Dedup.cleanCorpus(docs, "text", "doc_id", nearDupThreshold = 0.5,
            portableHashes = true))
        timed("full cleanCorpus portable write")(
          full.write.format("noop").mode("overwrite").save())
      case "pagerank_phases" =>
        def timed[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime(); val r = f
          println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
        }
        val o = spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_custkey")
        val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_suppkey")
        val pairs = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val edges = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
        val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
          .persist()
        timed("edges distinct")(println("  m=" + e.count()))
        val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val ed = e.join(broadcast(deg), "src").persist()
        timed("ed")(println("  m=" + ed.count()))
        val nodes = e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
          .distinct().persist()
        timed("nodes")(println("  n=" + nodes.count()))
        var ranks = nodes.withColumn("r", lit(1000000000L))
        for (i <- 1 to 5) {
          val contrib = ed.join(broadcast(ranks), col("src") === col("node"))
            .selectExpr("dst", "r DIV outdeg AS c")
            .groupBy("dst").agg(sum(col("c")).as("s"))
          ranks = nodes.join(broadcast(contrib), col("node") === col("dst"), "left")
            .selectExpr("node", s"150000000 + (85 * coalesce(s, 0L)) DIV 100 AS r")
          ranks = timed(s"iter $i materialize")(ranks.localCheckpoint())
        }
        timed("final count")(println("  n=" + ranks.count()))
      case q =>
        val df = SparkEntry.queries(q)(spark, sf)
        df.explain("formatted")
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
