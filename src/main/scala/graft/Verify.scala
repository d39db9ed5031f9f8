package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries run CONCURRENTLY on a small thread pool (Spark schedules
  * concurrent jobs from one session across the local[32] cores). Round-4
  * evidence for why: the driver's verify run has a wall-clock budget, and a
  * serial sweep of 105 queries finished only 57 of them inside it
  * (CORRECTNESS_r04 covered a hash-ordered prefix of the query map — a time
  * cutoff, not failures; the same sweep completes locally with 0 failures).
  * Overlapping queries hides each one's driver-side planning latency behind
  * the others' executor work, and cuts the sweep ~3-4x. All side-effecting
  * layout caches are double-check-locked ([[Memo]]); persisted index
  * layouts are built once, serially, before the pool starts.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [comma-separated query names — local iteration only]
    val Array(sfDir, outDir) = args.take(2)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // same driver-overhead caps as Bench (see there): plan-description
      // rendering per AQE replan + per-Column stack capture are pure
      // observability costs with the UI off
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.sql.dataFrameQueryContext.enabled", "false")
      // concurrent queries: FAIR keeps one long stage from starving the
      // short queries queued behind it in FIFO order
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_GRAFT_LOCAL_DIR",
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-local"
          else "target/spark-local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dump the oracle SQL FIRST: if the harness kills a long verify run on
    // a wall-clock budget, the queries that DID finish are still checkable
    // (round 4 lost 48 of 105 queries to exactly this — the sweep was cut
    // off mid-run, and everything not yet dumped fell out of the gate).
    writeOracleJson(outDir, only)
    val t0 = System.nanoTime()
    // Build persisted index/layout directories once before fanning out, so
    // no two pooled queries ever race on one layout build (the memo locks
    // would serialize them anyway; doing it here keeps the timing honest
    // and the failure mode obvious).
    try OpsPack.prepareIndexes(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] prepareIndexes failed: ${e.getMessage}")
    }
    val selected = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .sortBy(_._1)
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val futures = selected.map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val q0 = System.nanoTime()
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            System.err.println(
              f"[verify] ${done.incrementAndGet()}%3d/${selected.size} $name%-28s ${(System.nanoTime() - q0) / 1e9}%7.2fs")
          } catch { case e: Throwable =>
            done.incrementAndGet()
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        }
      })
    }
    pool.shutdown()
    // Bounded drain: one hung query (a stuck stream, a wedged state store)
    // must cost its own slot, not the whole dump — oracle_sql.json and all
    // completed outputs are already on disk, so abandoning stragglers at
    // the deadline degrades coverage by exactly the stuck queries.
    val deadlineSec =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_TIMEOUT", "900").toLong
    val drained =
      pool.awaitTermination(deadlineSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!drained) {
      val unfinished = futures.count(!_.isDone)
      System.err.println(
        s"[verify] DEADLINE after ${deadlineSec}s — abandoning $unfinished unfinished queries")
      pool.shutdownNow()
    }
    futures.foreach(f => if (f.isDone) (try f.get() catch { case _: Throwable => () }))
    // Empty-dump guard. One 0-row flake was observed in a pooled sweep
    // (q_graph_ppr_docs, r14: 45 rows in isolation and in 3 immediate
    // full-sweep re-runs, 0 rows once under the 8-thread pool during a
    // host-throttle window); it never reproduced. A 0-row dump is NOT
    // always wrong — q_graph_khop is legitimately empty at sf0.001 (the
    // tiny supplier table has no nation-0 rows; oracle 0 = 0 passes) —
    // so the guard gives a suspicious empty two repair chances and a
    // fingerprint: re-run serially (repairs a transient race), then
    // re-run after dropping every cached plan and refreshing file
    // listings (repairs session-sticky cache poisoning, once per sweep),
    // keeping a stable empty as the real result for the oracle to
    // adjudicate. Re-runs land in a RETRY path and replace the dump only
    // when they produce rows — a failed or still-empty re-run must never
    // destroy a valid (possibly legitimately-empty) dump. Skipped
    // entirely when the drain deadline fired: the wall-clock budget is
    // already gone and the repair work would eat into the harness kill.
    var cachesCleared = false
    if (drained) selected.foreach { case (name, fn) =>
      val p = s"$outDir/$name"
      val empty =
        try spark.read.parquet(p).isEmpty
        catch { case _: Throwable => false } // failed queries: already logged
      if (empty) {
        System.err.println(
          s"[verify] $name dumped 0 rows — serial re-run (pooled-sweep flake guard)")
        val retry = s"$outDir/__retry_$name"
        def rerun(stage: String): Long = {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(retry)
          val n = spark.read.parquet(retry).count()
          System.err.println(s"[verify] $name $stage re-run dumped $n rows")
          if (n > 0L) { // promote the repair; otherwise keep the original
            graft.operators.Utils.deleteRecursively(Paths.get(p))
            Files.move(Paths.get(retry), Paths.get(p))
          }
          n
        }
        try {
          // Staged repair — a stage that changes the result names the layer:
          if (rerun("serial") == 0L) {
            // base-table visibility (a poisoned file listing or scan would
            // zero a source table session-wide) — log anomalies only,
            // distinguishing "read threw" from a genuine 0-row scan
            Seq("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings").foreach { t =>
              try {
                val c = spark.read.parquet(s"$sfDir/$t.parquet").count()
                if (c == 0L) System.err.println(
                  s"[verify] DIAG base table $t count=0 — SCAN/LISTING POISONED")
              } catch { case e: Throwable => System.err.println(
                s"[verify] DIAG base table $t read failed: ${e.getMessage}")
              }
            }
            // session-wide clears at most once per sweep (they drop every
            // cached plan — repeating them per stable-empty query would
            // just slow the remaining retries)
            if (!cachesCleared) {
              cachesCleared = true
              try spark.catalog.clearCache() catch { case _: Throwable => () }
              graft.operators.Dedup.releaseCaches()
              try spark.catalog.refreshByPath(sfDir) catch { case _: Throwable => () }
            }
            if (rerun("post-cache-clear") == 0L)
              System.err.println(s"[verify] $name stable empty — kept as the " +
                "real result (legitimately empty at this SF, or a deep " +
                "poison; the DuckDB oracle adjudicates either way)")
            else System.err.println(s"[verify] $name REPAIRED by cache clear " +
              "— a poisoned cached plan/listing served empty session-wide")
          } else System.err.println(
            s"[verify] $name POOLED-SWEEP FLAKE repaired by plain re-run")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name serial re-run failed: ${e.getMessage}")
        } finally {
          try graft.operators.Utils.deleteRecursively(Paths.get(retry))
          catch { case _: Throwable => () }
        }
      }
    }
    System.err.println(
      f"[verify] all ${selected.size} queries in ${(System.nanoTime() - t0) / 1e9}%.1fs")
    graft.operators.Dedup.releaseCaches()
    spark.stop()
  }

  private def writeOracleJson(outDir: String, only: Set[String]): Unit = {
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
