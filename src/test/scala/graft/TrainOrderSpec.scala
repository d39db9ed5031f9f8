package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainOrder

/** Properties of the deterministic training order: it is a PERMUTATION
  * (bijective coordinates), a pure function of (ids, seed, shards) —
  * independent of partitioning and input order — epoch seeds decorrelate,
  * both hash families satisfy the same contract, and the plan keeps the
  * one-shuffle-then-local-sort shape (parallelism = shards, never 1). */
class TrainOrderSpec extends SparkTestBase {
  import spark.implicits._

  private def ids(n: Int) = (1L to n.toLong).toDF("id")

  test("order is a permutation: every shard's positions are exactly 1..count, " +
    "and every id appears once") {
    for (portable <- Seq(true, false)) {
      val out = TrainOrder.order(ids(500), "id", seed = 7L, shards = 8,
        portable = portable).cache()
      try {
        assert(out.count() == 500)
        assert(out.select("id").distinct().count() == 500)
        val byShard = out.groupBy("shard")
          .agg(count("*").as("n"), min("pos").as("lo"), max("pos").as("hi"),
            countDistinct("pos").as("d"))
          .collect()
        assert(byShard.length <= 8 &&
          byShard.forall(r => r.getLong(2) == 1L && // lo
            r.getLong(3) == r.getLong(1) && // hi == n
            r.getLong(4) == r.getLong(1))) // distinct == n
        // shards are reasonably balanced for a uniform hash (500 over 8)
        val sizes = byShard.map(_.getLong(1))
        assert(sizes.min > 20 && sizes.max < 120, sizes.mkString(","))
      } finally out.unpersist()
    }
  }

  test("the order is a pure function of (ids, seed, shards): invariant under " +
    "input partitioning and row order") {
    def coords(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      TrainOrder.order(df, "id", seed = 11L, shards = 4, portable = false)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = coords(ids(300))
    assert(coords(ids(300).repartition(7)) == base)
    assert(coords(ids(300).orderBy(col("id").desc)) == base)
    assert(coords(ids(300).repartition(1)) == base)
  }

  test("different seeds give different permutations (epochs decorrelate)") {
    val a = TrainOrder.order(ids(200), "id", seed = 1L, shards = 4)
      .orderBy("shard", "pos").select("id").as[Long].collect().toSeq
    val b = TrainOrder.order(ids(200), "id", seed = 2L, shards = 4)
      .orderBy("shard", "pos").select("id").as[Long].collect().toSeq
    assert(a.toSet == b.toSet && a != b)
  }

  test("interleave honors mixture weights along every shard prefix and stays " +
    "a permutation of the union") {
    val even = ids(400).where(col("id") % 2 === 0)
    val odd = ids(400).where(col("id") % 2 =!= 0)
    val out = TrainOrder.interleave(
      Seq(("even", even, 2.0), ("odd", odd, 1.0)),
      "id", seed = 3L, shards = 1, portable = false).cache()
    try {
      assert(out.count() == 400)
      assert(out.select("id").distinct().count() == 400)
      // weight 2:1 → in every prefix of the single shard, the heavy source
      // holds ~2/3 of the rows (exact up to interleave rounding)
      val prefix = out.where(col("pos") <= 90)
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val evenShare = prefix.getOrElse("even", 0L).toDouble / 90.0
      assert(evenShare > 0.60 && evenShare < 0.73, s"evenShare=$evenShare")
    } finally out.unpersist()
    // ONE exchange total: partitioning by shard satisfies BOTH windows'
    // clustering (the per-source window's keys are a superset of shard),
    // vs S+1 exchanges for the naive per-source-order-then-merge shape
    val plan = TrainOrder.interleave(
      Seq(("even", even, 2.0), ("odd", odd, 1.0)),
      "id", seed = 3L, shards = 4, portable = false)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("both hash families honor the non-negative contract, and coordinate " +
    "name collisions are rejected loudly") {
    for (portable <- Seq(true, false)) {
      // the HASH itself, not the shard — pmod would mask a sign-bit bug
      val negs = ids(200)
        .select(TrainOrder.epochHash(col("id"), seed = 9L, portable).as("h"))
        .where(col("h") < 0).count()
      assert(negs == 0L, s"portable=$portable produced negative hashes")
    }
    val withCoords = TrainOrder.order(ids(10), "id", seed = 1L, shards = 2)
    val ex = intercept[IllegalArgumentException] {
      TrainOrder.order(withCoords, "id", seed = 2L, shards = 2)
    }
    assert(ex.getMessage.contains("shard"))
  }

  test("interleave hashes each source on its OWN id type (pre-union): a " +
    "mixed int/long pairing preserves every source's solo coordinates") {
    val intIds = (1 to 100).toDF("id") // IntegerType
    val longIds = (101L to 200L).toDF("id") // LongType
    val merged = TrainOrder.interleave(
      Seq(("ints", intIds, 1.0), ("longs", longIds, 1.0)),
      "id", seed = 5L, shards = 4).cache()
    try {
      // per-source (id → shard) must equal the source's solo order():
      // a post-union hash would widen the int ids and re-deal them
      def solo(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        TrainOrder.order(df, "id", seed = 5L, shards = 4)
          .collect().map(r => (r.get(0).toString.toLong, r.getLong(1))).toMap
      val mergedShards = merged.select("id", "shard").collect()
        .map(r => (r.get(0).toString.toLong, r.getLong(1))).toMap
      assert((solo(intIds) ++ solo(longIds)) == mergedShards)
    } finally merged.unpersist()
  }

  test("coordinate-name collision guards are case-insensitive (the default " +
    "analyzer resolves case-insensitively, so POS would be clobbered)") {
    val df = ids(10).withColumn("POS", col("id"))
    val ex = intercept[IllegalArgumentException] {
      TrainOrder.order(df, "id", seed = 1L, shards = 2)
    }
    assert(ex.getMessage.contains("pos"))
    val ex2 = intercept[IllegalArgumentException] {
      TrainOrder.interleave(Seq(("a", ids(5), 1.0)), "id", seed = 1L, shards = 0)
    }
    assert(ex2.getMessage.contains("shards"))
  }

  test("writeShards: every shard directory is ONE file whose row order is " +
    "the shard's pos order (a training reader streams it with no sort)") {
    val path = new java.io.File("target/train-order-shards").getAbsolutePath
    TrainOrder.writeShards(ids(300), "id", seed = 13L, shards = 6, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.nonEmpty && dirs.length <= 6)
    var total = 0L
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
      // row order WITHIN the file is the pos order — read without Spark
      // re-sorting (single file, single partition read at this size)
      val rows = spark.read.parquet(files.head.getAbsolutePath)
        .select("pos").collect().map(_.getLong(0))
      assert(rows.toSeq == (1L to rows.length).toSeq,
        s"${d.getName} not pos-ordered: ${rows.take(10).mkString(",")}")
      total += rows.length
    }
    assert(total == 300)
    // and the file layout carries the same permutation order() computes
    val fromLayout = spark.read.parquet(path)
      .select(col("id"), col("shard").cast("long"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fromOrder = TrainOrder.order(ids(300), "id", seed = 13L, shards = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fromLayout == fromOrder)
    // the write's coordinate plan does ONE shuffle and ONE sort: the
    // pre-window repartition satisfies the window's clustering, so no
    // planner-inserted second exchange (the naive order-then-repartition
    // formulation shuffles and sorts the corpus twice — caught in review)
    val plan = TrainOrder.coordinates(ids(300), "id", seed = 13L,
      shards = 6, portable = false, prePartition = true)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert("Sort \\[".r.findAllIn(plan).size == 1, plan)
  }

  test("interleaveRows rides the payload through the SAME coordinates as " +
    "interleave, with one exchange (no per-source join-back)") {
    val even = ids(300).where(col("id") % 2 === 0)
      .withColumn("txt", concat(lit("e"), col("id")))
    val odd = ids(300).where(col("id") % 2 =!= 0)
      .withColumn("txt", concat(lit("o"), col("id")))
    val rows = TrainOrder.interleaveRows(
      Seq(("even", even, 2.0), ("odd", odd, 1.0)),
      "id", seed = 3L, shards = 4).cache()
    try {
      // coordinates are bit-identical to the coordinate-only operator
      val coords = TrainOrder.interleave(
        Seq(("even", even.select("id"), 2.0), ("odd", odd.select("id"), 1.0)),
        "id", seed = 3L, shards = 4)
        .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(1), r.getLong(3))).toSet
      val got = rows.select("id", "source", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == coords)
      // and the payload column survives, matched to its row
      assert(rows.where(col("txt") =!= concat(
        when(col("source") === "even", "e").otherwise("o"), col("id")))
        .count() == 0L)
    } finally rows.unpersist()
    val plan = TrainOrder.interleaveRows(
      Seq(("even", even, 2.0), ("odd", odd, 1.0)),
      "id", seed = 3L, shards = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("interleaveRows unions heterogeneous payloads by name (null-fill) " +
    "without disturbing the coordinates; collisions are rejected loudly") {
    val a = ids(60).withColumn("only_a", col("id") * 2)
    val b = (61L to 120L).toDF("id").withColumn("only_b", lit("x"))
    val rows = TrainOrder.interleaveRows(
      Seq(("a", a, 1.0), ("b", b, 1.0)), "id", seed = 9L, shards = 2).cache()
    try {
      assert(rows.count() == 120)
      assert(rows.columns.toSet ==
        Set("id", "only_a", "only_b", "source", "shard", "pos"))
      assert(rows.where(col("source") === "b" && col("only_a").isNotNull)
        .count() == 0L)
      assert(rows.where(col("source") === "a" &&
        col("only_a") =!= col("id") * 2).count() == 0L)
      val coords = TrainOrder.interleave(
        Seq(("a", a.select("id"), 1.0), ("b", b.select("id"), 1.0)),
        "id", seed = 9L, shards = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
      assert(rows.select("id", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == coords)
    } finally rows.unpersist()
    // a payload column named 'source' collides with the output tag
    val ex = intercept[IllegalArgumentException] {
      TrainOrder.interleaveRows(
        Seq(("a", ids(5).withColumn("SOURCE", lit("s")), 1.0)),
        "id", seed = 1L, shards = 2)
    }
    assert(ex.getMessage.contains("source"))
    // a reserved working-column name would be silently replaced + dropped
    // (data loss) without the guard — ADVICE r13
    val ex2 = intercept[IllegalArgumentException] {
      TrainOrder.order(ids(5).withColumn("__graft_h", lit(1L)), "id",
        seed = 1L, shards = 2)
    }
    assert(ex2.getMessage.contains("__graft_"))
  }

  test("writeInterleavedShards: one pos-ordered file per shard dir, " +
    "carrying the payload, equal to interleaveRows") {
    val even = ids(240).where(col("id") % 2 === 0)
      .withColumn("txt", concat(lit("e"), col("id")))
    val odd = ids(240).where(col("id") % 2 =!= 0)
      .withColumn("txt", concat(lit("o"), col("id")))
    val srcs = Seq(("even", even, 2.0), ("odd", odd, 1.0))
    val path = new java.io.File("target/train-interleave-shards").getAbsolutePath
    TrainOrder.writeInterleavedShards(srcs, "id", seed = 13L, shards = 4, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.nonEmpty && dirs.length <= 4)
    var total = 0L
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
      val rows = spark.read.parquet(files.head.getAbsolutePath)
        .select("pos").collect().map(_.getLong(0))
      assert(rows.toSeq == (1L to rows.length).toSeq,
        s"${d.getName} not pos-ordered: ${rows.take(10).mkString(",")}")
      total += rows.length
    }
    assert(total == 240)
    val fromLayout = spark.read.parquet(path)
      .select(col("id"), col("txt"), col("source"),
        col("shard").cast("long"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    val fromRows = TrainOrder.interleaveRows(srcs, "id", seed = 13L, shards = 4)
      .select(col("id"), col("txt"), col("source"), col("shard"), col("pos"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(fromLayout == fromRows)
    // ONE exchange, TWO sorts (per-source rank + interleave rank) in the
    // write plan — the one-shuffle discipline survives the payload
    val plan = graft.operators.TrainOrder.interleaveRowsForWritePlan(
      srcs, "id", seed = 13L, shards = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("replicate: floor(e) full passes plus a deterministic keep-hash " +
    "fraction, independent of the position hash; e<1 downsamples; e " +
    "integral is exact") {
    for (portable <- Seq(true, false)) {
      val out = TrainOrder.replicate(ids(400), "id", epochs = 2.5, seed = 5L,
        portable = portable).cache()
      try {
        // every id appears exactly 2 or 3 times (never partial, never 4)
        val perId = out.groupBy("id").count()
          .select("count").as[Long].collect()
        assert(perId.forall(c => c == 2L || c == 3L))
        // the fractional replica is the LAST one: rep values are dense 0..k-1
        val reps = out.groupBy("id")
          .agg(max("rep").as("m"), count("*").as("c")).where(col("m") =!= col("c") - 1)
        assert(reps.count() == 0L)
        // ~half the ids carry the third replica (48-bit hash vs 2^47)
        val extra = perId.count(_ == 3L).toDouble / 400.0
        assert(extra > 0.38 && extra < 0.62, s"extra=$extra")
        // rep_id is unique across the replicated frame
        assert(out.select("rep_id").distinct().count() == out.count())
        // deterministic: invariant under input partitioning
        val again = TrainOrder.replicate(ids(400).repartition(7), "id",
          epochs = 2.5, seed = 5L, portable = portable)
          .select("rep_id").as[String].collect().toSet
        assert(again == out.select("rep_id").as[String].collect().toSet)
      } finally out.unpersist()
      // integral epochs: exactly e copies of everything, no hash filter
      assert(TrainOrder.replicate(ids(50), "id", 3.0, 5L, portable)
        .count() == 150L)
      // e < 1: deterministic downsample, each id 0 or 1 times, ~e kept
      val down = TrainOrder.replicate(ids(400), "id", 0.4, 5L, portable)
      val n = down.count()
      assert(down.select("id").distinct().count() == n)
      assert(n > 400 * 0.25 && n < 400 * 0.55, s"kept=$n")
    }
    // guards: non-positive / NaN epochs, output-name collisions
    intercept[IllegalArgumentException] {
      TrainOrder.replicate(ids(5), "id", 0.0, 1L)
    }
    intercept[IllegalArgumentException] {
      TrainOrder.replicate(ids(5), "id", Double.NaN, 1L)
    }
    val ex = intercept[IllegalArgumentException] {
      TrainOrder.replicate(ids(5).withColumn("REP", lit(1)), "id", 1.0, 1L)
    }
    assert(ex.getMessage.contains("rep"))
  }

  test("interleaveEpochs: replicas are placed independently, the stream is " +
    "a permutation of the replicated union, and sources co-finish") {
    val even = ids(300).where(col("id") % 2 === 0)
    val odd = ids(300).where(col("id") % 2 =!= 0)
    val srcs = Seq(("even", even, 2.0), ("odd", odd, 1.0))
    val out = TrainOrder.interleaveEpochs(srcs, "id", seed = 7L, shards = 1)
      .cache()
    try {
      // 2 epochs of 150 evens + 1 epoch of 150 odds = 450 rows, pos dense
      assert(out.count() == 450L)
      assert(out.agg(max("pos")).as[Long].head() == 450L &&
        out.select("pos").distinct().count() == 450L)
      // a replicated id's two copies are NOT adjacent by construction
      // (independent placement): measure the mean gap between an even
      // id's two replicas — independent uniform placement gives ~n/3
      val gaps = out.where(col("source") === "even")
        .groupBy("id").agg((max("pos") - min("pos")).as("gap"))
        .agg(avg("gap")).as[Double].head()
      assert(gaps > 450.0 / 6, s"replica copies clump: mean gap $gaps")
      // co-finish: both sources' last rows land in the stream's tail
      // (each source's final axis is ~1.0, so neither runs out early)
      val lastBySource = out.groupBy("source").agg(max("pos").as("m"))
        .select("m").as[Long].collect()
      assert(lastBySource.forall(_ > 430L), lastBySource.mkString(","))
    } finally out.unpersist()
    // the payload variant carries source columns through the one shuffle
    val rows = TrainOrder.interleaveEpochsRows(
      Seq(("even", even.withColumn("t", concat(lit("v"), col("id"))), 1.5),
        ("odd", odd, 1.0)),
      "id", seed = 7L, shards = 2)
    assert(rows.columns.toSet ==
      Set("id", "t", "rep", "rep_id", "source", "shard", "pos"))
    assert(rows.where(col("source") === "even" &&
      col("t") =!= concat(lit("v"), col("id"))).count() == 0L)
    // ONE exchange total — the epochs path inherits interleave's plan
    val plan = TrainOrder.interleaveEpochs(srcs, "id", seed = 7L, shards = 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("writeEpochShards lands one pos-ordered file per shard; resume " +
    "re-serves exactly the untrained suffix with the pos filter PUSHED") {
    val even = ids(200).where(col("id") % 2 === 0)
    val odd = ids(200).where(col("id") % 2 =!= 0)
    val srcs = Seq(("even", even, 2.5), ("odd", odd, 1.0))
    val path = new java.io.File("target/train-epoch-shards").getAbsolutePath
    TrainOrder.writeEpochShards(srcs, "id", seed = 3L, shards = 2, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.nonEmpty && dirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    val full = spark.read.parquet(path)
    val cut = 40L
    val resumed = TrainOrder.resume(spark, path, afterPos = cut)
    // exactly the suffix: same rows as filtering the full read
    assert(resumed.count() ==
      full.where(col("pos") > cut).count())
    assert(resumed.where(col("pos") <= cut).count() == 0L)
    assert(resumed.count() > 0L)
    // the filter reaches the SCAN: pos-ordered files mean row-group
    // min/max prune the trained prefix — I/O follows the suffix at 100 TB
    val scan = resumed.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThan(pos,"), scan)
    intercept[IllegalArgumentException] {
      TrainOrder.resume(spark, path, afterPos = -1L)
    }
  }

  test("shard manifest: landed with the layout, readable with ZERO footer " +
    "reads, and equal to the layout's per-shard (rows, max pos)") {
    val path = new java.io.File("target/train-manifest").getAbsolutePath
    TrainOrder.writeShards(ids(300), "id", seed = 13L, shards = 6, path)
    val expected = spark.read.parquet(path)
      .groupBy(col("shard").cast("long")).agg(count("*"), max("pos"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(TrainOrder.readManifestOpt(spark, path).contains(expected))
    // zero footer reads: the manifest must answer from the meta file alone
    // — prove it by corrupting every data file and reading the manifest
    // again (a parquet footer touch would throw)
    val dataFiles = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach(f => java.nio.file.Files.write(f.toPath,
      "not parquet".getBytes))
    assert(TrainOrder.readManifestOpt(spark, path).contains(expected))
  }

  test("ragged resume: per-shard frontiers serve exactly each shard's " +
    "untrained suffix, with partition AND row-group pruning in the plan") {
    val even = ids(240).where(col("id") % 2 === 0)
      .withColumn("txt", concat(lit("e"), col("id")))
    val odd = ids(240).where(col("id") % 2 =!= 0)
      .withColumn("txt", concat(lit("o"), col("id")))
    val srcs = Seq(("even", even, 2.0), ("odd", odd, 1.0))
    val path = new java.io.File("target/train-ragged-resume").getAbsolutePath
    TrainOrder.writeInterleavedShards(srcs, "id", seed = 13L, shards = 4, path)
    val manifest = TrainOrder.readManifestOpt(spark, path).get
    val full = spark.read.parquet(path)
      .select(col("id"), col("shard").cast("long").as("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a ragged crash: shard 0 at 20, shard 1 finished (omitted), shard 2
    // unstarted (0), shard 3 at 5
    val frontier = Map(0L -> 20L, 2L -> 0L, 3L -> 5L)
    val resumed = TrainOrder.resume(spark, path, frontier)
    val got = resumed
      .select(col("id"), col("shard").cast("long").as("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = full.filter { case (_, s, p) =>
      frontier.get(s).exists(p > _)
    }
    assert(got == want, s"got ${got.size} rows, want ${want.size}")
    assert(got.nonEmpty)
    // partition pruning: the omitted (finished) shard 1 is never listed —
    // the scan's PartitionFilters constrain shard; row-group pruning: the
    // pos disjunction reaches PushedFilters (prunes the common prefix)
    val scan = resumed.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(scan).nonEmpty, scan)
    assert(scan.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*GreaterThan\\(pos".r.findFirstIn(scan).nonEmpty,
      scan)
    // the lock-step overload IS the constant frontier (delegation pinned):
    // same rows, and a served-out shard (frontier == landed max) drops out
    val cut = 10L
    val lockstep = TrainOrder.resume(spark, path, afterPos = cut)
      .select(col("id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val constFrontier = TrainOrder.resume(spark, path,
      manifest.map { case (k, (_, mx)) => k -> math.min(cut, mx) })
      .select(col("id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(lockstep == constFrontier &&
      lockstep == full.filter(_._3 > cut))
    // a frontier at every shard's landed max = nothing left: empty, not error
    assert(TrainOrder.resume(spark, path,
      manifest.map { case (k, (_, mx)) => k -> mx }).count() == 0L)
  }

  test("ragged resume at machine scale: above the disjunct threshold the " +
    "frontier compiles to a broadcast join with identical rows and columns " +
    "and both prunings intact, and a 6000-distinct-cutoff frontier plans " +
    "in bounded time under BOTH strategies") {
    // strategy equivalence on a real manifested layout: force the
    // broadcast path with threshold 1 and compare it to the disjunction
    val path = new java.io.File("target/train-ragged-bcast").getAbsolutePath
    TrainOrder.writeShards(ids(240), "id", seed = 13L, shards = 4, path)
    val frontier = Map(0L -> 20L, 2L -> 0L, 3L -> 5L) // shard 1 finished
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.select(col("id"), col("shard").cast("long"), col("pos"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val disjunct = TrainOrder.resume(spark, path, frontier)
    val bcast = TrainOrder.resume(spark, path, frontier,
      maxDisjunctCutoffs = 1)
    assert(bcast.columns.toSeq == disjunct.columns.toSeq)
    val got = rows(bcast)
    assert(got == rows(disjunct) && got.nonEmpty)
    val plan = bcast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(plan).nonEmpty,
      plan)
    assert("PushedFilters: \\[[^\\]]*GreaterThan\\(pos".r
      .findFirstIn(plan).nonEmpty, plan)
    // machine-scale planning: ~every shard at its own cutoff — the shape
    // a real ragged crash at the 100k-shard sizing rule produces. A
    // manifest-less layout skips frontier validation, so a 6000-entry
    // frontier exercises predicate COMPILATION without landing 6000
    // dirs. The old left-deep reduce(_ || _) stack-overflowed Catalyst
    // here; both strategies must now plan AND answer in bounded time.
    val path2 = new java.io.File("target/train-ragged-wide").getAbsolutePath
    ids(80).withColumn("shard", col("id") % 8)
      .withColumn("pos", expr("id div 8") + lit(1L))
      .write.mode("overwrite").partitionBy("shard").parquet(path2)
    val wide = (0L until 6000L).map(k => k -> k).toMap // all cutoffs distinct
    val expected = (1L to 80L).map(id => (id, id % 8, id / 8L + 1L))
      .filter { case (_, s, p) => p > s }.toSet
    for (threshold <- Seq(1, 10000)) { // broadcast AND balanced-disjunction
      val t0 = System.nanoTime()
      val resumed = TrainOrder.resume(spark, path2, wide,
        maxDisjunctCutoffs = threshold)
      resumed.queryExecution.executedPlan // force full analysis + planning
      val planSec = (System.nanoTime() - t0) / 1e9
      assert(planSec < 60.0,
        s"threshold=$threshold planned in ${planSec}s — unbounded")
      assert(rows(resumed) == expected, s"threshold=$threshold")
    }
    // randomized strategy equivalence: on 20 seeded random frontiers
    // (random live-shard subsets, random cutoffs, served-out shards
    // included) the two compilations must return identical row sets
    val manifest = TrainOrder.readManifestOpt(spark, path).get
    val full = rows(spark.read.parquet(path))
    val rnd = new scala.util.Random(42)
    (1 to 20).foreach { i =>
      val frontier = manifest.toSeq
        .filter(_ => rnd.nextDouble() < 0.8)
        .map { case (k, (_, mx)) => k -> rnd.nextLong(mx + 1) }.toMap
      if (frontier.nonEmpty) {
        val a = rows(TrainOrder.resume(spark, path, frontier))
        val b = rows(TrainOrder.resume(spark, path, frontier,
          maxDisjunctCutoffs = 1))
        val want = full.filter { case (_, s, p) =>
          frontier.get(s).exists(p > _)
        }
        assert(a == want && b == want, s"frontier #$i: $frontier")
      }
    }
  }

  test("resume frontier validation: unknown shards, frontiers beyond the " +
    "landed max, and manifest/directory disagreement all fail loudly") {
    val path = new java.io.File("target/train-resume-validate").getAbsolutePath
    TrainOrder.writeShards(ids(200), "id", seed = 13L, shards = 4, path)
    val manifest = TrainOrder.readManifestOpt(spark, path).get
    val ex1 = intercept[IllegalArgumentException] {
      TrainOrder.resume(spark, path, Map(99L -> 0L))
    }
    assert(ex1.getMessage.contains("never landed"))
    val (someShard, (_, maxPos)) = manifest.head
    val ex2 = intercept[IllegalArgumentException] {
      TrainOrder.resume(spark, path, Map(someShard -> (maxPos + 1)))
    }
    assert(ex2.getMessage.contains("beyond the landed layout"))
    val ex3 = intercept[IllegalArgumentException] {
      TrainOrder.resume(spark, path, afterPos = maxPos * 10 + 100)
    }
    assert(ex3.getMessage.contains("beyond the layout"))
    intercept[IllegalArgumentException] {
      TrainOrder.resume(spark, path, Map.empty[Long, Long])
    }
    intercept[IllegalArgumentException] {
      TrainOrder.resume(spark, path, Map(0L -> -1L))
    }
    // delete one shard dir: the manifest and the directory set now
    // disagree — a half-landed/hand-modified layout must not silently
    // train on the subset
    val victim = new java.io.File(path, s"shard=$someShard")
    assert(victim.isDirectory)
    victim.listFiles().foreach(_.delete())
    assert(victim.delete())
    val ex4 = intercept[IllegalStateException] {
      TrainOrder.resume(spark, path, Map(someShard -> 0L))
    }
    assert(ex4.getMessage.contains("disagrees with its manifest"))
  }

  test("temperatureEpochs: α=1 is proportional, α=1/2 up-weights the small " +
    "source with the exact sqrt formulation, the cap binds, the mixture " +
    "feeds interleaveEpochs, and degenerate inputs are rejected") {
    val sizes = Seq("a" -> 900L, "b" -> 100L)
    // α = 1, budget = total: every source trains exactly ~once
    val e1 = TrainOrder.temperatureEpochs(sizes, 1.0, 1000L).toMap
    assert(math.abs(e1("a") - 1.0) < 1e-12 && math.abs(e1("b") - 1.0) < 1e-12)
    // α = 1/2: bit-exact against the sqrt formulation the oracle mirrors
    // (same sorted-tag fold, same left-associated expression)
    val e5 = TrainOrder.temperatureEpochs(sizes, 0.5, 1000L).toMap
    val z = math.sqrt(900.0) + math.sqrt(100.0)
    assert(e5("a") == math.sqrt(900.0) / z * 1000.0 / 900.0)
    assert(e5("b") == math.sqrt(100.0) / z * 1000.0 / 100.0)
    assert(e5("b") > e1("b") && e5("a") < e1("a")) // flattening direction
    // pow(n, 1/2) IS sqrt(n), bit-for-bit — the oracle's mirror rests on it
    for (n <- Seq(1L, 7L, 250L, 2500L, 999983L))
      assert(math.pow(n.toDouble, 0.5) == math.sqrt(n.toDouble))
    // the cap binds the up-weighted source only
    val ec = TrainOrder.temperatureEpochs(sizes, 0.5, 1000L,
      maxEpochs = 2.0).toMap
    assert(ec("b") == 2.0 && ec("a") == e5("a"))
    // composition: temperatureMixture → interleaveEpochsRows is a live
    // recipe, and the replicated counts follow the derived epochs
    val d = ids(300)
    val srcs = TrainOrder.temperatureMixture(
      Seq("small" -> d.where(col("id") <= 60),
        "big" -> d.where(col("id") > 60)),
      alpha = 0.5, budget = 300L, maxEpochs = 4.0)
    val em = srcs.map { case (t, _, e) => t -> e }.toMap
    assert(em("small") > em("big"))
    val counts = TrainOrder.interleaveEpochsRows(srcs, "id", seed = 9L,
      shards = 4).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("small") >= math.floor(em("small")).toLong * 60 &&
      counts("small") <= math.ceil(em("small")).toLong * 60,
      s"$counts vs $em")
    assert(counts("big") >= math.floor(em("big")).toLong * 240 &&
      counts("big") <= math.ceil(em("big")).toLong * 240)
    // budget conservation: while no cap binds, Σ epochs_i · n_i spends
    // the budget exactly (up to float rounding) — p sums to 1
    for (alpha <- Seq(0.3, 0.5, 0.7, 1.0)) {
      val es = TrainOrder.temperatureEpochs(
        Seq("a" -> 900L, "b" -> 100L, "c" -> 37L), alpha, 5000L,
        maxEpochs = 1e9)
      val spent = es.zip(Seq(900L, 100L, 37L))
        .map { case ((_, e), n) => e * n }.sum
      assert(math.abs(spent - 5000.0) < 1e-6, s"alpha=$alpha spent $spent")
    }
    intercept[IllegalArgumentException](
      TrainOrder.temperatureEpochs(Seq.empty, 0.5, 10L))
    intercept[IllegalArgumentException](
      TrainOrder.temperatureEpochs(Seq("a" -> 0L), 0.5, 10L))
    intercept[IllegalArgumentException](
      TrainOrder.temperatureEpochs(sizes, 1.5, 10L))
    intercept[IllegalArgumentException](
      TrainOrder.temperatureEpochs(sizes, 0.5, 0L))
    intercept[IllegalArgumentException](
      TrainOrder.temperatureEpochs(Seq("a" -> 1L, "a" -> 2L), 0.5, 10L))
  }

  test("curriculumByQuantiles: percentile_disc boundaries from tier " +
    "fractions give exact tier populations, the result IS curriculum() " +
    "with those boundaries, NULL scores are excluded from the quantiles, " +
    "and degenerate fractions are rejected") {
    // scores 0..99 each ×4: rank ceil(.25·400)=100 → value 24 (order
    // statistic — an actual element), rank ceil(.75·400)=300 → value 74
    val df = ids(400).withColumn("score", (col("id") % 100).cast("double"))
    assert(TrainOrder.quantileBoundaries(df, "score",
      Seq(0.25, 0.5, 0.25)) == Seq(24.0, 74.0))
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Long)] =
      d.select("id", "tier", "shard", "pos").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
    val derived = rows(TrainOrder.curriculumByQuantiles(df, "id", "score",
      Seq(0.25, 0.5, 0.25), seed = 3L, shards = 4))
    assert(derived == rows(TrainOrder.curriculum(df, "id", "score",
      Seq(24.0, 74.0), seed = 3L, shards = 4)))
    // tier populations: ≤24 → 100, 25..74 → 200, >74 → 100 (exact 25/50/25)
    val pops = derived.groupBy(_._2).view.mapValues(_.size).toMap
    assert(pops == Map(0 -> 100, 1 -> 200, 2 -> 100), pops.toString)
    // NULL scores: excluded from the quantiles, landed in the LAST tier
    val withNulls = ids(400).withColumn("score",
      when(col("id") > 380, lit(null).cast("double"))
        .otherwise((col("id") % 97).cast("double")))
    val dn = rows(TrainOrder.curriculumByQuantiles(withNulls, "id", "score",
      Seq(0.5, 0.5), seed = 3L, shards = 4))
    // 2 fractions → 1 boundary → NULL tier index = boundaries.size = 1
    val nullTier = dn.filter(t => t._1 > 380).map(_._2)
    assert(nullTier.size == 1 && nullTier.head == 1, nullTier.toString)
    intercept[IllegalArgumentException] {
      TrainOrder.curriculumByQuantiles(df, "id", "score", Seq(1.0), 3L, 4)
    }
    intercept[IllegalArgumentException] {
      TrainOrder.curriculumByQuantiles(df, "id", "score",
        Seq(0.5, 0.6), 3L, 4)
    }
    intercept[IllegalArgumentException] {
      TrainOrder.curriculumByQuantiles(df, "id", "score",
        Seq(0.5, -0.5, 1.0), 3L, 4)
    }
  }

  test("curriculum: tiers stream in ascending order within every shard, the " +
    "intra-tier order IS order()'s permutation, NULL scores land in the " +
    "LAST tier, and the plan keeps the one-exchange shape") {
    val df = ids(300).withColumn("score",
      when(col("id") % 29 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 100).cast("double")))
    val boundaries = Seq(30.0, 70.0)
    val rows = TrainOrder.curriculum(df, "id", "score", boundaries,
      seed = 9L, shards = 4)
      .select("id", "score", "tier", "shard", "pos").collect()
    assert(rows.length == 300)
    // tier rule: comparison count, NULL → last tier
    rows.foreach { r =>
      val expected =
        if (r.isNullAt(1)) boundaries.size
        else boundaries.count(b => r.getDouble(1) > b)
      assert(r.getInt(2) == expected, s"id=${r.getLong(0)}")
    }
    assert(rows.exists(r => r.isNullAt(1))) // the NULL case really occurs
    val base = TrainOrder.order(df.select("id"), "id", seed = 9L, shards = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_.getLong(3)).foreach { case (shard, rs) =>
      val sorted = rs.sortBy(_.getLong(4))
      // positions are 1..n and tiers never descend along the stream
      assert(sorted.map(_.getLong(4)).toSeq == (1L to rs.length.toLong))
      assert(sorted.map(_.getInt(2)).sliding(2)
        .forall(w => w.length < 2 || w(0) <= w(1)), s"shard $shard")
      // same shard assignment as order() (same hash), and within each
      // tier the relative order is order()'s seeded permutation
      rs.foreach(r => assert(base(r.getLong(0))._1 == shard))
      rs.groupBy(_.getInt(2)).values.foreach { tierRows =>
        val cur = tierRows.sortBy(_.getLong(4)).map(_.getLong(0)).toSeq
        val perm = tierRows.map(_.getLong(0)).sortBy(id => base(id)._2).toSeq
        assert(cur == perm, s"shard $shard intra-tier order diverged")
      }
    }
    val plan = TrainOrder.curriculum(df, "id", "score", boundaries, 9L, 4)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Exchange rangepartitioning") &&
      !plan.contains("Exchange SinglePartition"), plan)
    // guards: boundaries empty / non-increasing, a tier column collision
    intercept[IllegalArgumentException] {
      TrainOrder.curriculum(df, "id", "score", Seq.empty, 9L, 4)
    }
    intercept[IllegalArgumentException] {
      TrainOrder.curriculum(df, "id", "score", Seq(2.0, 1.0), 9L, 4)
    }
    intercept[IllegalArgumentException] {
      TrainOrder.curriculum(df.withColumn("tier", lit(1)), "id", "score",
        Seq(1.0), 9L, 4)
    }
  }

  test("writeCurriculumShards lands one pos-ordered file per shard dir with " +
    "a manifest, and each file streams its tiers front-to-back") {
    val df = ids(200).withColumn("score", (col("id") % 50).cast("double"))
    val path = new java.io.File("target/train-curriculum-shards").getAbsolutePath
    TrainOrder.writeCurriculumShards(df, "id", "score", Seq(25.0),
      seed = 4L, shards = 3, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(dirs.nonEmpty && dirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    dirs.foreach { d =>
      // single-file read: collect order is file row order
      val filed = spark.read.parquet(d.getAbsolutePath)
        .select("pos", "tier").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      assert(filed.map(_._1).toSeq == (1L to filed.length.toLong),
        s"${d.getName} not in pos order")
      assert(filed.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
        s"${d.getName} tiers descend")
    }
    val manifest = TrainOrder.readManifestOpt(spark, path)
    assert(manifest.exists(_.values.map(_._1).sum == 200L))
  }

  test("prefixByBudget: the maximal (pos, shard)-lexicographic prefix within " +
    "the token budget — boundary position split across shards in shard " +
    "order — and the cut reaches a landed layout's scan as a pushed bound") {
    val df = ids(120).withColumn("toks", (col("id") % 7 + 1).cast("long"))
    val stream = TrainOrder.order(df, "id", seed = 21L, shards = 3)
    val rows = stream.select("id", "shard", "pos", "toks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._3, t._2)) // the operator's global consumption order
    val total = rows.map(_._4).sum
    val cum = rows.scanLeft(0L)(_ + _._4).tail
    def want(b: Long): Set[Long] =
      rows.zip(cum).takeWhile(_._2 <= b).map(_._1._1).toSet
    // budgets hitting: nothing, a sub-first-position cut, a mid-stream cut
    // that splits a position across shards, everything, over-provisioned
    Seq(0L, 3L, 37L, 211L, total, total + 99L).foreach { b =>
      val got = TrainOrder.prefixByBudget(stream, "toks", b)
        .select("id").as[Long].collect().toSet
      assert(got == want(b), s"budget $b: got ${got.size}, want ${want(b).size}")
    }
    assert(want(total).size == 120) // the full-budget case really takes all
    assert(want(37L).nonEmpty && want(37L).size < 120)
    // on a landed layout the cut is a PUSHED pos bound: row groups beyond
    // it are skipped, so a 10% budget reads ~10% of the layout
    val path = new java.io.File("target/train-budget-prefix").getAbsolutePath
    TrainOrder.writeShards(df, "id", seed = 21L, shards = 3, path)
    val landed = TrainOrder.prefixByBudget(spark.read.parquet(path), "toks", 37L)
    assert(landed.select("id").as[Long].collect().toSet == want(37L))
    val scan = landed.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      "PushedFilters: \\[[^\\]]*LessThanOrEqual\\(pos".r.findFirstIn(scan).nonEmpty,
      scan)
    intercept[IllegalArgumentException] {
      TrainOrder.prefixByBudget(stream, "toks", -1L)
    }
    intercept[IllegalArgumentException] {
      TrainOrder.prefixByBudget(df, "toks", 5L) // no coordinates
    }
  }

  test("prefixByBudget over a landed layout answers from the token-index " +
    "sidecar when present (write once, cut many), the sidecar is invisible " +
    "to layout reads, and the fallback path agrees without one") {
    val df = ids(90).withColumn("toks", (col("id") % 5 + 1).cast("long"))
    val path = new java.io.File("target/train-token-index").getAbsolutePath
    TrainOrder.writeShards(df, "id", seed = 8L, shards = 3, path)
    val layoutRows = spark.read.parquet(path).count()
    val noIdx = TrainOrder.prefixByBudget(spark, path, "toks", 50L)
      .select("id").as[Long].collect().toSet
    TrainOrder.writeTokenIndex(spark, path, "toks")
    // the underscore-prefixed sidecar never changes what the layout reads as
    assert(spark.read.parquet(path).count() == layoutRows)
    val withIdx = TrainOrder.prefixByBudget(spark, path, "toks", 50L)
      .select("id").as[Long].collect().toSet
    assert(withIdx == noIdx && noIdx.nonEmpty && noIdx.size < 90)
    // the index is really consulted: inflate its totals 1000x — the cut
    // must follow the poisoned rollup (collapsing to at most the boundary
    // position, whose refinement reads the LAYOUT's true tokens), not
    // silently rescan the layout
    val idxPath = TrainOrder.tokenIndexPath(path, "toks")
    val poisonRows = spark.read.parquet(idxPath)
      .select("pos", "tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1) * 1000L)).toSeq
    poisonRows.toDF("pos", "tokens")
      .coalesce(1).write.mode("overwrite").parquet(idxPath)
    val poisoned = TrainOrder.prefixByBudget(spark, path, "toks", 50L)
      .select("pos").as[Long].collect()
    assert(poisoned.length < withIdx.size && poisoned.forall(_ <= 1L),
      s"poisoned index ignored: ${poisoned.length} rows")
    // an UNCOMMITTED index (no _SUCCESS — a writer crashed mid-index)
    // falls back to the on-the-fly rollup instead of failing the read
    assert(new java.io.File(idxPath, "_SUCCESS").delete())
    assert(TrainOrder.prefixByBudget(spark, path, "toks", 50L)
      .select("id").as[Long].collect().toSet == noIdx)
  }

  test("an EMPTY source lands without crashing (header-only manifest); " +
    "resume on it names the emptiness; all-NULL token cells cost 0 and " +
    "still ship in a budget prefix") {
    val path = new java.io.File("target/train-empty-landing").getAbsolutePath
    TrainOrder.writeShards(ids(100).where(col("id") < 0), "id",
      seed = 2L, shards = 4, path)
    assert(TrainOrder.readManifestOpt(spark, path).contains(Map.empty))
    val ex = intercept[IllegalArgumentException] {
      TrainOrder.resume(spark, path, afterPos = 0L)
    }
    assert(ex.getMessage.contains("ZERO rows"))
    // NULL tokens: a leading position whose tokens are ALL NULL costs 0
    // and ships — the documented contract (a bare sum would cut it)
    val df = ids(30).withColumn("toks",
      when(col("id") % 3 === 0, lit(null).cast("long")).otherwise(lit(2L)))
    val stream = TrainOrder.order(df, "id", seed = 4L, shards = 1)
    val nullLead = stream.withColumn("toks",
      when(col("pos") <= 5, lit(null).cast("long")).otherwise(col("toks")))
    val got = TrainOrder.prefixByBudget(nullLead, "toks", 6L)
      .select("pos").as[Long].collect().toSet
    // positions 1-5 cost 0; from pos 6 on, toks alternate null/2 — budget
    // 6 covers every zero-cost leading row plus the non-null ones whose
    // running total stays <= 6
    val rows = nullLead.select("pos", "toks").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val cum = rows.scanLeft(0L)(_ + _._2).tail
    val want = rows.zip(cum).takeWhile(_._2 <= 6L).map(_._1._1).toSet
    assert(got == want && want.size >= 5, s"got $got want $want")
  }

  test("plan shape: one hash exchange on the shard key, no global sort or " +
    "single-partition window") {
    val plan = TrainOrder.order(ids(100), "id", seed = 5L, shards = 8)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one hash exchange:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning") &&
      !plan.contains("Exchange SinglePartition"),
      s"global/single-partition ordering leaked into the plan:\n$plan")
  }
}
