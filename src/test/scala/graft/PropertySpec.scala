package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions._
import graft.operators._

/** Property-style coverage the reference lacks: the comparator pipeline is
  * total — ANY dtype pair yields a usable boolean column (or the lit(false)
  * fallthrough), never an analysis error; plus both ANSI modes. */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val mixed = {
    val df = Seq((1L, 1.0, "x", true, java.sql.Timestamp.valueOf("2020-01-01 00:00:00")))
      .toDF("l", "d", "s", "b", "t")
      .withColumn("arr", array(lit(1), lit(2)))
      .withColumn("m", map(lit("k"), lit(1)))
      .withColumn("dec", lit(BigDecimal("1.23")).cast("decimal(10,2)"))
      .withColumn("dt", to_date(lit("2020-01-01")))
    df.cache()
  }

  test("pipeline is total over every dtype pair (never throws, returns boolean)") {
    val cols = mixed.columns.toSeq
    for (c1 <- cols; c2 <- cols) {
      val expr = ComparatorPipeline.columnsEqual(mixed, c1, c2, CompareOpts())
      val out = mixed.select(expr.as("m"))
      assert(out.schema.head.dataType == org.apache.spark.sql.types.BooleanType,
        s"($c1, $c2) did not produce boolean")
      val v = out.first()
      assert(!v.isNullAt(0), s"($c1, $c2) produced NULL match value")
    }
  }

  test("session ANSI mode follows the forked test group's system property") {
    // build.sbt runs the whole suite twice (ansi-on / ansi-off groups); this
    // pins that the -Dspark.sql.ansi.enabled property actually reaches the
    // session — if the grouping mechanism breaks, the off-group fails here.
    val want = sys.props.getOrElse("spark.sql.ansi.enabled", "true")
    assert(spark.conf.get("spark.sql.ansi.enabled") == want)
  }

  test("pipeline totality holds under ANSI-off too") {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val cols = mixed.columns.toSeq
      for (c1 <- cols; c2 <- cols) {
        val expr = ComparatorPipeline.columnsEqual(mixed, c1, c2, CompareOpts())
        val v = mixed.select(expr.as("m")).first()
        assert(!v.isNullAt(0), s"($c1, $c2) produced NULL match value under ANSI-off")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("tolerance math is symmetric in sign and monotone in tolerance") {
    val gen = for {
      base <- Gen.chooseNum(-1e6, 1e6)
      delta <- Gen.chooseNum(0.0, 10.0)
    } yield (base, delta)
    val cases = Gen.listOfN(15, gen).apply(Gen.Parameters.default, Seed(42L)).get
    cases.foreach { case (base, delta) =>
      val df = Seq((base, base + delta)).toDF("a", "b")
      val smallTol = df.select(ComparatorPipeline.columnsEqual(df, "a", "b",
        CompareOpts(absTol = delta / 2)).as("m")).first().getBoolean(0)
      val bigTol = df.select(ComparatorPipeline.columnsEqual(df, "a", "b",
        CompareOpts(absTol = delta * 2 + 1e-9)).as("m")).first().getBoolean(0)
      // bigger tolerance can only turn false→true
      assert(bigTol || !smallTol || delta == 0.0)
      assert(bigTol)
    }
  }

  test("compare is reflexive: any frame matches itself") {
    val frames = Seq(
      Seq((1L, "x", 1.5), (2L, "y", Double.NaN)).toDF("id", "s", "v"),
      Seq((1L, "x", 1.5)).toDF("id", "s", "v"))
    frames.foreach { f =>
      val c = new SparkCompare(spark, f, f, CompareConfig(joinColumns = Seq("id")))
      assert(c.matches(), "frame failed to match itself")
    }
  }

  test("full compare + report are ANSI-mode-invariant") {
    def frames = {
      val a = Seq((1L, "x", 1.5, "2020-01-01"), (2L, "y", Double.NaN, "bad-date"),
        (3L, null.asInstanceOf[String], 3.0, "2020-03-01"))
        .toDF("id", "s", "v", "ds").withColumn("d", col("ds").try_cast("date")).drop("ds")
      val b = Seq((1L, "x", 1.6, "2020-01-01"), (2L, "z", Double.NaN, "2020-02-02"),
        (4L, "w", 4.0, "2020-04-01"))
        .toDF("id", "s", "v", "ds").withColumn("d", col("ds").try_cast("date")).drop("ds")
      (a.coalesce(1), b.coalesce(1))
    }
    def run(): String = {
      val (a, b) = frames
      new SparkCompare(spark, a, b, CompareConfig(
        joinColumns = Seq("id"), absTol = ToleranceSpec.of(0.05))).report()
    }
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    val on = try { spark.conf.set("spark.sql.ansi.enabled", "true"); run() }
      finally spark.conf.set("spark.sql.ansi.enabled", prev)
    val off = try { spark.conf.set("spark.sql.ansi.enabled", "false"); run() }
      finally spark.conf.set("spark.sql.ansi.enabled", prev)
    assert(on == off, "report text diverged between ANSI modes")
    assert(on.contains("DataComPy Comparison"))
  }

  test("selectRanks equals the sorted reference across generated distributions") {
    // the distributed bucketed rank selection must return EXACTLY the
    // value at each target rank for any distribution shape — uniform,
    // tie-heavy, clustered-in-a-narrow-range, negative, single-value —
    // and any bucket count (including buckets ≪ distinct values, which
    // forces multi-rank hits inside one bucket)
    val dists: Seq[(String, Gen[Double])] = Seq(
      ("uniform", Gen.choose(-1e6, 1e6)),
      ("tie-heavy", Gen.choose(0, 9).map(_.toDouble)),
      ("narrow", Gen.choose(0, 1000).map(1.0 + _ * 1e-9)),
      ("mixed-sign-skew", Gen.oneOf(Gen.const(-5.0), Gen.choose(0.0, 1.0))))
    for (((name, gen), di) <- dists.zipWithIndex; buckets <- Seq(4, 64)) {
      val seed = Seed(1000L + di)
      val n = 257
      val values = Gen.listOfN(n, gen).apply(Gen.Parameters.default, seed).get
      val sorted = values.sorted
      val stacked = values.map(("c", _)).toDF("column", "v")
      val ranks = Seq(1L, 2L, (n / 4).toLong, (n / 2).toLong, (n - 1).toLong, n.toLong)
      val got = Profile.selectRanks(stacked, Map("c" -> ranks),
        Map("c" -> ((values.min, values.max))), buckets)
      ranks.foreach { k =>
        assert(got(("c", k)) == sorted(k.toInt - 1),
          s"dist=$name buckets=$buckets rank=$k")
      }
    }
  }

  test("numeric semantics hold with ANSI mode disabled too") {
    val prev = spark.conf.get("spark.sql.ansi.enabled", "true")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val df = Seq((Long.MaxValue, 1.0), (1L, 1.0)).toDF("a", "b")
      val got = df.select(ComparatorPipeline.columnsEqual(df, "a", "b",
        CompareOpts(absTol = 0.5)).as("m")).collect().map(_.getBoolean(0)).toSeq
      assert(got == Seq(false, true))
      // string→date try_cast stays NULL-quiet in both modes
      val sd = Seq(("garbage", "2020-01-01")).toDF("s", "d0")
        .select(col("s"), col("d0").cast("date").as("d"))
      assert(sd.select(ComparatorPipeline.columnsEqual(sd, "s", "d", CompareOpts()).as("m"))
        .first().getBoolean(0) == false)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
