package graft

import org.apache.spark.sql.functions._

import graft.functions.{LshPlanes, VectorFunctions}

/** The Spark Connect client-side fallbacks must be BIT-IDENTICAL to the
  * codegen expressions they stand in for — a Connect client and a classic
  * session running the same similarity query must agree on every hash
  * bucket and every cosine. The dispatch itself (non-classic session →
  * fallback) cannot run locally (no Connect server in this environment);
  * what can — and does — get pinned is the equivalence of the two
  * implementations on every semantic corner: unequal lengths (min-length
  * truncation, not zip_with null-padding), empty arrays, NULL arrays,
  * NaN/Infinity propagation, and the Java-vs-SQL `NaN >= 0` divergence in
  * the LSH sign bit. */
class ConnectFallbackSpec extends SparkTestBase {
  import spark.implicits._

  test("dotProductBuiltin is bit-identical to the DotProduct expression") {
    val rows = Seq(
      (Some(Seq(1.0f, 2.0f, 3.0f)), Some(Seq(4.0f, 5.0f, 6.0f))),
      (Some(Seq(-1.5f, 0.25f)), Some(Seq(2.0f, -8.0f))),
      // unequal lengths: min-length truncation, NOT null-padding
      (Some(Seq(1.0f, 2.0f, 3.0f, 4.0f)), Some(Seq(10.0f, 20.0f))),
      (Some(Seq.empty[Float]), Some(Seq(1.0f))),
      // NULL array → NULL result
      (None, Some(Seq(1.0f, 2.0f))),
      (Some(Seq(1.0f)), None),
      // non-finite values propagate identically
      (Some(Seq(Float.NaN, 1.0f)), Some(Seq(1.0f, 1.0f))),
      (Some(Seq(Float.PositiveInfinity, 1.0f)), Some(Seq(2.0f, 1.0f))),
      (Some(Seq(Float.MaxValue, Float.MaxValue)), Some(Seq(Float.MaxValue, 1.0f))))
    val df = rows.toDF("a", "b")
      .select(VectorFunctions.dotProduct(col("a"), col("b")).as("expr"),
        VectorFunctions.dotProductBuiltin(col("a"), col("b")).as("builtin"))
    df.collect().foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(1)),
            s"expr=${r.getDouble(0)} builtin=${r.getDouble(1)}")
        case other => fail(s"null-ness diverged: $other")
      }
    }
    // NULL ELEMENTS are defined as 0.0 by the expression (explicit
    // isNullAt guard — a columnar scan leaves null slots undefined, so
    // the guard is load-bearing, see ConnectIntegrationSpec) — the
    // builtin must coalesce, not poison the aggregate
    val withNullElems = Seq(
      (Seq[java.lang.Float](1.0f, null, 2.0f), Seq[java.lang.Float](4.0f, 5.0f, 6.0f)),
      (Seq[java.lang.Float](null, null), Seq[java.lang.Float](7.0f, 8.0f)))
      .toDF("a", "b")
      .select(VectorFunctions.dotProduct(col("a"), col("b")).as("expr"),
        VectorFunctions.dotProductBuiltin(col("a"), col("b")).as("builtin"))
      .collect()
    withNullElems.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"null-element: expr=${r.getDouble(0)} builtin=${r.getDouble(1)}")
    }
    assert(withNullElems(0).getDouble(1) == 16.0) // 1*4 + 0 + 2*6

    // double-element arrays too (no float→double cast in play)
    val d2 = Seq((Seq(1.0e300, -1.0e300, 3.5), Seq(2.0, 2.0, 2.0)))
      .toDF("a", "b")
      .select(VectorFunctions.dotProduct(col("a"), col("b")).as("expr"),
        VectorFunctions.dotProductBuiltin(col("a"), col("b")).as("builtin"))
      .first()
    assert(java.lang.Double.doubleToLongBits(d2.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(d2.getDouble(1)))
  }

  test("tableSignaturesBuiltin matches LshTableSignatures, including the " +
    "NaN sign-bit and NULL-vector corners") {
    val (dim, bits, tables) = (8, 6, 3)
    def vec(seed: Int): Seq[Float] =
      (0 until dim).map(d => ((seed * 31 + d * 7) % 13 - 6).toFloat / 3.0f)
    val rows: Seq[Option[Seq[Float]]] =
      (1 to 20).map(i => Some(vec(i))) ++ Seq(
        Some(Seq.fill(dim)(0.0f)), // all-zero: every dot 0.0 ≥ 0 → all bits set
        Some(vec(99).updated(0, Float.NaN)), // NaN rides into every dot
        None) // NULL vector → NULL signature array
    val df = rows.toDF("v")
      .select(
        LshPlanes.tableSignatures(col("v"), dim, bits, tables).as("expr"),
        LshPlanes.tableSignaturesBuiltin(col("v"), dim, bits, tables).as("builtin"))
    df.collect().foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"expr=${r.getSeq[Long](0)} builtin=${r.getSeq[Long](1)}")
        case other => fail(s"null-ness diverged: $other")
      }
    }
    // the NaN row is the Java-vs-SQL divergence the fallback guards: with
    // a NaN in every dot, the expression leaves EVERY bit unset
    val nanRow = Seq(Some(vec(99).updated(0, Float.NaN))).toDF("v")
      .select(LshPlanes.tableSignaturesBuiltin(col("v"), dim, bits, tables))
      .first().getSeq[Long](0)
    assert(nanRow == Seq.fill(tables)(0L))
  }

  test("null elements through a PARQUET roundtrip: expression equals builtin " +
    "(the vectorized reader leaves null slots undefined — regression for the " +
    "indeterminate-read bug ConnectIntegrationSpec caught)") {
    // enough rows that the scan really takes the columnar path, with null
    // elements scattered so their value slots sit next to real data
    val rows: Seq[(Long, Seq[java.lang.Float], Seq[java.lang.Float])] =
      (1L to 64L).map { i =>
        def v(seed: Long): Seq[java.lang.Float] = (0 until 8).map { d =>
          if ((seed + d) % 5 == 0) null
          else java.lang.Float.valueOf(((seed * 31 + d * 7) % 13 - 6).toFloat / 3.0f)
        }
        (i, v(i), v(i + 99))
      }
    val dir = new java.io.File("target/connect-fb-nullelem").getAbsolutePath
    rows.toDF("id", "a", "b").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val dots = back.select(col("id"),
        VectorFunctions.dotProduct(col("a"), col("b")).as("expr"),
        VectorFunctions.dotProductBuiltin(col("a"), col("b")).as("builtin"))
      .collect()
    assert(dots.length == 64)
    dots.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"id=${r.getLong(0)}: expr=${r.getDouble(1)} builtin=${r.getDouble(2)}")
    }
    val sigs = back.select(col("id"),
        LshPlanes.tableSignatures(col("a"), 8, 6, 3).as("expr"),
        LshPlanes.tableSignaturesBuiltin(col("a"), 8, 6, 3).as("builtin"))
      .collect()
    sigs.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"id=${r.getLong(0)}: expr=${r.getSeq[Long](1)} builtin=${r.getSeq[Long](2)}")
    }
  }

  test("decimal-element arrays work through BOTH evaluation paths (the " +
    "analyzer admits any numeric element type, so codegen must too)") {
    val df = spark.sql(
      """SELECT array(CAST(1.25 AS DECIMAL(10,2)), CAST(-2.50 AS DECIMAL(10,2))) AS a,
        |       array(CAST(4.00 AS DECIMAL(10,2)), CAST(0.50 AS DECIMAL(10,2))) AS b""".stripMargin)
    val expect = 1.25 * 4.00 + (-2.50) * 0.50
    // force EACH path explicitly (relying on ambient defaults could test
    // the interpreted path twice if an earlier suite leaked a conf);
    // restore both confs after — the session is shared across suites
    val prevWs = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    def path(wholeStage: Boolean, factoryMode: String): Double = {
      spark.conf.set("spark.sql.codegen.wholeStage", wholeStage.toString)
      spark.conf.set("spark.sql.codegen.factoryMode", factoryMode)
      df.select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
        .first().getDouble(0)
    }
    try {
      assert(path(wholeStage = true, "CODEGEN_ONLY") == expect)
      assert(path(wholeStage = false, "NO_CODEGEN") == expect)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWs)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFm)
    }
  }

  test("the server-functions dial reads the documented conf name and default, " +
    "once per session (it is a deployment property, not a per-query toggle)") {
    import graft.functions.GraftRegistry
    val key = "spark.graft.connect.functions"
    // memoized per session — on Connect a conf read is a server RPC and
    // query-build hot loops construct one column per LSH plane — so each
    // assertion uses a FRESH session whose first read is the one that counts
    val s1 = spark.newSession()
    assert(!GraftRegistry.useServerFunctions(s1)) // default: fallback
    val s2 = spark.newSession()
    s2.conf.set(key, "server")
    assert(GraftRegistry.useServerFunctions(s2))
    val s3 = spark.newSession()
    s3.conf.set(key, "fallback")
    assert(!GraftRegistry.useServerFunctions(s3))
    // and the memo sticks: flipping the conf later does not re-read
    s2.conf.set(key, "fallback")
    assert(GraftRegistry.useServerFunctions(s2))
  }
}
