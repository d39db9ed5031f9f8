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

  test("countsBuiltin (regex twin) is bit-identical to TextCounts on every " +
    "character-class corner") {
    import graft.functions.TextCounts
    val texts: Seq[Option[String]] = Seq(
      Some("Hello, World! 42 times."),
      Some(""), // empty: all zeros
      Some("   \t\n\f\r  "), // every ASCII whitespace, no tokens
      Some("héllo wörld — naïve café"), // multibyte code points count once
      Some("a\u00A0b"), // NBSP is NOT ASCII \s: one token, like the regex
      Some("[!?] {x} (y) 'quote' \"dq\" semi;colon: dash-done"),
      Some("ALL CAPS AND 123 digits_under"),
      None) // NULL text → NULL array
    val got = texts.toDF("t")
      .select(TextCounts.counts(col("t")).as("expr"),
        TextCounts.countsBuiltin(col("t")).as("builtin"))
      .collect()
    got.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(r.getSeq[Int](0) == r.getSeq[Int](1),
            s"expr=${r.getSeq[Int](0)} builtin=${r.getSeq[Int](1)}")
        case other => fail(s"null-ness diverged: $other")
      }
    }
  }

  test("WordSetCounts.countsBuiltin matches the expression on boundary, " +
    "case, ineligible-word, and duplicate-word corners") {
    import graft.functions.WordSetCounts
    val sets = Seq(
      Seq("the", "a", "ab"), // overlapping-prefix alternation
      Seq("don", "x_y"), // underscore is \w: 'don_t' matches neither set word
      Seq("can't", "The"), // ineligible: non-\w char / uppercase — never match
      Seq("hot", "hot"), // duplicate word: the expression counts it TWICE
      Seq.empty[String])
    val texts: Seq[Option[String]] = Seq(
      Some("THE cat a ab don don_t x_y hot hot hot"),
      Some("can't The the"), // apostrophe splits runs: can + t; 'The' lowers to the
      Some("héllo the wörld"), // multibyte bytes are run boundaries both ways
      Some(""),
      None)
    val got = texts.toDF("t")
      .select(WordSetCounts.counts(col("t"), "graft_wsc_fbspec", sets).as("expr"),
        WordSetCounts.countsBuiltin(col("t"), sets).as("builtin"))
      .collect()
    got.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(r.getSeq[Int](0) == r.getSeq[Int](1),
            s"expr=${r.getSeq[Int](0)} builtin=${r.getSeq[Int](1)}")
        case other => fail(s"null-ness diverged: $other")
      }
    }
    // spot-pin the duplicate-word double count so the equivalence above
    // cannot be two matching zeros
    val dup = Seq("hot hot hot").toDF("t")
      .select(WordSetCounts.countsBuiltin(col("t"), Seq(Seq("hot", "hot"))))
      .first().getSeq[Int](0)
    assert(dup == Seq(6)) // 3 occurrences × listed twice
  }

  test("Md5Longs.longsBuiltin (md5 + conv twin) is bit-identical, including " +
    "the SIGNED third projection on high-bit digests") {
    import graft.functions.Md5Longs
    val rows: Seq[Option[Array[Byte]]] = Seq(
      Some("hello world".getBytes("UTF-8")),
      Some(Array.empty[Byte]), // md5 of empty input is defined
      Some(Array[Byte](0, 1, 2, -1, -128, 127)),
      // sweep until digests with the sign bit set appear (md5("j") does —
      // but derive rather than hardcode)
      None) ++ (0 until 64).map(i => Some(s"probe-$i".getBytes("UTF-8")))
    val got = rows.toDF("b")
      .select(Md5Longs.longs(col("b")).as("expr"),
        Md5Longs.longsBuiltin(col("b")).as("builtin"))
      .collect()
    var sawNegative = false
    got.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          assert(r.getSeq[Long](0) == r.getSeq[Long](1),
            s"expr=${r.getSeq[Long](0)} builtin=${r.getSeq[Long](1)}")
          if (r.getSeq[Long](0)(2) < 0) sawNegative = true
        case other => fail(s"null-ness diverged: $other")
      }
    }
    // the corner that makes conv(…, 16, -10) load-bearing actually occurred
    assert(sawNegative, "no digest exercised the signed high-bit read")
  }

  test("PortableWinnowMd5.fingerprintsBuiltin (substr/md5/window-min twin) " +
    "is value- AND order-identical across gram/window corners") {
    import graft.functions.PortableWinnowMd5
    val texts: Seq[Option[String]] = Seq(
      Some("the quick brown fox jumps over the lazy dog the quick brown"),
      Some("aaaaaaaaaaaa"), // all-equal gram hashes: ties cannot change values
      Some("abc"), // shorter than k: whole-text gram (substr truncates)
      Some("ab cd ab cd ab cd"), // repeated fingerprints: first-selection dedup
      Some(""), // empty text fingerprints the empty gram
      Some("héllo wörld héllo wörld"), // positions are CODE POINTS
      None)
    for ((k, w) <- Seq((5, 4), (3, 2), (1, 1), (8, 3))) {
      val got = texts.toDF("t")
        .select(PortableWinnowMd5.fingerprints(col("t"), k, w).as("expr"),
          PortableWinnowMd5.fingerprintsBuiltin(col("t"), k, w).as("builtin"))
        .collect()
      got.foreach { r =>
        (r.isNullAt(0), r.isNullAt(1)) match {
          case (true, true) => ()
          case (false, false) =>
            assert(r.getSeq[Long](0) == r.getSeq[Long](1),
              s"k=$k w=$w: expr=${r.getSeq[Long](0)} builtin=${r.getSeq[Long](1)}")
          case other => fail(s"k=$k w=$w null-ness diverged: $other")
        }
      }
    }
  }

  test("topKByScoreBuiltin returns the heap's exact ranking (NaN ranks " +
    "first, NULLs skipped, short groups, id tiebreak); the -0.0/0.0 tie " +
    "is the one documented order divergence") {
    import graft.functions.VectorFunctions
    val rows = Seq(
      // (group, score, id)
      ("g1", Some(1.0), Some(10L)), ("g1", Some(3.0), Some(11L)),
      ("g1", Some(2.0), Some(12L)), ("g1", Some(3.0), Some(5L)), // tie → id asc
      ("g1", Some(Double.NaN), Some(99L)), // NaN > everything (Double.compare)
      ("g1", None, Some(1L)), ("g1", Some(9.0), None), // skipped
      ("g2", Some(0.5), Some(20L))) // short group: fewer than k rows
    val df = rows.toDF("g", "s", "id")
    def ranked(c: org.apache.spark.sql.Column) =
      df.groupBy("g").agg(c.as("top")).orderBy("g").collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(p => (p.getDouble(0), p.getLong(1))).toList).toMap
    val expr = ranked(VectorFunctions.topKByScore(col("s"), col("id"), 3))
    val twin = ranked(VectorFunctions.topKByScoreBuiltin(col("s"), col("id"), 3))
    assert(expr("g1").head._2 == 99L && expr("g1").head._1.isNaN)
    assert(expr("g1").map(_._2) == List(99L, 5L, 11L)) // NaN, then 3.0-tie by id
    assert(twin("g1").map(_._2) == expr("g1").map(_._2))
    assert(twin("g2") == expr("g2") && twin("g2") == List((0.5, 20L)))
    // the documented corner: Double.compare orders -0.0 < 0.0 (heap ranks
    // +0.0 better under DESC); SQL comparison calls them equal, so the
    // twin falls through to the id tiebreak — same SET, that one tie's
    // order may differ
    val zeros = Seq(("z", -0.0, 7L), ("z", 0.0, 3L)).toDF("g", "s", "id")
    def zorder(c: org.apache.spark.sql.Column): List[Long] =
      zeros.groupBy("g").agg(c.as("top")).first()
        .getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).toList
    assert(zorder(VectorFunctions.topKByScore(col("s"), col("id"), 2)) ==
      List(3L, 7L)) // +0.0 (id 3) first under Double.compare
    assert(zorder(VectorFunctions.topKByScoreBuiltin(col("s"), col("id"), 2)) ==
      List(3L, 7L)) // equal scores → id asc: happens to agree here
    assert(zorder(VectorFunctions.topKByScoreBuiltin(col("s") * -1.0, col("id"), 2)) ==
      List(3L, 7L)) // negated: still id asc (SQL −0.0 = 0.0) …
    assert(zorder(VectorFunctions.topKByScore(col("s") * -1.0, col("id"), 2)) ==
      List(7L, 3L)) // … while the heap flips with the sign bit — the corner
  }

  test("vectorSumBuiltin matches the VectorSum expression element-wise within " +
    "ulp tolerance (the documented summation-order divergence) with the same " +
    "NULL-array skip, NULL-element-as-0.0, and ragged-error semantics") {
    val rows = Seq(
      ("g1", Some(Seq[java.lang.Float](1.0f, 2.0f, 3.0f))),
      ("g1", Some(Seq[java.lang.Float](0.5f, null, -1.0f))), // null elem adds 0.0
      ("g1", None), // NULL array skipped, not counted in n
      ("g2", Some(Seq[java.lang.Float](1e30f, 1.0f, -1e30f))),
      ("g3", None)) // group of only NULL arrays → (array(), 0)
    val df = rows.toDF("g", "v")
    def agg(c: org.apache.spark.sql.Column): Map[String, (List[Double], Long)] =
      df.groupBy("g").agg(c.as("vs")).orderBy("g").collect()
        .map { r =>
          val s = r.getStruct(1)
          r.getString(0) -> (s.getSeq[Double](0).toList, s.getLong(1))
        }.toMap
    val expr = agg(VectorFunctions.vectorSum(col("v")))
    val twin = agg(VectorFunctions.vectorSumBuiltin(col("v")))
    assert(expr.keySet == twin.keySet)
    expr.foreach { case (g, (es, en)) =>
      val (ts, tn) = twin(g)
      assert(tn == en, s"$g: n diverged expr=$en twin=$tn")
      assert(ts.size == es.size, s"$g: dim diverged")
      es.zip(ts).foreach { case (a, b) =>
        assert(math.abs(a - b) <=
          4 * math.ulp(math.max(math.abs(a), math.abs(b)).max(1e-300)),
          s"$g: $a vs $b beyond the ±ulp guarantee")
      }
    }
    assert(expr("g1")._2 == 2L && expr("g1")._1 == List(1.5, 2.0, 2.0))
    assert(expr("g3") == (Nil, 0L) && twin("g3") == (Nil, 0L))
    // ragged input raises on BOTH paths (zip_with would otherwise
    // silently null-pad the shorter array in the twin)
    val ragged = Seq(("r", Seq(1.0)), ("r", Seq(1.0, 2.0))).toDF("g", "v")
    def messageChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    Seq(VectorFunctions.vectorSum(col("v")),
        VectorFunctions.vectorSumBuiltin(col("v"))).foreach { c =>
      val t = intercept[Throwable] {
        ragged.groupBy("g").agg(c.as("vs")).collect()
      }
      assert(messageChain(t).contains("ragged"), s"unexpected error: $t")
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
