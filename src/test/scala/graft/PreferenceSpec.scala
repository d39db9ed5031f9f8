package graft

import org.apache.spark.sql.functions._

import graft.operators.Preference

/** The alignment/eval pack's contracts: preference pairs never cross ranks
  * or re-use a response, the margin and NULL-score rules hold, group
  * advantages are the exact population z-score with the 0-std and NULL
  * escapes, and the win matrix counts every decided comparison exactly
  * once per unordered model pair. */
class PreferenceSpec extends SparkTestBase {
  import spark.implicits._

  test("preferencePairs: i-th best pairs with i-th worst, ranks never " +
    "cross, each response appears at most once, margin and NULL scores " +
    "filter, odd groups leave their median unpaired") {
    val rows = Seq(
      // prompt 1: scores 10,20,30,40,50 (ids 1..5) — odd count: median id 3
      // stays unpaired; pairs (50 vs 10), (40 vs 20)
      (1L, 1L, Some(10L)), (1L, 2L, Some(20L)), (1L, 3L, Some(30L)),
      (1L, 4L, Some(40L)), (1L, 5L, Some(50L)),
      // prompt 2: two responses, gap 5 < margin → no pair
      (2L, 6L, Some(100L)), (2L, 7L, Some(105L)),
      // prompt 3: a NULL score ranks last but can never clear the margin
      (3L, 8L, Some(90L)), (3L, 9L, None),
      // prompt 4: a tie — tiebreak by id, gap 0 < margin → no pair
      (4L, 10L, Some(7L)), (4L, 11L, Some(7L)))
      .toDF("prompt", "id", "score")
    val pairs = Preference.preferencePairs(rows, "prompt", "id", "score",
      margin = 10.0, maxPairs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getLong(2), r.getLong(4))).sortBy(t => (t._1, t._2))
    assert(pairs.toSeq == Seq(
      (1L, 1, 5L, 1L), // best 50 vs worst 10
      (1L, 2, 4L, 2L))) // 2nd best 40 vs 2nd worst 20; id 3 unpaired
    // single-response prompts cannot pair with themselves
    val solo = Seq((9L, 99L, Some(5L))).toDF("prompt", "id", "score")
    assert(Preference.preferencePairs(solo, "prompt", "id", "score",
      0.0).count() == 0L)
    intercept[IllegalArgumentException] {
      Preference.preferencePairs(rows, "prompt", "id", "score", -1.0)
    }
    intercept[IllegalArgumentException] {
      Preference.preferencePairs(rows, "prompt", "id", "score", 1.0, 0)
    }
  }

  test("groupAdvantage: exact population z-score from long moments; a " +
    "constant group and a singleton get advantage 0.0, NULL values get " +
    "NULL and are excluded from the moments") {
    val rows = Seq(
      ("a", 1L, Some(2L)), ("a", 2L, Some(4L)), ("a", 3L, Some(6L)),
      ("a", 4L, None), // excluded from a's moments
      ("b", 5L, Some(7L)), ("b", 6L, Some(7L)), // constant group
      ("c", 7L, Some(42L))) // singleton
      .toDF("g", "id", "v")
    val out = Preference.groupAdvantage(rows, "g", "v")
      .select("id", "group_mean", "group_std", "advantage").collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // group a: mean 4, var (4+16+36)/3 - 16 = 56/3-16 = 8/3
    val stdA = math.sqrt(56.0 / 3 - 16.0)
    assert(out(1L) == ((4.0, stdA, Some((2.0 - 4.0) / stdA))))
    assert(out(2L)._3 == Some(0.0))
    assert(out(3L) == ((4.0, stdA, Some((6.0 - 4.0) / stdA))))
    assert(out(4L)._3.isEmpty) // NULL value → NULL advantage
    assert(out(5L) == ((7.0, 0.0, Some(0.0)))) // constant group
    assert(out(7L) == ((42.0, 0.0, Some(0.0)))) // singleton
    intercept[IllegalArgumentException] {
      Preference.groupAdvantage(rows.withColumn("advantage", lit(1)), "g", "v")
    }
  }

  test("bradleyTerry: strengths order a dominance chain, ties split evenly, " +
    "unplayed models drop, and the MM fixed point matches a hand-computed " +
    "two-model case") {
    // two models, A beats B 3:1 → BT closed form: s_A/s_B = 3 after
    // convergence; normalized s_A = 0.75 (8 iterations converge far past
    // double precision for m=2... assert within 1e-9)
    val ab = Seq((1L, "A", 4L), (1L, "B", 3L), (2L, "A", 4L), (2L, "B", 3L),
      (3L, "A", 4L), (3L, "B", 3L), (4L, "A", 1L), (4L, "B", 2L))
      .toDF("prompt", "model", "score")
    val sAB = Preference.bradleyTerry(ab, "prompt", "model", "score")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(math.abs(sAB("A")._1 - 0.75) < 1e-9 &&
      math.abs(sAB("B")._1 - 0.25) < 1e-9)
    assert(sAB("A")._2 == 3.0 && sAB("B")._2 == 1.0) // wins
    assert(sAB("A")._3 == 4L && sAB("B")._3 == 4L) // games
    // dominance chain A > B > C: strengths strictly ordered, sum to 1
    val chain = Seq(
      (1L, "A", 9L), (1L, "B", 5L), (1L, "C", 1L),
      (2L, "A", 9L), (2L, "B", 5L), (2L, "C", 1L),
      (3L, "A", 5L), (3L, "B", 9L), (3L, "C", 1L)) // one upset
      .toDF("prompt", "model", "score")
    val sc = Preference.bradleyTerry(chain, "prompt", "model", "score")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sc("A") > sc("B") && sc("B") > sc("C"))
    assert(math.abs(sc.values.sum - 1.0) < 1e-12)
    // all ties → equal strengths; an unplayed model (NULL score on its
    // only comparisons) is dropped entirely
    val ties = Seq((1L, "A", Some(5L)), (1L, "B", Some(5L)),
      (1L, "Z", None)).toDF("prompt", "model", "score")
    val st = Preference.bradleyTerry(ties, "prompt", "model", "score")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(st.keySet == Set("A", "B") && st("A") == st("B"))
    // numeric model ids normalize to strings instead of crashing the
    // driver-side fold
    val numeric = ab.withColumn("model",
      when(col("model") === "A", 1L).otherwise(2L))
    val sNum = Preference.bradleyTerry(numeric, "prompt", "model", "score")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sNum.keySet == Set("1", "2") &&
      math.abs(sNum("1") - 0.75) < 1e-9)
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(ab, "prompt", "model", "score", iters = 0)
    }
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(ab, "prompt", "model", "score", maxModels = 1)
    }
  }

  test("winMatrix: one row per unordered model pair, every decided " +
    "comparison counted once, NULL-score comparisons skipped, win rate " +
    "NULL when everything tied") {
    val rows = Seq(
      // prompt 1: A=3, B=1, C=3 → A>B, C>B, A=C tie
      (1L, "A", Some(3L)), (1L, "B", Some(1L)), (1L, "C", Some(3L)),
      // prompt 2: A=1, B=2 (C absent — no AC/BC comparison here)
      (2L, "A", Some(1L)), (2L, "B", Some(2L)),
      // prompt 3: B's score NULL → the AB comparison is skipped entirely
      (3L, "A", Some(9L)), (3L, "B", None))
      .toDF("prompt", "model", "score")
    val m = Preference.winMatrix(rows, "prompt", "model", "score")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(m.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(m(("A", "B")) == ((1L, 1L, 0L, 2L, Some(0.5))))
    assert(m(("A", "C")) == ((0L, 0L, 1L, 1L, None))) // all tied → NULL rate
    assert(m(("B", "C")) == ((0L, 1L, 0L, 1L, Some(0.0))))
    // two responses by the same model on one prompt: each cross-model
    // response comparison counts (2 responses of A vs 1 of B = 2)
    val multi = Seq((1L, "A", 5L), (1L, "A", 1L), (1L, "B", 3L))
      .toDF("prompt", "model", "score")
    val ab = Preference.winMatrix(multi, "prompt", "model", "score").first()
    assert(ab.getLong(2) == 1L && ab.getLong(3) == 1L && ab.getLong(5) == 2L)
  }
}
