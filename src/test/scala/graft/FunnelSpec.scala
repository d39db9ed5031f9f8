package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** Ordered funnel + cohort retention. */
class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  // (user, ts, stage) — u1 full funnel; u2 out-of-order purchase (before
  // click) must NOT count; u3 abandons after view; u4 never enters.
  private lazy val events = Seq(
    (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
    (2L, 10L, "view"), (2L, 15L, "purchase"), (2L, 20L, "click"),
    (3L, 10L, "view"), (3L, 40L, "error"),
    (4L, 10L, "error"), (4L, 20L, "purchase")
  ).toDF("user_id", "ts", "stage")

  private val stages = Seq("view", "click", "purchase")

  test("stage reach follows order; out-of-order events don't count") {
    val r = Funnel.funnelStages(events, "user_id", "ts", "stage", stages)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))).toMap
    assert(r(1L) == ((Some(10L), Some(20L), Some(30L), 3L)))
    // u2's purchase precedes its click -> depth 2, purchase NULL
    assert(r(2L) == ((Some(10L), Some(20L), None, 2L)))
    assert(r(3L) == ((Some(10L), None, None, 1L)))
    assert(r(4L) == ((None, None, None, 0L)))
  }

  test("same-timestamp stage progression counts (>= semantics)") {
    val e = Seq((1L, 10L, "view"), (1L, 10L, "click")).toDF("user_id", "ts", "stage")
    val r = Funnel.funnelStages(e, "user_id", "ts", "stage", stages).collect()(0)
    assert(r.getLong(4) == 2L)
  }

  test("funnelCounts rolls up reach depth") {
    val r = Funnel.funnelCounts(events, "user_id", "ts", "stage", stages).collect()(0)
    assert(r.getLong(0) == 4L)  // n_keys
    assert(r.getLong(1) == 3L)  // reached view
    assert(r.getLong(2) == 2L)  // reached click in order
    assert(r.getLong(3) == 1L)  // full funnel
  }

  test("funnelStages plan: one exchange, windows and rollup share it") {
    val plan = Funnel.funnelStages(events, "user_id", "ts", "stage", stages)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("cohortRetention counts distinct keys per (cohort, offset)") {
    val act = Seq(
      (1L, 100L), (1L, 100L), (1L, 101L), // cohort 100, active d0 + d1
      (2L, 100L), (2L, 103L),             // cohort 100, active d0 + d3
      (3L, 101L)                          // cohort 101, active d0
    ).toDF("user_id", "day")
    val r = Funnel.cohortRetention(act, "user_id", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(r == Map(
      (100L, 0L) -> 2L, (100L, 1L) -> 1L, (100L, 3L) -> 1L, (101L, 0L) -> 1L))
  }
}
