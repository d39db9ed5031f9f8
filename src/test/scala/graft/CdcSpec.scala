package graft

import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Row-level CDC snapshot diff. */
class CdcSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val oldDf = Seq(
    (1L, "a", 10.0, "x"),
    (2L, "b", 20.0, "y"),
    (3L, "c", 30.0, null.asInstanceOf[String]),
    (4L, "d", 40.0, "w")
  ).toDF("id", "name", "qty", "tag")

  private lazy val newDf = Seq(
    (1L, "a", 10.0, "x"),   // unchanged
    (2L, "B", 25.0, "y"),   // update: name, qty
    (3L, "c", 30.0, "t"),   // update: tag (NULL -> value)
    (5L, "e", 50.0, "z")    // insert; 4 deleted
  ).toDF("id", "name", "qty", "tag")

  test("snapshotDiff classifies insert/delete/update/unchanged") {
    val d = Cdc.snapshotDiff(oldDf, newDf, Seq("id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(2), r.getLong(3)))).toMap
    assert(d(1L) == (("unchanged", "", 0L)))
    assert(d(2L) == (("update", "name,qty", 2L)))
    assert(d(3L) == (("update", "tag", 1L))) // NULL -> value is a change
    assert(d(4L) == (("delete", "", 0L)))
    assert(d(5L) == (("insert", "", 0L)))
  }

  test("changes drops unchanged rows and keeps the event set") {
    val types = Cdc.changes(oldDf, newDf, Seq("id"))
      .groupBy("change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("update" -> 2L, "insert" -> 1L, "delete" -> 1L))
  }

  test("explicit compareCols restricts the diff") {
    val d = Cdc.snapshotDiff(oldDf, newDf, Seq("id"), compareCols = Seq("qty"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(2L) == "update")   // qty changed
    assert(d(3L) == "unchanged") // only tag changed, not compared
  }

  test("null-safe key join pairs NULL keys") {
    val a = Seq((Option.empty[Long], 1.0), (Some(7L), 2.0)).toDF("id", "v")
    val b = Seq((Option.empty[Long], 9.0), (Some(7L), 2.0)).toDF("id", "v")
    val d = Cdc.snapshotDiff(a, b, Seq("id")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(1)).toMap
    assert(d(-1L) == "update") // NULL keys matched, value changed
    assert(d(7L) == "unchanged")
  }

  test("applyChanges roundtrip: apply(A, changesWithValues(A,B)) == B") {
    import spark.implicits._
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L), (4L, "w", 40L))
      .toDF("id", "s", "v")
    val b = Seq((1L, "x", 10L), (2L, "y", 99L), (4L, "W", 40L), (5L, "n", 50L))
      .toDF("id", "s", "v") // 2 updated, 3 deleted, 4 updated, 5 inserted
    val cs = Cdc.changesWithValues(a, b, Seq("id"), Seq("s", "v"))
    val kinds = cs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(2L -> "update", 3L -> "delete", 4L -> "update", 5L -> "insert"))
    val applied = Cdc.applyChanges(a, cs, Seq("id"), Seq("s", "v"))
      .as[(Long, String, Long)].collect().toSet
    val expect = b.as[(Long, String, Long)].collect().toSet
    assert(applied == expect)
    // deletes carry null values in the changeset
    val del = cs.where(col("change_type") === "delete").collect()(0)
    assert(del.isNullAt(2) && del.isNullAt(3))
  }

  test("maintainJoinView == direct rejoin under inserts, updates AND deletes") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    // dim (a): key, attr; fact (b): key, line, val — 1:many
    val a0 = Seq((1L, "p"), (2L, "q"), (3L, "r"), (4L, "s")).toDF("k", "attr")
    val a1 = Seq((1L, "p"), (2L, "Q"), (4L, "s"), (5L, "t")).toDF("k", "attr")
    // a: 2 updated, 3 DELETED (its view rows must vanish), 5 inserted
    val b0 = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (3L, 1, 30L), (4L, 1, 40L))
      .toDF("k2", "line", "v")
    val b1 = Seq((1L, 1, 10L), (2L, 1, 20L), (4L, 1, 41L), (5L, 1, 50L), (5L, 2, 51L))
      .toDF("k2", "line", "v") // (1,2) deleted, (4,1) updated, 5's lines inserted
    def proj(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, col("k") === col("k2")).select(col("k"), col("line"), col("attr"), col("v"))
    val dA = Cdc.changes(a0, a1, Seq("k"))
    val dB = Cdc.changes(b0, b1, Seq("k2", "line"))
    val incr = Cdc.maintainJoinView(proj(a0, b0), a1, b1, dA, dB, "k", "k2")(proj)
      .as[(Long, Int, String, Long)].collect().toSet
    val direct = proj(a1, b1).as[(Long, Int, String, Long)].collect().toSet
    assert(incr == direct)
    // deleted dim key 3 left no residue; untouched key 1's surviving line passed through
    assert(!incr.exists(_._1 == 3L) && incr.contains((1L, 1, "p", 10L)))
  }

  test("maintainJoinView plan: view passes through one broadcast anti join, no rejoin") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val a = (1L to 100L).map(i => (i, s"a$i")).toDF("k", "attr")
    val b = (1L to 100L).flatMap(i => Seq((i, 1, i), (i, 2, i + 1))).toDF("k2", "line", "v")
    def proj(x: DataFrame, y: DataFrame): DataFrame =
      x.join(y, col("k") === col("k2")).select(col("k"), col("line"), col("attr"), col("v"))
    val dA = Cdc.changes(a, a.where(col("k") =!= 7L), Seq("k"))
    val plan = Cdc.maintainJoinView(proj(a, b), a, b, dA,
      Cdc.changes(b, b, Seq("k2", "line")), "k", "k2")(proj)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // the untouched-view branch and the two slices all key off broadcasts
    assert(plan.contains("BroadcastExchange"))
  }

  test("single full-outer join plan — no extra exchanges beyond the join") {
    val plan = Cdc.snapshotDiff(oldDf, newDf, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter") || plan.contains("full_outer"))
    // classification is pure projection: exactly one join node
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 1)
  }

  test("scd2 intervals: per-key validity chain, deterministic under ts ties") {
    val h = Seq(
      (1L, 10L, 100L), // key 1: three versions
      (1L, 11L, 200L),
      (1L, 12L, 300L),
      (2L, 20L, 150L), // key 2: ts tie → event_id order decides
      (2L, 21L, 150L)
    ).toDF("k", "eid", "t")
    val got = Cdc.scd2Intervals(h, Seq("k"), "t", "eid")
      .select("k", "eid", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, 10L, 100L, 200L, false),
      (1L, 11L, 200L, 300L, false),
      (1L, 12L, 300L, -1L, true),
      (2L, 20L, 150L, 150L, false), // earlier tie: zero-length interval
      (2L, 21L, 150L, -1L, true)))
  }

  test("snapshot diff: added/removed/changed/renamed with unique-hash pairing only") {
    import graft.operators.SnapshotDiff
    val a = Seq(
      (1L, "alpha"),   // unchanged
      (2L, "beta"),    // changed in b
      (3L, "gamma"),   // removed (content nowhere in b's arrivals)
      (4L, "delta"),   // renamed → id 44
      (5L, "dup"),     // ambiguous: two leavers share content...
      (6L, "dup")      // ...so NEITHER pairs with b's single "dup" arrival
    ).toDF("doc_id", "text")
    val b = Seq(
      (1L, "alpha"),
      (2L, "beta v2"),
      (44L, "delta"),  // renamed from 4
      (55L, "dup"),    // ambiguous arrival → stays added
      (7L, "epsilon")  // genuinely new
    ).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(a, b, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set(
      (2L, "changed", -1L),
      (44L, "renamed", 4L),
      (3L, "removed", -1L),
      (5L, "removed", -1L),
      (6L, "removed", -1L),
      (55L, "added", -1L),
      (7L, "added", -1L)))
    // unchanged rows are not emitted
    assert(!got.exists(_._1 == 1L))
  }

  test("snapshot diff: NULL content is a real hash value, not a classification hole") {
    import graft.operators.SnapshotDiff
    val a = Seq(
      (1L, Option("alpha")),  // content nulls out in b → changed
      (2L, Option.empty[String]), // NULL on both sides → unchanged
      (3L, Option.empty[String])  // NULL content removed outright
    ).toDF("doc_id", "text")
    val b = Seq(
      (1L, Option.empty[String]),
      (2L, Option.empty[String]),
      (4L, Option("fresh"))
    ).toDF("doc_id", "text")
    val got = SnapshotDiff.diff(a, b, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // 1: value→NULL is a content change; 2: NULL≡NULL so unchanged (not
    // emitted); 3's NULL hash finds no arrival with NULL content → removed.
    assert(got == Set(
      (1L, "changed", -1L),
      (3L, "removed", -1L),
      (4L, "added", -1L)))
    // NULL content is distinct from empty-string content (flag byte)
    val a2 = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    val b2 = Seq((1L, Option(""))).toDF("doc_id", "text")
    val g2 = SnapshotDiff.diff(a2, b2, "doc_id", "text").collect()
    assert(g2.length == 1 && g2.head.getString(1) == "changed")
  }

  test("scd2 intervals: rejects history frames that already carry output columns") {
    val h = Seq((1L, 10L, 100L, true)).toDF("k", "eid", "t", "is_current")
    val e = intercept[IllegalArgumentException] {
      Cdc.scd2Intervals(h, Seq("k"), "t", "eid")
    }
    assert(e.getMessage.contains("is_current"))
  }
}
