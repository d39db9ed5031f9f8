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

  test("single full-outer join plan — no extra exchanges beyond the join") {
    val plan = Cdc.snapshotDiff(oldDf, newDf, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter") || plan.contains("full_outer"))
    // classification is pure projection: exactly one join node
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(plan).size == 1)
  }
}
