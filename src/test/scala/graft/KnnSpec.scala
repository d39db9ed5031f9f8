package graft

import org.apache.spark.sql.functions._

import graft.operators.Ann

/** Filtered ANN + kNN majority-vote classification. */
class KnnSpec extends SparkTestBase {
  import spark.implicits._

  // two tight clusters on orthogonal axes + one outlier
  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 1),
    (1L, Array(0.9f, 0.1f, 0.0f), 1),
    (2L, Array(0.8f, 0.2f, 0.0f), 1),
    (3L, Array(0.0f, 1.0f, 0.0f), 2),
    (4L, Array(0.1f, 0.9f, 0.0f), 2),
    (5L, Array(0.0f, 0.8f, 0.2f), 2),
    (6L, Array(0.0f, 0.0f, 1.0f), 3)
  ).toDF("vec_id", "embedding", "label")

  test("filteredTopK searches only the label slice") {
    val r = Ann.filteredTopK(vecs, "embedding", "vec_id",
      col("label") === 2, Seq(1.0, 0.0, 0.0), k = 5)
      .collect().map(_.getLong(0))
    assert(r.toSet == Set(3L, 4L, 5L)) // only label-2 vectors, all 3 of them
    assert(r.head == 4L) // highest x-component of the label-2 cluster
  }

  test("knnClassify predicts by neighbor majority, excluding self") {
    val queries = vecs.where(col("vec_id").isin(0L, 3L))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val r = Ann.knnClassify(vecs, "embedding", "vec_id", "label",
      queries, "qv", "qid", k = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // vec 0's 3 nearest excluding itself: 1, 2 (label 1) and one label-2 -> 1
    assert(r(0L)._1 == 1L && r(0L)._2 == 2L)
    assert(r(3L)._1 == 2L && r(3L)._2 == 2L)
  }

  test("knnClassify vote tie breaks toward the smaller label") {
    // query equidistant from one label-5 and one label-4 vector, k=2
    val corpus = Seq(
      (10L, Array(1.0f, 1.0f, 0.0f), 5),
      (11L, Array(1.0f, -1.0f, 0.0f), 4)
    ).toDF("vec_id", "embedding", "label")
    val q = Seq((99L, Array(1.0f, 0.0f, 0.0f))).toDF("qid", "qv")
    val r = Ann.knnClassify(corpus, "embedding", "vec_id", "label",
      q, "qv", "qid", k = 2).collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L)
  }

  test("knnClassify plan: corpus is never shuffled — broadcast joins only") {
    val queries = vecs.limit(1).select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val plan = Ann.knnClassify(vecs, "embedding", "vec_id", "label",
      queries, "qv", "qid", k = 3).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    // the only hash exchanges are the tiny top-k aggregate + vote rollups,
    // never a repartition of the corpus by id
    assert(!plan.contains("SortMergeJoin"))
  }
}
