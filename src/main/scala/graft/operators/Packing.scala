package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign documents to
  * fixed-token-budget packs (the step between a cleaned corpus and a
  * tokenized training run, where short documents are concatenated up to the
  * model's context length to avoid padding waste).
  *
  * Greedy bin packing is inherently sequential, so the distributed design
  * makes the SEQUENTIAL UNIT deterministic and small instead of trying to
  * parallelize the scan: documents are hash-bucketed into `groups`
  * independent streams (md5 of the id — stable across engines, runs and
  * physical partitionings), and each stream is packed first-fit-decreasing
  * in (tokens desc, id) order via `flatMapSortedGroups`. Parallelism =
  * `groups`; per-group state is the open-bin list. Results are bit-stable
  * run to run — pinned by OpsSpec against a repartitioned input.
  */
object Packing {

  /** Power-of-two length bucket (`ceil(log2(max(tokens, 1)))`) — the cheap
    * batching key when exact packing isn't needed. */
  def lengthBucket(tokens: Column): Column =
    ceil(log(2.0, greatest(tokens, lit(1)))).cast("int")

  final case class PackedDoc(pack_group: Int, pack_idx: Int, doc_id: Long, tokens: Long)

  /** First-fit-decreasing packing of (id, tokens) rows into packs of at
    * most `budget` tokens, `groups` deterministic parallel streams.
    * Documents larger than the budget get a singleton pack (callers
    * truncate downstream). Returns (pack_group, pack_idx, doc_id, tokens). */
  def packGreedy(
      df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, groups: Int = 1024): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(groups > 0, s"groups must be positive, got $groups")
    val spark = df.sparkSession
    import spark.implicits._
    // NULL ids are excluded (their hash bucket is NULL), matching
    // Sampling.hashSample's policy for identity-less rows; NULL token
    // counts (e.g. from NULL text) are likewise excluded rather than
    // crashing the non-nullable encoder
    val keyed = df.where(col(idCol).isNotNull && col(tokensCol).isNotNull).select(
      Sampling.hashBucket(col(idCol), groups).cast("int").as("g"),
      col(idCol).cast("long").as("id"),
      col(tokensCol).cast("long").as("tokens"))
      .as[(Int, Long, Long)]
    keyed
      .groupByKey(_._1)
      .flatMapSortedGroups(desc("tokens"), asc("id")) { (group, rows) =>
        // open-bin remaining capacities, index = pack_idx within the group
        val remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        rows.map { case (_, id, tokens) =>
          var i = 0
          while (i < remaining.length && remaining(i) < tokens) i += 1
          if (i == remaining.length) remaining += (budget - tokens).max(0L)
          else remaining(i) -= tokens
          PackedDoc(group, i, id, tokens)
        }
      }
      .toDF()
  }

  /** Per-group packing rollup (deterministic; used by the driver query):
    * (pack_group, n_docs, n_packs, total_tokens, max_pack_tokens). */
  def packStats(packed: DataFrame): DataFrame =
    packed.groupBy("pack_group", "pack_idx")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("pack_tokens"))
      .groupBy("pack_group")
      .agg(
        sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_packs"),
        sum(col("pack_tokens")).as("total_tokens"),
        max(col("pack_tokens")).as("max_pack_tokens"))
      .orderBy("pack_group")

  /** Budget-aware packing QUALITY rollup — the numbers a batch-construction
    * pipeline actually watches: per group,
    *
    *   - `utilization`: total tokens over total pack capacity
    *     (n_packs × budget) — the padding-waste complement; exact-long
    *     inputs and one division keep it bit-stable;
    *   - `n_full_packs`: packs at ≥ 90% of budget;
    *   - `n_overflow_packs`: singleton packs carrying a document larger
    *     than the budget (callers truncate these downstream);
    *   - `min/max_pack_tokens`: the fill spread.
    *
    * Same two-level aggregation shape as [[packStats]] (map-side combine
    * at both levels, shuffle keyed by (group, pack) then group). */
  def packQuality(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    packed.groupBy("pack_group", "pack_idx")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("pack_tokens"))
      .groupBy("pack_group")
      .agg(
        sum(col("n_docs")).as("n_docs"),
        count(lit(1)).as("n_packs"),
        sum(col("pack_tokens")).as("total_tokens"),
        min(col("pack_tokens")).as("min_pack_tokens"),
        max(col("pack_tokens")).as("max_pack_tokens"),
        sum(when(col("pack_tokens") * 10 >= lit(budget) * 9, 1L).otherwise(0L))
          .as("n_full_packs"),
        sum(when(col("pack_tokens") > budget, 1L).otherwise(0L))
          .as("n_overflow_packs"))
      .select(col("pack_group").cast("long").as("pack_group"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_packs").cast("long").as("n_packs"),
        col("total_tokens").cast("long").as("total_tokens"),
        col("min_pack_tokens").cast("long").as("min_pack_tokens"),
        col("max_pack_tokens").cast("long").as("max_pack_tokens"),
        col("n_full_packs").cast("long").as("n_full_packs"),
        col("n_overflow_packs").cast("long").as("n_overflow_packs"),
        (col("total_tokens").cast("double") /
          (col("n_packs") * lit(budget)).cast("double")).as("utilization"))
      .orderBy("pack_group")
  }
}
