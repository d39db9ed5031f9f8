package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous per-group top-k over an unbounded stream with BOUNDED state:
  * Space-Saving (Metwally, Agrawal, El Abbadi — ICDT'05) per group key,
  * maintained in `flatMapGroupsWithState`.
  *
  * Each group holds at most `capacity` counters `(item → (count, err))`.
  * A new item beyond capacity evicts the minimum-count counter and
  * inherits its count as overestimation error (`err`), preserving the
  * Space-Saving invariants: every stored `count` is an upper bound on the
  * item's true count, `count − err` a lower bound, and any item with true
  * frequency > N/capacity is guaranteed present. With `capacity ≥` the
  * group's distinct-item count there are no evictions, `err ≡ 0`, and the
  * emitted top-k is EXACT — the configuration q_events_stream_topk runs,
  * which is what lets an incremental stateful stream hash-check against a
  * plain batch `GROUP BY`/`row_number` mirror. The eviction path's bounds
  * are pinned by StreamingTopKSpec with a deliberately tiny capacity.
  *
  * Scale shape: state per group is O(capacity), independent of stream
  * length; each micro-batch shuffles only its own rows (pre-aggregated
  * per item below, so a batch contributes ≤ distinct-items rows per
  * group, not per-event rows). Emission after each batch carries the
  * group's cumulative event count `events_seen`, so a consumer — or the
  * driver's replay harness — can select each group's latest emission
  * without relying on sink ordering.
  *
  * Victim choice ties deterministically on (count, item) so replays
  * reproduce byte-identical state histories.
  */
object StreamingTopK {

  /** One emitted top-k row. */
  final case class TopKRow(
      group: String, events_seen: Long, rank: Int,
      item: Long, n: Long, err: Long)

  /** (events_seen, counters) per group. */
  final case class TopKState(total: Long, counts: Map[Long, (Long, Long)])

  /** Wire the operator over a streaming (or batch-test) frame with a
    * string group column and a long item column. Emits, per group per
    * micro-batch, that group's current top-k in Update mode. */
  def topKPerGroup(
      events: DataFrame, groupCol: String, itemCol: String,
      k: Int, capacity: Int)(implicit spark: SparkSession): Dataset[TopKRow] = {
    import spark.implicits._
    events
      .select(col(groupCol).cast("string"), col(itemCol).cast("long"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, TopKRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (group, rows, state) =>
          var st = state.getOption.getOrElse(TopKState(0L, Map.empty))
          // pre-aggregate the batch per item: eviction decisions then see
          // item totals, and the per-item loop is O(distinct), not O(rows)
          val batch = scala.collection.mutable.LinkedHashMap[Long, Long]()
          rows.foreach { case (_, item) =>
            batch.update(item, batch.getOrElse(item, 0L) + 1L)
          }
          // deterministic apply order (item asc) so replays and shuffled
          // arrivals produce identical eviction histories
          var m = st.counts
          var total = st.total
          batch.toSeq.sortBy(_._1).foreach { case (item, cnt) =>
            total += cnt
            m.get(item) match {
              case Some((c, e)) => m = m.updated(item, (c + cnt, e))
              case None if m.size < capacity => m = m.updated(item, (cnt, 0L))
              case None =>
                val (vi, (vc, _)) = m.minBy { case (i, (c, _)) => (c, i) }
                m = (m - vi).updated(item, (vc + cnt, vc))
            }
          }
          st = TopKState(total, m)
          state.update(st)
          val top = m.toSeq
            .map { case (i, (c, e)) => (i, c, e) }
            .sortBy { case (i, c, _) => (-c, i) }
            .take(k)
          top.iterator.zipWithIndex.map { case ((i, c, e), r) =>
            TopKRow(group, total, r + 1, i, c, e)
          }
      }
  }
}
