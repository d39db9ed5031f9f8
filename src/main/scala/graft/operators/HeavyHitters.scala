package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact support-threshold heavy hitters via a two-pass
  * candidates-then-recount pipeline.
  *
  * Pass 1 runs a per-partition Misra-Gries summary (the mergeable
  * "compress" formulation of Agarwal et al., *Mergeable Summaries*,
  * PODS'12): each partition streams its tokens through a bounded map of
  * `capacity` counters, letting it grow to `2·capacity` and then
  * compressing — subtract the `(capacity+1)`-th largest count from every
  * entry and drop the non-positives. Each compress removes at least
  * `(capacity+1) · cut` total mass, so the sum of all cuts in a partition
  * is at most `N_p / (capacity+1)`, giving the classic MG guarantee
  *
  *   storedCount(t)  ≥  trueCount_p(t) − N_p / (capacity+1).
  *
  * Summed over partitions: any token with global count
  * `> N / (capacity+1)` has a positive stored count in at least one
  * partition summary and therefore appears among the candidates. With
  * `capacity ≥ denominator` the candidate set provably contains every
  * token at or above the support threshold `freq · denominator ≥ N` —
  * so pass 2's exact recount of the (bounded) candidate set yields the
  * EXACT answer, independent of any sketch internals. That is what makes
  * a sketch-accelerated operator oracle-checkable bit-for-bit against a
  * plain `GROUP BY … HAVING` mirror.
  *
  * Scale shape: pass 1 is one scan with O(capacity) memory per task and
  * amortized O(log capacity) per token (the compress sorts 2·capacity
  * entries once per ≥capacity insertions); the candidate union is at most
  * `capacity × partitions` rows — kilobytes — and broadcasts to pass 2's
  * semi join, so the token stream itself never shuffles: the only
  * aggregation keyed on tokens is over the candidate-filtered stream,
  * whose distinct-key cardinality is ≤ the candidate count.
  */
object HeavyHitters {

  /** Per-partition mergeable-MG candidate summaries: (token, lower-bound
    * count) rows, at most `capacity` per input partition. */
  def candidateSummaries(tokens: DataFrame, tokenCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = tokens.sparkSession
    import spark.implicits._
    tokens.select(col(tokenCol).cast("string")).as[String].mapPartitions { it =>
      val m = new java.util.HashMap[String, Long](4 * capacity)
      def compress(): Unit = {
        if (m.size > capacity) {
          val counts = new Array[Long](m.size)
          var i = 0
          val vit = m.values().iterator()
          while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
          java.util.Arrays.sort(counts)
          // (capacity+1)-th largest = counts[size - capacity - 1]
          val cut = counts(m.size - capacity - 1)
          val eit = m.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
          }
        }
      }
      while (it.hasNext) {
        val t = it.next()
        m.put(t, m.getOrDefault(t, 0L) + 1L)
        if (m.size > 2 * capacity) compress()
      }
      compress()
      val out = new Array[(String, Long)](m.size)
      var i = 0
      val eit = m.entrySet().iterator()
      while (eit.hasNext) { val e = eit.next(); out(i) = (e.getKey, e.getValue); i += 1 }
      out.iterator
    }.toDF(tokenCol, "lower_bound")
  }

  /** Exact heavy hitters over a token stream: every token whose frequency
    * satisfies `freq · denominator ≥ totalTokens` (support ≥
    * 1/denominator), with its EXACT count. Requires
    * `capacity ≥ denominator` for the completeness proof above. Returns
    * (token, freq) — the integer cross-multiplied threshold keeps the
    * cut engine-portable (no float support fraction). */
  def heavyHitters(
      tokens: DataFrame,
      tokenCol: String,
      denominator: Long,
      capacity: Int): DataFrame = {
    require(capacity >= denominator,
      s"capacity ($capacity) must be >= denominator ($denominator) for exactness")
    val total = tokens.count()
    val cands = candidateSummaries(tokens, tokenCol, capacity)
      .select(tokenCol).distinct()
    tokens
      .join(broadcast(cands), Seq(tokenCol), "left_semi")
      .groupBy(tokenCol)
      .agg(count(lit(1)).as("freq"))
      .where(col("freq") * lit(denominator) >= lit(total))
  }

  /** Whitespace token stream of a text column — the same tokenization as
    * [[TextOps.vocabulary]] (`regexp_split_to_array(trim(text), '\s+')`
    * on the DuckDB side). */
  def tokenStream(df: DataFrame, textCol: String): DataFrame =
    Parallelize.spread(df)
      .select(explode(split(trim(col(textCol)), "\\s+")).as("token"))
}
