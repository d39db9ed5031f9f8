package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance self-join (record linkage / fuzzy dedup) via PassJoin
  * segment blocking (Li, Deng, Feng — ICDE'11): recall-COMPLETE candidate
  * generation with equi-joins only, never a cross join.
  *
  * The pigeonhole lemma: partition a string `s` into `k+1` contiguous
  * segments; any `t` with `ed(s, t) ≤ k` contains at least one of them as
  * an exact substring (k edits can disturb at most k segments), shifted
  * from its home position by at most k. So:
  *
  *  - index side: each string contributes its `k+1` segments, keyed
  *    `(segment ordinal i, |s|, segment text)`;
  *  - probe side: each string `t` contributes, for every source-length
  *    hypothesis `L ∈ [|t|−k, |t|+k]` and ordinal `i`, its substrings of
  *    the segment's length at every start within ±k of the segment's home
  *    position — ≤ `(k+1)(2k+1)²` probes (18 at k=1, 75 at k=2), deduped
  *    before the join;
  *  - the equi-join of the two on `(i, L, segment)` yields every true
  *    pair at least once; `levenshtein ≤ k` then verifies candidates
  *    exactly. The verification never sees a pair that shares no segment
  *    — on realistic dictionaries that is almost all of the n² space.
  *
  * Scale shape: explode factors are small constants; the join is a plain
  * shuffled equi-join on selective segment keys; `levenshtein` (codegen'd)
  * runs only on the candidate set. Strings are NOT carried through the
  * exploded frames — candidates travel as id pairs and the two verify
  * strings join back afterwards (broadcast when the dictionary is small).
  *
  * Low-entropy inputs deserve one design note: a segment shared by many
  * strings (a constant template prefix, a run of padding zeros) is a heavy
  * block, and its candidates are genuinely quadratic IN THAT BLOCK — no
  * complete filter can drop them, because such strings really are close.
  * The production recipe is the one q_fuzzy_join demonstrates: collapse to
  * the DISTINCT-value dictionary first (fuzzy similarity is a function of
  * the value, not the row), fuzzy-join the dictionary, then map class
  * sizes/rows back — at 100 TB the dictionary is orders of magnitude
  * smaller than the table, and exact duplicates never reach the matcher.
  */
object FuzzyJoin {

  /** All `(id1, id2, dist)` pairs with `levenshtein ≤ k`, `id1 < id2`.
    * `idCol` may equal `strCol` (dictionary self-join on the value). */
  def selfJoin(names: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1 (k = 0 is exact dedup — use groupBy)")
    val kp1 = k + 1
    val base = names.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).cast("int").as("len"))

    // segment ordinal i of a length-L string spans
    // [i·L div (k+1), (i+1)·L div (k+1)) — the even partition both sides
    // must agree on (nonneg operands, so DIV is floor division)
    def startOf(l: String) = expr(s"CAST(i * $l DIV $kp1 AS INT)")
    def slenOf(l: String) = expr(s"CAST((i + 1) * $l DIV $kp1 AS INT) - start")

    val index = base
      .select(col("id"), col("s"), col("len"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("start", startOf("len"))
      .withColumn("slen", slenOf("len"))
      .select(col("id").as("id_l"), col("i"), col("len").as("L"),
        expr("substring(s, start + 1, slen)").as("seg"))

    val probe = base
      .select(col("id"), col("s"), col("len").as("lt"),
        explode(sequence(greatest(col("len") - k, lit(1)), col("len") + k)).as("L"))
      .select(col("id"), col("s"), col("lt"), col("L"),
        explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("start", startOf("L"))
      .withColumn("slen", slenOf("L"))
      .select(col("id"), col("lt"), col("i"), col("L"), col("slen"), col("s"),
        explode(sequence(col("start") - k, col("start") + k)).as("pos"))
      .where(col("pos") >= 0 && col("pos") + col("slen") <= col("lt"))
      .select(col("id").as("id_r"), col("i"), col("L"),
        expr("substring(s, pos + 1, slen)").as("seg"))
      .distinct()

    val cand = index.join(probe, Seq("i", "L", "seg"))
      .where(col("id_l") =!= col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("id1"),
        greatest(col("id_l"), col("id_r")).as("id2"))
      .distinct()

    cand
      .join(base.select(col("id").as("id1"), col("s").as("s1")), Seq("id1"))
      .join(base.select(col("id").as("id2"), col("s").as("s2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        levenshtein(col("s1"), col("s2")).as("dist"))
      .where(col("dist") <= k)
  }

  /** Dictionary-first linkage over a table column: distinct values +
    * class sizes, fuzzy pairs among the values, sizes mapped back —
    * `(name1, name2, dist, n1, n2)`. */
  def linkValues(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val dict = df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("n"))
    selfJoin(dict, "v", "v", k)
      .join(dict.select(col("v").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(dict.select(col("v").as("id2"), col("n").as("n2")), Seq("id2"))
      .select(col("id1").as("name1"), col("id2").as("name2"),
        col("dist"), col("n1"), col("n2"))
  }
}
