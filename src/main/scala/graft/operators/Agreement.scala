package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inter-classifier agreement — the QA pass a labeling pipeline runs when
  * two annotators (a model vs gold metadata, two model versions, heuristic
  * vs learned) label the same corpus: the confusion matrix plus Cohen's
  * kappa, chance-corrected agreement.
  *
  * Kappa is computed as ONE exact rational: with N rows, A = Σ diagonal
  * (observed agreement) and E = Σ_label row_total·col_total (chance
  * agreement numerator over N²),
  *
  *   κ = (p_o − p_e) / (1 − p_e) = (N·A − E) / (N² − E)
  *
  * — numerator and denominator are exact DECIMAL products of BIGINT
  * counts, so the only float op is the final double division, making the
  * statistic bit-identical across engines. Widths hold to N ≈ 10¹²
  * (N² fills DECIMAL(26)).
  *
  * Scale shape: ONE O(data) aggregation (the cell count, map-side
  * combined, shuffle bytes ∝ label-pair cardinality). Everything after
  * runs on label-cardinality frames: the marginals come from a melted
  * union of the cell table, the corpus totals and E ride
  * constant-partition windows over those tiny frames (single-partition
  * windows over ≤ C rows are free, and they keep the plan free of 1-row
  * cross joins — the BroadcastNestedLoopJoin shape the driver-suite plan
  * pin bans), and the matrix re-attaches marginals with label-keyed
  * equi-joins. */
object Agreement {

  /** Confusion matrix of `aCol` (gold / annotator 1) vs `bCol`
    * (predicted / annotator 2), each row carrying the marginals and the
    * corpus-level kappa: (a, b, n, row_total, col_total, n_total,
    * n_agree, kappa). */
  def confusionWithKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // NOT cached: the cell count's aggregation exchange is reused across
    // the melted-marginal branches and the totals frame within the one
    // action, so the O(data) pass (and the caller's label projection)
    // runs once anyway; an explicit cache measured no better (r16 A/B)
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    // non-foldable constant keys (counts are ≥ 0) — a literal would be
    // stripped and WindowExec would warn; see Windows.constantPartition
    val one = Windows.constantPartition(col("n"))
    val oneMarg = Windows.constantPartition(col("row_total"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(13,0)")
    // melted marginals: one row per label with both margin totals, plus
    // the chance-agreement numerator E as a constant-window column
    val marg = cells.select(col("a").as("label"), col("n"), lit(1).as("is_row"))
      .unionByName(cells.select(col("b").as("label"), col("n"), lit(0).as("is_row")))
      .groupBy("label")
      .agg(
        coalesce(sum(when(col("is_row") === 1, col("n"))), lit(0L)).as("row_total"),
        coalesce(sum(when(col("is_row") === 0, col("n"))), lit(0L)).as("col_total"))
      .withColumn("e_num",
        sum(dec(col("row_total")) * dec(col("col_total"))).over(oneMarg))
    val withTotals = cells
      .withColumn("n_total", sum(col("n")).over(one))
      .withColumn("n_agree",
        sum(when(col("a") === col("b"), col("n")).otherwise(lit(0L))).over(one))
    withTotals
      .join(marg.select(col("label").as("a"), col("row_total"), col("e_num")), "a")
      .join(marg.select(col("label").as("b"), col("col_total")), "b")
      .withColumn("kappa_num", dec(col("n_total")) * dec(col("n_agree")) - col("e_num"))
      .withColumn("kappa_den", dec(col("n_total")) * dec(col("n_total")) - col("e_num"))
      .withColumn("kappa",
        when(col("kappa_den") =!= 0,
          col("kappa_num").cast("double") / col("kappa_den").cast("double"))
          .otherwise(lit(1.0))) // degenerate: all mass on one cell pair
      .select(col("a"), col("b"), col("n"), col("row_total"), col("col_total"),
        col("n_total"), col("n_agree"), col("kappa"))
  }
}
