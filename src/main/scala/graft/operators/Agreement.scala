package graft.operators

import org.apache.spark.sql.DataFrame
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
  * (N² fills DECIMAL(25)); the labels tables are label-cardinality-sized.
  *
  * Scale shape: ONE O(data) aggregation (the cell count, map-side
  * combined, shuffle bytes ∝ label-pair cardinality); everything after
  * runs on the tiny cell table, and the summary broadcasts back onto the
  * matrix rows. */
object Agreement {

  /** Confusion matrix of `aCol` (gold / annotator 1) vs `bCol`
    * (predicted / annotator 2), each row carrying the marginals and the
    * corpus-level kappa: (a, b, n, row_total, col_total, n_total,
    * n_agree, kappa). */
  def confusionWithKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy("a").agg(sum(col("n")).as("row_total"))
    val cols = cells.groupBy("b").agg(sum(col("n")).as("col_total"))
    // chance-agreement numerator: Σ over labels of row_total · col_total
    // (absent marginals are zero and contribute nothing — inner join)
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(13,0)")
    val e = rows.join(cols, col("a") === col("b"))
      .agg(coalesce(sum(dec(col("row_total")) * dec(col("col_total"))),
        lit(0).cast("decimal(27,0)")).as("e_num"))
    val tot = cells.agg(
      sum(col("n")).as("n_total"),
      sum(when(col("a") === col("b"), col("n")).otherwise(lit(0L))).as("n_agree"))
    val summary = tot.crossJoin(e)
      .withColumn("kappa_num",
        dec(col("n_total")) * dec(col("n_agree")) - col("e_num"))
      .withColumn("kappa_den",
        dec(col("n_total")) * dec(col("n_total")) - col("e_num"))
      .withColumn("kappa",
        when(col("kappa_den") =!= 0,
          col("kappa_num").cast("double") / col("kappa_den").cast("double"))
          .otherwise(lit(1.0))) // degenerate: all mass on one cell pair
      .select("n_total", "n_agree", "kappa")
    cells
      .join(rows, "a").join(cols, "b")
      .crossJoin(broadcast(summary))
      .select(col("a"), col("b"), col("n"), col("row_total"), col("col_total"),
        col("n_total"), col("n_agree"), col("kappa"))
  }
}
