package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Alignment-data and model-eval primitives: preference-pair mining (the
  * DPO/RLHF dataset construction step), group-relative advantage
  * normalization (the GRPO reward transform), and pairwise win matrices
  * (the aggregation behind Elo/Bradley–Terry model ranking). All three are
  * pure relational plans — one shuffle on the grouping key plus windows
  * that reuse its clustering — and all three follow the repo's
  * integer-exact convention: float math happens only in fixed expression
  * order on exactly-aggregated integers, which is what makes the driver
  * queries DuckDB-hash-checkable (scale fractional scores to integers
  * upstream, as the multimodal luma/amplitude pipelines already do). */
object Preference {

  /** DPO-style preference pairs from scored responses: per prompt, rank
    * responses by (score DESC, id ASC) and pair the i-th BEST with the
    * i-th WORST for i = 1..maxPairs, keeping a pair only when the two
    * ranks do not cross (2i ≤ n — each response appears in at most one
    * pair, on one side) and the score gap clears `margin` (pairs too close
    * to call teach nothing; a NULL score never clears any margin, so
    * unscored responses drop out here). Output: (promptCol, pair_rank,
    * chosen_id, chosen_score, rejected_id, rejected_score, gap).
    *
    * Scale shape: ONE shuffle on the prompt key; the best/worst ranks come
    * from a single window (the worst rank is `n + 1 - rank` — the bottom
    * ordering is the exact reverse of the top ordering, tiebreaks
    * included, so no second sort); the chosen↔rejected join runs on the
    * ≤ maxPairs selected rows per prompt PER SIDE, not the corpus. */
  def preferencePairs(df: DataFrame, promptCol: String, idCol: String,
      scoreCol: String, margin: Double, maxPairs: Int = 1): DataFrame = {
    require(maxPairs >= 1, s"maxPairs must be positive, got $maxPairs")
    require(margin >= 0 && !margin.isNaN, s"margin must be >= 0, got $margin")
    val wTop = Window.partitionBy(col(promptCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    val wAll = Window.partitionBy(col(promptCol))
    val ranked = df.select(col(promptCol), col(idCol), col(scoreCol))
      .withColumn("__graft_rt", row_number().over(wTop))
      .withColumn("__graft_n", count(col(idCol)).over(wAll))
    val chosen = ranked
      .where(col("__graft_rt") <= maxPairs &&
        col("__graft_rt") * 2 <= col("__graft_n"))
      .select(col(promptCol), col("__graft_rt").as("pair_rank"),
        col(idCol).as("chosen_id"), col(scoreCol).as("chosen_score"))
    val rejected = ranked
      .withColumn("__graft_rb",
        col("__graft_n") + 1 - col("__graft_rt"))
      .where(col("__graft_rb") <= maxPairs &&
        col("__graft_rb") * 2 <= col("__graft_n"))
      .select(col(promptCol), col("__graft_rb").as("pair_rank"),
        col(idCol).as("rejected_id"), col(scoreCol).as("rejected_score"))
    chosen.join(rejected, Seq(promptCol, "pair_rank"))
      .withColumn("gap",
        col("chosen_score").cast("double") -
          col("rejected_score").cast("double"))
      .where(col("gap") >= lit(margin))
  }

  /** GRPO-style group-relative advantage: `(v − mean_g) / std_g` with the
    * POPULATION std of the row's group (std 0 — a constant group, or a
    * singleton — yields advantage 0.0 rather than NaN; a NULL value gets a
    * NULL advantage and is excluded from the group's moments).
    *
    * Integer-exact contract: values aggregate as LONGs (sum and sum of
    * squares are exact; |v| must stay ≤ ~3e9 at a billion rows per group
    * to keep Σv² inside a long — integer-scale scores accordingly), and
    * every float op after that is one fixed-order expression
    * (`ss/n − mean·mean`, clamped at 0 before the sqrt), so two runs — or
    * two engines — agree bit-for-bit. Scale shape: one shuffle on the
    * group key, one window (no second pass; the moments ride the same
    * clustering). Output: input columns + group_mean, group_std,
    * advantage. */
  def groupAdvantage(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    Seq("group_mean", "group_std", "advantage").foreach(c =>
      require(!df.columns.exists(_.equalsIgnoreCase(c)),
        s"input already has a '$c' column — drop or rename it before " +
          "advantage normalization (the name is this operator's output)"))
    val v = col(valueCol).cast("long")
    val w = Window.partitionBy(col(groupCol))
    val mean = col("__graft_s").cast("double") / col("__graft_n")
    df.withColumn("__graft_n", count(v).over(w))
      .withColumn("__graft_s", sum(v).over(w))
      .withColumn("__graft_ss", sum(v * v).over(w))
      .withColumn("group_mean", mean)
      .withColumn("group_std",
        sqrt(greatest(
          col("__graft_ss").cast("double") / col("__graft_n") -
            col("group_mean") * col("group_mean"),
          lit(0.0))))
      .withColumn("advantage",
        when(v.isNull, lit(null).cast("double"))
          .when(col("group_std") > 0,
            (v.cast("double") - col("group_mean")) / col("group_std"))
          .otherwise(lit(0.0)))
      .drop("__graft_n", "__graft_s", "__graft_ss")
  }

  /** Bradley–Terry model strengths from the pairwise [[winMatrix]] — the
    * ranking step of an eval pipeline ("strength 0.29 vs 0.22 across all
    * pairings", transitive where raw win rates are not): `iters` rounds of
    * the standard MM update `s_i ← W_i / Σ_j n_ij/(s_i+s_j)` (ties count
    * half a win to each side), normalized to sum 1 each round. Models with
    * no decided-or-tied comparison at all are dropped (an unplayed model
    * has no likelihood to maximize). Output: (model, strength, wins,
    * games), one row per surviving model.
    *
    * Determinism contract: the matrix itself is integer-exact; the
    * iteration runs DRIVER-SIDE over the collected models² matrix (bounded
    * by `maxModels`, default 2048 — eval tables rank tens of models, not
    * corpora) with every float fold in sorted-opponent order, so two runs
    * — or an engine mirroring the same fold order — agree bit-for-bit
    * (the driver query's DuckDB oracle replays the iterations with
    * list-ordered sums and matches the strengths exactly). Scale shape:
    * one [[winMatrix]] job; the driver loop is O(iters · models²). */
  def bradleyTerry(df: DataFrame, promptCol: String, modelCol: String,
      scoreCol: String, iters: Int = 8, maxModels: Int = 2048): DataFrame =
    bradleyTerryFromMatrix(winMatrix(df, promptCol, modelCol, scoreCol),
      iters, maxModels)

  /** [[bradleyTerry]] over an ALREADY-BUILT win matrix — the entry point
    * for matrices maintained incrementally
    * ([[graft.streaming.IngestEval.strengths]] probes its persisted
    * deltas straight into this). Expects [[winMatrix]]'s column contract
    * (model_a, model_b, wins_a, wins_b, ties, n); model ids normalize to
    * strings for the driver-side fold. */
  def bradleyTerryFromMatrix(matrixDf: DataFrame, iters: Int = 8,
      maxModels: Int = 2048): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    val spark = matrixDf.sparkSession
    import spark.implicits._
    val matrix = matrixDf
      .select(col("model_a").cast("string"), col("model_b").cast("string"),
        col("wins_a"), col("wins_b"), col("ties"), col("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val all = (matrix.map(_._1) ++ matrix.map(_._2)).distinct.sorted.toSeq
    require(all.size <= maxModels,
      s"${all.size} models exceed maxModels=$maxModels — the MM iteration " +
        "collects the models² win matrix to the driver; raise the bound " +
        "only if models² stays driver-sized")
    val n = scala.collection.mutable.Map.empty[(String, String), Long]
    val halfWins = scala.collection.mutable.Map.empty[(String, String), Double]
    matrix.foreach { case (a, b, wa, wb, t, cmp) =>
      n((a, b)) = cmp; n((b, a)) = cmp
      halfWins((a, b)) = wa + 0.5 * t
      halfWins((b, a)) = wb + 0.5 * t
    }
    def opponents(i: String): Seq[String] =
      all.filter(j => j != i && n.contains((i, j)))
    // models with zero decided-or-tied games have no likelihood to fit
    val models = all.filter(i => opponents(i).exists(j => n((i, j)) > 0))
    if (models.isEmpty)
      return Seq.empty[(String, Double, Double, Long)]
        .toDF("model", "strength", "wins", "games")
    // every fold below runs in sorted-opponent order — the determinism
    // contract the oracle mirrors with list(x ORDER BY j) sums
    val wins = models.map(i =>
      i -> opponents(i).foldLeft(0.0)((acc, j) => acc + halfWins((i, j)))).toMap
    val games = models.map(i =>
      i -> opponents(i).foldLeft(0L)((acc, j) => acc + n((i, j)))).toMap
    var s = models.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val raw = models.map { i =>
        val denom = opponents(i).filter(j => n((i, j)) > 0)
          .foldLeft(0.0)((acc, j) => acc + n((i, j)).toDouble / (s(i) + s(j)))
        i -> wins(i) / denom
      }.toMap
      val tot = models.foldLeft(0.0)((acc, i) => acc + raw(i))
      s = models.map(i => i -> raw(i) / tot).toMap
    }
    models.map(i => (i, s(i), wins(i), games(i)))
      .toDF("model", "strength", "wins", "games")
  }

  /** Pairwise win matrix over scored model responses — the sufficient
    * statistic behind Elo/Bradley–Terry rankings and the standard eval
    * report ("A beats B on 62% of prompts"): for every unordered model
    * pair (a < b by name) and every prompt BOTH answered, each (response
    * of a, response of b) comparison counts one win, loss, or tie;
    * comparisons with a NULL score on either side are skipped entirely
    * (n counts only decided-or-tied comparisons). `win_rate_a` is the
    * decided-comparison fraction `wins_a / (wins_a + wins_b)` (NULL when
    * everything tied). Output: (model_a, model_b, wins_a, wins_b, ties,
    * n, win_rate_a).
    *
    * Scale shape: the self-join shuffles both sides on the PROMPT key
    * once; per-prompt fan-out is (responses per prompt)² bounded by
    * models × responses-per-model-per-prompt — eval tables are
    * models×prompts-sized, not corpus-sized. The pair aggregate is
    * models² rows. */
  def winMatrix(df: DataFrame, promptCol: String, modelCol: String,
      scoreCol: String): DataFrame = {
    val a = df.select(col(promptCol).as("__graft_p"),
      col(modelCol).as("model_a"), col(scoreCol).cast("double").as("__graft_sa"))
    val b = df.select(col(promptCol).as("__graft_p"),
      col(modelCol).as("model_b"), col(scoreCol).cast("double").as("__graft_sb"))
    val decidedOrTied =
      col("__graft_sa").isNotNull && col("__graft_sb").isNotNull
    a.join(b, Seq("__graft_p")).where(col("model_a") < col("model_b"))
      .groupBy(col("model_a"), col("model_b"))
      .agg(
        count(when(col("__graft_sa") > col("__graft_sb"), 1)).as("wins_a"),
        count(when(col("__graft_sb") > col("__graft_sa"), 1)).as("wins_b"),
        count(when(decidedOrTied &&
          col("__graft_sa") === col("__graft_sb"), 1)).as("ties"),
        count(when(decidedOrTied, 1)).as("n"))
      .transform(withWinRate)
  }

  /** The ONE `win_rate_a` definition — decided-comparison fraction, NULL
    * when everything tied — shared by [[winMatrix]] and the streaming
    * probe ([[graft.streaming.IngestEval.probe]]) so the two can never
    * desynchronize. Expects wins_a/wins_b count columns. */
  def withWinRate(matrix: DataFrame): DataFrame =
    matrix.withColumn("win_rate_a",
      when(col("wins_a") + col("wins_b") > 0,
        col("wins_a").cast("double") / (col("wins_a") + col("wins_b"))))
}
