package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  import ComparePack._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * full compare (null-safe outer join + fused stats pass) → per-column
    * stats table. */
  def entry(spark: SparkSession): DataFrame =
    statsDf(spark, compare(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = compareQueries ++ OpsPack.queries

  private def compareQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-column match/null/max-diff statistics (§2.4: fused single-pass agg).
    "q_compare_column_stats" -> ((s, dir) => statsDf(s, compare(s, dir))),
    // Same under abs_tol=0.01 (tolerance ladder, §2.11).
    "q_compare_column_stats_tol" -> ((s, dir) => statsDf(s, compare(s, dir, absTol = 0.01))),
    // rel_tol path: |a-b| <= rtol*|b| (numeric comparator's second rung).
    "q_compare_column_stats_rel" -> ((s, dir) => statsDf(s, compare(s, dir, relTol = 0.001))),
    // ignore_spaces + ignore_case string normalization (§2.2).
    "q_compare_stats_ignore" -> ((s, dir) => statsDf(s, compareIgnore(s, dir))),
    // custom comparator prepended to the pipeline (§2.10).
    "q_compare_custom_comparator" -> ((s, dir) => statsDf(s, compareCustom(s, dir))),
    // CSV source → compare → stats (§2.1 scan path).
    "q_source_csv" -> (csvCompareStats _),
    // one-pass per-column profiling (nulls + exact distincts).
    "q_profile_lineitem" -> ((s, dir) =>
      graft.operators.Profile.columnProfile(
        frameB(s, dir).select(liCols.map(col): _*)).orderBy("column")),
    // Merge slice counts from the null-safe full outer join (§2.3).
    "q_compare_merge_counts" -> { (s, dir) =>
      import s.implicits._
      val c = compare(s, dir)
      Seq((c.intersectCount, c.df1UnqCount, c.df2UnqCount))
        .toDF("both_cnt", "left_only_cnt", "right_only_cnt")
    },
    // Duplicate-key pairing via window rank (§2.5): join on l_orderkey only.
    "q_compare_dupe_counts" -> { (s, dir) =>
      import s.implicits._
      val c = compare(s, dir, keys = Seq("l_orderkey"), raw = true)
      Seq((c.intersectCount, c.df1UnqCount, c.df2UnqCount))
        .toDF("both_cnt", "left_only_cnt", "right_only_cnt")
    },
    // Unique-row slices with original columns restored (§2.2 projections).
    "q_compare_df1_unq_rows" -> ((s, dir) =>
      compare(s, dir).df1UnqRows.orderBy(keys2.map(col): _*)),
    "q_compare_df2_unq_rows" -> ((s, dir) =>
      compare(s, dir).df2UnqRows.orderBy(keys2.map(col): _*)),
    // All mismatching rows: keys + both versions (§2.6 / spark.py:793-867).
    "q_compare_all_mismatch" -> ((s, dir) =>
      compare(s, dir).allMismatch().orderBy(keys2.map(col): _*)),
    // Row-level CDC classification (insert/delete/update + changed columns)
    // from the same single full-outer join shape as the compare core.
    "q_compare_cdc" -> ((s, dir) =>
      graft.operators.Cdc.changes(frameA(s, dir), frameB(s, dir), keys2)
        .orderBy(keys2.map(col): _*)),
    // The report's numeric payload (shapes + summaries + column rollup) as
    // (metric, value) rows — the oracle-checkable twin of q_compare_report's
    // golden-pinned text render.
    "q_compare_report_stats" -> (reportStatsDf _),
    // Boolean predicate suite (§2.11).
    "q_compare_predicates" -> { (s, dir) =>
      import s.implicits._
      val c = compare(s, dir)
      Seq((c.allRowsOverlap, c.countMatchingRows, c.intersectRowsMatch,
        c.matches(), c.subset))
        .toDF("all_rows_overlap", "count_matching_rows", "intersect_rows_match",
          "matches", "subset")
    },
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q_compare_column_stats" -> OracleGen.columnStatsSql(keys2, 0.0),
    "q_compare_column_stats_tol" -> OracleGen.columnStatsSql(keys2, 0.01),
    "q_compare_column_stats_rel" -> OracleGen.columnStatsSql(keys2, 0.0, 0.001),
    "q_compare_stats_ignore" -> OracleGen.ignoreStatsSql(keys2),
    "q_compare_custom_comparator" -> OracleGen.customStatsSql(keys2),
    "q_source_csv" -> OracleGen.csvStatsSql,
    "q_profile_lineitem" -> OracleGen.profileSql,
    "q_compare_merge_counts" -> OracleGen.mergeCountsSql(keys2),
    "q_compare_dupe_counts" -> OracleGen.dupeCountsSql,
    "q_compare_df1_unq_rows" -> OracleGen.unqRowsSql(keys2, 1),
    "q_compare_df2_unq_rows" -> OracleGen.unqRowsSql(keys2, 2),
    "q_compare_all_mismatch" -> OracleGen.allMismatchSql(keys2, 0.0),
    "q_compare_cdc" -> OracleGen.cdcSql(keys2),
    "q_compare_report_stats" -> OracleGen.reportStatsSql(keys2),
    "q_compare_predicates" -> OracleGen.predicatesSql(keys2, 0.0),
  ) ++ OpsPack.oracleSql
}
