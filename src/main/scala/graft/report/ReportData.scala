package graft.report

/** Immutable report data model (reference: datacompy/report.py:50-331). */
final case class ColumnSummary(
    commonColumns: Int,
    df1Unique: Int,
    df1UniqueColumns: Seq[String],
    df2Unique: Int,
    df2UniqueColumns: Seq[String],
    df1Name: String,
    df2Name: String)

final case class RowSummary(
    matchColumns: Seq[String],
    hasDuplicates: Boolean,
    absTol: String,
    relTol: String,
    commonRows: Long,
    df1Unique: Long,
    df2Unique: Long,
    unequalRows: Long,
    equalRows: Long,
    df1Name: String,
    df2Name: String)

final case class ColumnComparison(
    unequalColumns: Int,
    equalColumns: Int,
    unequalValues: Long)

final case class MismatchStat(
    column: String,
    dtype1: String,
    dtype2: String,
    unequalCnt: Long,
    maxDiff: Double,
    nullDiff: Long,
    relTol: Double,
    absTol: Double)

final case class MismatchStats(
    hasMismatches: Boolean,
    hasSamples: Boolean,
    stats: Seq[MismatchStat] = Nil,
    samples: Seq[String] = Nil,
    df1Name: String = "df1",
    df2Name: String = "df2")

final case class UniqueRowsData(hasRows: Boolean, rows: String = "")

final case class ReportData(
    df1Name: String,
    df2Name: String,
    df1Shape: (Long, Int),
    df2Shape: (Long, Int),
    columnCount: Int,
    columnSummary: ColumnSummary,
    rowSummary: RowSummary,
    columnComparison: ColumnComparison,
    mismatchStats: MismatchStats,
    df1UniqueRows: UniqueRowsData,
    df2UniqueRows: UniqueRowsData) {

  def render: String = TextReport.render(this)

  /** Render with a custom template file (reference: base.py:405-443,
    * `template_path` — Jinja2 there, the [[TemplateReport]] mini-language
    * here, over the same context variables as `toJson`). */
  def render(templatePath: Option[String]): String =
    templatePath.fold(render)(TemplateReport.renderFile(this, _))

  /** Reference: report.py:279-297 / base.py:674-690. */
  def toHtml: String = ReportData.wrapHtml(render)

  def save(path: String): Unit = ReportData.saveHtml(render, path)

  /** JSON mirror of the reference's `to_dict` (report.py:313-322);
    * hand-rolled encoder, no dependencies. */
  def toJson: String = Json.obj(
    "df1_name" -> Json.str(df1Name),
    "df2_name" -> Json.str(df2Name),
    "df1_shape" -> Json.arr(Json.num(df1Shape._1), Json.num(df1Shape._2)),
    "df2_shape" -> Json.arr(Json.num(df2Shape._1), Json.num(df2Shape._2)),
    "column_count" -> Json.num(columnCount),
    "column_summary" -> Json.obj(
      "common_columns" -> Json.num(columnSummary.commonColumns),
      "df1_unique" -> Json.num(columnSummary.df1Unique),
      "df1_unique_columns" -> Json.arr(columnSummary.df1UniqueColumns.map(Json.str): _*),
      "df2_unique" -> Json.num(columnSummary.df2Unique),
      "df2_unique_columns" -> Json.arr(columnSummary.df2UniqueColumns.map(Json.str): _*),
      "df1_name" -> Json.str(columnSummary.df1Name),
      "df2_name" -> Json.str(columnSummary.df2Name)),
    "row_summary" -> Json.obj(
      "match_columns" -> Json.arr(rowSummary.matchColumns.map(Json.str): _*),
      "has_duplicates" -> Json.bool(rowSummary.hasDuplicates),
      "abs_tol" -> Json.raw(rowSummary.absTol),
      "rel_tol" -> Json.raw(rowSummary.relTol),
      "common_rows" -> Json.num(rowSummary.commonRows),
      "df1_unique" -> Json.num(rowSummary.df1Unique),
      "df2_unique" -> Json.num(rowSummary.df2Unique),
      "unequal_rows" -> Json.num(rowSummary.unequalRows),
      "equal_rows" -> Json.num(rowSummary.equalRows),
      "df1_name" -> Json.str(rowSummary.df1Name),
      "df2_name" -> Json.str(rowSummary.df2Name)),
    "column_comparison" -> Json.obj(
      "unequal_columns" -> Json.num(columnComparison.unequalColumns),
      "equal_columns" -> Json.num(columnComparison.equalColumns),
      "unequal_values" -> Json.num(columnComparison.unequalValues)),
    "mismatch_stats" -> Json.obj(
      "has_mismatches" -> Json.bool(mismatchStats.hasMismatches),
      "has_samples" -> Json.bool(mismatchStats.hasSamples),
      "stats" -> Json.arr(mismatchStats.stats.map(s => Json.obj(
        "column" -> Json.str(s.column),
        "dtype1" -> Json.str(s.dtype1),
        "dtype2" -> Json.str(s.dtype2),
        "unequal_cnt" -> Json.num(s.unequalCnt),
        "max_diff" -> Json.num(s.maxDiff),
        "null_diff" -> Json.num(s.nullDiff),
        "rel_tol" -> Json.num(s.relTol),
        "abs_tol" -> Json.num(s.absTol))): _*),
      "samples" -> Json.arr(mismatchStats.samples.map(Json.str): _*),
      "df1_name" -> Json.str(mismatchStats.df1Name),
      "df2_name" -> Json.str(mismatchStats.df2Name)),
    "df1_unique_rows" -> Json.obj(
      "has_rows" -> Json.bool(df1UniqueRows.hasRows),
      "rows" -> Json.str(df1UniqueRows.rows)),
    "df2_unique_rows" -> Json.obj(
      "has_rows" -> Json.bool(df2UniqueRows.hasRows),
      "rows" -> Json.str(df2UniqueRows.rows)))

  override def toString: String = render
}

object ReportData {
  private[report] def wrapHtml(text: String): String =
    s"<html><head><title>DataComPy Report</title></head><body><pre>$text</pre></body></html>"

  /** Save arbitrary rendered report text as the `<pre>`-wrapped HTML form
    * (reference: base.py:674-690 saves whatever text `report()` produced,
    * including custom-template renders). */
  def saveHtml(text: String, path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, wrapHtml(text))
  }
}

/** Minimal dependency-free JSON emitter. */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
  def num(n: Long): String = n.toString
  def num(n: Int): String = n.toString
  def num(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else if (d == math.rint(d) && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString
  def bool(b: Boolean): String = b.toString
  def raw(s: String): String = {
    // numbers pass through; anything else becomes a string
    if (s.matches("-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?")) s else str(s)
  }
  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")
  def arr(items: String*): String = items.mkString("[", ", ", "]")
}
