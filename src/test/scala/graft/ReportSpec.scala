package graft

import graft.report.TemplateReport

import graft.operators._
import graft.report.TextTable

/** Report rendering checks (reference: tests/test_report.py, test_base.py). */
class ReportSpec extends SparkTestBase {
  import spark.implicits._

  private def sampleCompare: SparkCompare = {
    val a = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (5, "e", 50.0))
      .toDF("id", "s", "v")
    val b = Seq((1, "a", 10.0), (2, "B", 20.5), (4, "d", 40.0)).toDF("id", "s", "v")
    new SparkCompare(spark, a, b, CompareConfig(joinColumns = Seq("id")))
  }

  test("fixed_width_table matches reference layout") {
    val t = TextTable.fixedWidthTable(Seq("Name", "N"), Seq(Seq("ab", 1), Seq("cdefg", 22)), "lr")
    assert(t ==
      """Name    N
        |-----  --
        |ab      1
        |cdefg  22""".stripMargin)
  }

  test("fixed_width_table rejects ragged rows") {
    assertThrows[IllegalArgumentException] {
      TextTable.fixedWidthTable(Seq("a", "b"), Seq(Seq(1)))
    }
  }

  test("commas groups thousands like Python {:,}") {
    assert(TextTable.commas(0) == "0")
    assert(TextTable.commas(999) == "999")
    assert(TextTable.commas(1234567) == "1,234,567")
    assert(TextTable.commas(-1234) == "-1,234")
  }

  test("report text contains all template sections and counts") {
    val r = sampleCompare.report()
    assert(r.startsWith("DataComPy Comparison"))
    for (sec <- Seq("DataFrame Summary", "Column Summary", "Row Summary",
        "Column Comparison", "Columns with Unequal Values or Types",
        "Sample Rows with Unequal Values", "Sample Rows Only in df1",
        "Sample Rows Only in df2"))
      assert(r.contains(sec), s"missing section: $sec")
    assert(r.contains("Number of rows in common: 2"))
    assert(r.contains("Number of rows in df1 but not in df2: 2"))
    assert(r.contains("Number of rows in df2 but not in df1: 1"))
    assert(r.contains("Number of rows with some compared columns unequal: 1"))
    assert(r.contains("Number of rows with all compared columns equal: 1"))
    assert(r.contains("Number of columns compared with some values unequal: 2"))
    assert(r.contains("Matched on: id"))
    assert(r.contains("Any duplicates on match values: No"))
  }

  test("matching frames produce a report without mismatch sections") {
    val a = Seq((1, "x")).toDF("id", "s")
    val c = new SparkCompare(spark, a, a, CompareConfig(joinColumns = Seq("id")))
    val r = c.report()
    assert(!r.contains("Columns with Unequal Values or Types"))
    assert(!r.contains("Sample Rows Only in"))
    assert(r.contains("Number of rows with all compared columns equal: 1"))
  }

  test("html report wraps text in pre") {
    val h = sampleCompare.buildReportData().toHtml
    assert(h.startsWith("<html>") && h.contains("<pre>DataComPy Comparison"))
  }

  test("json report is valid and carries the counts") {
    val j = sampleCompare.buildReportData().toJson
    assert(j.contains("\"common_rows\": 2"))
    assert(j.contains("\"unequal_values\": 2"))
    assert(j.contains("\"has_mismatches\": true"))
    // quick structural sanity: balanced braces
    assert(j.count(_ == '{') == j.count(_ == '}'))
  }

  test("max_diff appears with 4-decimal formatting") {
    val r = sampleCompare.report()
    assert(r.contains("0.5000")) // v: 20.0 vs 20.5
  }

  test("custom template: substitution, if, for over the report context") {
    val data = sampleCompare.buildReportData()
    val tpl =
      """Compared {{ df1_name }} vs {{ df2_name }}
        |Common rows: {{ row_summary.common_rows }}
        |{% if mismatch_stats.has_mismatches %}MISMATCHES:
        |{% for s in mismatch_stats.stats %}- {{ s.column }} ({{ s.unequal_cnt }} unequal)
        |{% endfor %}{% endif %}
        |{% if row_summary.has_duplicates %}never shown{% endif %}
        |Unknown: [{{ no.such.path }}]""".stripMargin
    val out = TemplateReport.render(tpl, TemplateReport.context(data))
    assert(out.contains("Compared df1 vs df2"))
    assert(out.contains("Common rows: 2"))
    assert(out.contains("MISMATCHES:"))
    assert(out.contains("- s (1 unequal)") || out.contains("- v (1 unequal)"))
    assert(!out.contains("never shown"))
    assert(out.contains("Unknown: []")) // undefined paths render empty
    // file-based path through report()
    val f = java.nio.file.Files.createTempFile("graft_tpl", ".tpl")
    java.nio.file.Files.writeString(f, "rows={{ row_summary.common_rows }}")
    assert(sampleCompare.report(templatePath = Some(f.toString)) == "rows=2")
  }

  test("custom template: unclosed block is rejected") {
    assertThrows[IllegalArgumentException] {
      TemplateReport.render("{% if x %}no end", Map("x" -> true))
    }
  }

  test("custom template: nested blocks and same-tag nesting resolve") {
    val ctx = Map[String, Any](
      "flag" -> true, "xs" -> Seq("a", "b"),
      "inner" -> Map[String, Any]("ys" -> Seq("1", "2")))
    val nested = TemplateReport.render(
      "{% if flag %}[{% for x in xs %}{{ x }}{% for y in inner.ys %}{{ y }}{% endfor %}{% endfor %}]{% endif %}",
      ctx)
    assert(nested == "[a12b12]")
    // if nested inside if, with a false inner
    val ifs = TemplateReport.render(
      "{% if flag %}A{% if missing %}B{% endif %}C{% endif %}", ctx)
    assert(ifs == "AC")
  }
}
