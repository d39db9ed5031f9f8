package graft

import java.nio.file.{Files, Paths}

import graft.operators._

/** Golden-snapshot report test (reference style: tests/test_report_snapshots
  * .py) — regenerate with GRAFT_REGEN_SNAPSHOTS=1. Frames are single
  * partition + ordered so sample sections are deterministic. */
class ReportGoldenSpec extends SparkTestBase {
  import spark.implicits._

  private val goldenPath = Paths.get("src/test/resources/golden_report.txt")

  private def buildReport: String = {
    val a = Seq(
      (1, "alpha", 10.0), (2, "beta", 20.0), (3, "gamma", 30.0), (5, "eps", 50.0)
    ).toDF("id", "s", "v").coalesce(1).orderBy("id")
    val b = Seq(
      (1, "alpha", 10.0), (2, "BETA", 20.5), (4, "delta", 40.0)
    ).toDF("id", "s", "v").coalesce(1).orderBy("id")
    new SparkCompare(spark, a, b,
      CompareConfig(joinColumns = Seq("id"), absTol = ToleranceSpec.of(0.1)))
      .report()
  }

  test("report text matches the golden snapshot byte-for-byte") {
    val got = buildReport
    if (sys.env.get("GRAFT_REGEN_SNAPSHOTS").contains("1") || !Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath, got)
      info(s"snapshot written to $goldenPath")
    }
    val expected = Files.readString(goldenPath)
    assert(got == expected,
      "report drifted from golden snapshot; regen with GRAFT_REGEN_SNAPSHOTS=1 if intended")
  }
}
