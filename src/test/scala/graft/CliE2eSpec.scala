package graft

import java.nio.file.{Files, Paths}

import graft.cli.Main

/** CLI end-to-end: real files in, exit codes and report artifacts out
  * (reference: tests/cli/test_compare.py matrix). Reuses the active test
  * session (Main only stops sessions it created). */
class CliE2eSpec extends SparkTestBase {

  private lazy val dir = {
    val d = Files.createDirectories(Paths.get("target/cli_e2e"))
    spark // force session so Main.getOrCreate attaches to it
    Files.writeString(d.resolve("left.csv"),
      "id,name,amount\n1,x,1.0\n2,y,2.0\n3,z,3.0\n")
    Files.writeString(d.resolve("right.csv"),
      "id,name,amount\n1,x,1.0\n2,Y,2.004\n4,w,4.0\n")
    Files.writeString(d.resolve("same.csv"),
      "id,name,amount\n1,x,1.0\n2,y,2.0\n3,z,3.0\n")
    d
  }

  private def run(args: String*): Int = Main.run(args.toSeq)

  test("exit 0 on match, 1 on mismatch") {
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/same.csv",
      "--on", "id", "--quiet", "--df2-name", "same2") == 0)
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet") == 1)
  }

  test("tolerance turns a value mismatch into a pass under threshold") {
    // amount differs by 0.004 (inside 0.01), name y vs Y differs (case)
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet", "--abs-tol", "0.01", "--ignore-case",
      "--max-unequal-rows", "0", "--ignore-unique-rows") == 0)
    // without ignore-case the name mismatch stays
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet", "--abs-tol", "0.01",
      "--max-unequal-rows", "0", "--ignore-unique-rows") == 1)
  }

  test("max-unequal-rows threshold counts unique rows unless ignored") {
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet", "--max-unequal-rows", "3") == 0)
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet", "--max-unequal-rows", "2") == 1)
  }

  test("per-column tolerance via COL=VALUE reaches the engine") {
    // amount-only tolerance passes the amount diff but not the name diff
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet", "--abs-tol", "amount=0.01", "--ignore-case",
      "--max-unequal-rows", "0", "--ignore-unique-rows") == 0)
    // tolerance keyed to a column that exists elsewhere (name) leaves the
    // amount mismatch in place
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet", "--abs-tol", "name=0.01", "--ignore-case",
      "--max-unequal-rows", "0", "--ignore-unique-rows") == 1)
    // typo'd tolerance key → usage error exit 2 path (IllegalArgumentException)
    assertThrows[IllegalArgumentException] {
      run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
        "--on", "id", "--quiet", "--abs-tol", "amont=0.01")
    }
  }

  test("probe-skip hints keep results identical on clean-keyed data") {
    // left/right have unique, null-free ids — the hints must not change
    // any outcome, only skip the probe scans
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/same.csv",
      "--on", "id", "--quiet", "--df2-name", "same2",
      "--assume-keys-unique", "--assume-keys-null-free") == 0)
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet",
      "--assume-keys-unique", "--assume-keys-null-free") == 1)
  }

  test("json report is written to --output") {
    val out = s"$dir/report.json"
    assert(run("--left", s"$dir/left.csv", "--right", s"$dir/right.csv",
      "--on", "id", "--quiet", "--report-format", "json", "--output", out) == 1)
    val json = Files.readString(Paths.get(out))
    assert(json.contains("\"common_rows\": 2"))
    assert(json.contains("\"has_mismatches\": true"))
  }
}
