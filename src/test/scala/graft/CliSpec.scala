package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cli.Main
import graft.cli.Main.BadArgsException
import graft.sources.Readers

/** CLI parsing rules (reference: tests/cli/test_parser.py scenarios). */
class CliSpec extends AnyFunSuite {

  private def parse(args: String*) = Main.parse(args.toSeq)

  test("minimal args parse with defaults") {
    val a = parse("--left", "l.csv", "--right", "r.csv", "--on", "id")
    assert(a.on == Seq("id"))
    assert(a.sampleCount == 10 && a.columnCount == 10)
    assert(a.reportFormat == "text")
    assert(a.castColumnNamesLower && a.cacheIntermediates)
  }

  test("--on is repeatable and comma-splits") {
    val a = parse("--left", "l", "--right", "r", "--on", "a,b", "--on", "c")
    assert(a.on == Seq("a", "b", "c"))
  }

  test("tolerances: bare number or per-column with default key") {
    val a = parse("--left", "l", "--right", "r", "--on", "id", "--abs-tol", "0.5")
    assert(a.absTol.forColumn("x") == 0.5)
    val b = parse("--left", "l", "--right", "r", "--on", "id",
      "--rel-tol", "x=0.1", "--rel-tol", "default=0.01")
    assert(b.relTol.forColumn("x") == 0.1)
    assert(b.relTol.forColumn("other") == 0.01)
    assertThrows[BadArgsException] {
      parse("--left", "l", "--right", "r", "--on", "id",
        "--abs-tol", "0.5", "--abs-tol", "x=1")
    }
    assertThrows[BadArgsException] {
      parse("--left", "l", "--right", "r", "--on", "id", "--abs-tol", "-1")
    }
  }

  test("probe-skip hints default to probing and map to Some(true) when set") {
    val a = parse("--left", "l", "--right", "r", "--on", "id")
    assert(!a.assumeKeysUnique && !a.assumeKeysNullFree)
    val b = parse("--left", "l", "--right", "r", "--on", "id",
      "--assume-keys-unique", "--assume-keys-null-free")
    assert(b.assumeKeysUnique && b.assumeKeysNullFree)
  }

  test("--backend accepts only spark (script-compatibility selector)") {
    val a = parse("--left", "l", "--right", "r", "--on", "id",
      "--backend", "spark")
    assert(a.on == Seq("id"))
    val b = parse("--left", "l", "--right", "r", "--on", "id",
      "--backend", "Spark") // case-insensitive like the reference choices
    assert(b.on == Seq("id"))
    val e = intercept[BadArgsException] {
      parse("--left", "l", "--right", "r", "--on", "id", "--backend", "pandas")
    }
    assert(e.getMessage.contains("pandas"))
    assertThrows[BadArgsException] {
      parse("--left", "l", "--right", "r", "--on", "id", "--backend")
    }
  }

  test("missing required args and unknown flags are rejected") {
    assertThrows[BadArgsException] { parse("--left", "l", "--on", "id") }
    assertThrows[BadArgsException] { parse("--left", "l", "--right", "r") }
    assertThrows[BadArgsException] {
      parse("--left", "l", "--right", "r", "--on", "id", "--bogus")
    }
  }

  test("--help and --version short-circuit with exit text") {
    val help = intercept[Main.ExitWithText] { parse("--help") }
    assert(help.text.contains("usage: compare") && help.text.contains("--abs-tol"))
    // --help wins even mid-arglist, like argparse
    val mid = intercept[Main.ExitWithText] { parse("--left", "l", "--help") }
    assert(mid.text == Main.Usage)
    val ver = intercept[Main.ExitWithText] { parse("--version") }
    assert(ver.text == Main.Version)
  }

  test("--ignore-unique-rows requires --max-unequal-rows") {
    assertThrows[BadArgsException] {
      parse("--left", "l", "--right", "r", "--on", "id", "--ignore-unique-rows")
    }
  }

  test("csv delimiter accepts escaped tab, rejects multi-char") {
    val a = parse("--left", "l", "--right", "r", "--on", "id", "--csv-delimiter", "\\t")
    assert(a.csvDelimiter == "\t")
    assertThrows[BadArgsException] {
      parse("--left", "l", "--right", "r", "--on", "id", "--csv-delimiter", "ab")
    }
  }

  test("format inference by extension, .tsv deliberately unmapped") {
    assert(Readers.inferFormat("x.csv", None) == "csv")
    assert(Readers.inferFormat("x.PQ", None) == "parquet")
    assert(Readers.inferFormat("x.jsonl", None) == "json")
    assert(Readers.inferFormat("x.tsv", Some("csv")) == "csv")
    assertThrows[IllegalArgumentException] { Readers.inferFormat("x.tsv", None) }
    assert(Readers.isNdjson("a.ndjson") && !Readers.isNdjson("a.json"))
  }

  test("dataset names derive from stems with collision suffix") {
    val a = parse("--left", "/tmp/a/sales.csv", "--right", "/tmp/b/sales.csv", "--on", "id")
    assert(Main.datasetNames(a) == ("sales_1", "sales_2"))
    val b = parse("--left", "/tmp/x.csv", "--right", "/tmp/y.csv", "--on", "id")
    assert(Main.datasetNames(b) == ("x", "y"))
    val c = parse("--left", "/tmp/x.csv", "--right", "/tmp/y.csv", "--on", "id",
      "--df1-name", "base", "--df2-name", "compare")
    assert(Main.datasetNames(c) == ("base", "compare"))
  }
}
