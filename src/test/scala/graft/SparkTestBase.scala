package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites. */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // events.parquet carries TIMESTAMP(NANOS); Spark only reads it as long
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "target/spark-warehouse")
    // The documented cluster-wide install (README divergence 4): every
    // session in this JVM — including the per-client sessions the
    // in-process Spark Connect server creates for ConnectIntegrationSpec —
    // resolves the stable-name graft functions. Static conf, so it must
    // live here rather than in the one suite that needs it.
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .getOrCreate()
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
