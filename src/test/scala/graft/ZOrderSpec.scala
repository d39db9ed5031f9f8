package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

/** Morton-clustered layout: key construction, result invariance, and the
  * point of the exercise — file-level pruning quality on a box probe. */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("zkey interleaves dimension bits (dim d bit i at position i*D + d)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 2L))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrder.zkey(Seq((col("x"), 0L, 3L), (col("y"), 0L, 3L)), bits = 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)  // x bit 0 -> position 0
    assert(got((0L, 1L)) == 2L)  // y bit 0 -> position 1
    assert(got((1L, 1L)) == 3L)
    // x=3 (11), y=2 (10): positions x0=1,x1=4 -> 1+... z = 1*1 + 1*4 | y: 0*2 + 1*8 = 13
    assert(got((3L, 2L)) == 13L)
  }

  test("zkey bucketizes wide ranges monotonically and clamps the max") {
    val df = Seq(0L, 500L, 999L, 1000L).toDF("v")
    val z = df.select(ZOrder.zkey(Seq((col("v"), 0L, 1000L)), bits = 2).as("z"))
      .collect().map(_.getLong(0))
    assert(z(0) == 0L && z(1) == 1L && z(2) == 3L && z(3) == 3L)
  }

  private lazy val li = spark.read
    .parquet("/root/testdata/sf0.001/lineitem.parquet")
    .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  test("z-ordered write preserves the row multiset") {
    val p = "target/test_zorder_roundtrip"
    ZOrder.writeZOrdered(li, Seq("l_partkey", "l_suppkey"), p, bits = 6, numFiles = 8)
    val a = li.groupBy(li.columns.map(col): _*).count().collect().toSet
    val b = spark.read.parquet(p).groupBy(li.columns.map(col): _*).count().collect().toSet
    assert(a == b)
  }

  test("box probe touches far fewer files than a natural layout") {
    val zp = "target/test_zorder_files"
    val np = "target/test_natural_files"
    ZOrder.writeZOrdered(li, Seq("l_partkey", "l_suppkey"), zp, bits = 6, numFiles = 16)
    li.repartition(16).write.mode("overwrite").parquet(np)
    val mm = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).first()
    val (pmn, pmx, smn, smx) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    // the lowest quarter of each dimension = 1/16 of the area
    val (pHi, sHi) = (pmn + (pmx - pmn) / 4, smn + (smx - smn) / 4)
    def touchedFiles(path: String): Int =
      spark.read.parquet(path)
        .select(input_file_name().as("f"), col("l_partkey"), col("l_suppkey"))
        .groupBy("f")
        .agg(min("l_partkey").as("p0"), max("l_partkey").as("p1"),
          min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
        .where(col("p0") <= pHi && col("p1") >= pmn &&
          col("s0") <= sHi && col("s1") >= smn)
        .count().toInt
    val z = touchedFiles(zp)
    val n = touchedFiles(np)
    assert(n >= 12, s"natural layout should touch nearly all files, touched $n")
    assert(z <= n / 2, s"z-order should halve touched files at worst: z=$z n=$n")
  }
}
