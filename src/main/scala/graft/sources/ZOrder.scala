package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered parquet layout for multi-dimensional
  * range queries.
  *
  * A single-column sort gives parquet row-group min/max stats that prune
  * perfectly on that column and not at all on any other. Interleaving the
  * bits of several bucketized dimensions into one sort key clusters rows
  * so every file/row-group covers a small HYPER-RECTANGLE of the dim
  * space — a conjunctive range predicate on any subset of the dims then
  * skips most row groups via ordinary parquet stats pushdown, with no
  * query-side changes at all (the probe is a plain `where`; pruning
  * happens inside the scan).
  *
  * At 100 TB this is the table-layout lever: one extra range-repartition +
  * local sort at WRITE time (the same cost class as any clustered write)
  * buys every future 2-D/3-D slice query a scan proportional to the slice,
  * not the table.
  */
object ZOrder {

  /** Morton key of the given integral dimension columns: each dim is
    * linearly bucketized into [0, 2^bits) using the provided (min, max)
    * ranges — order-preserving integer arithmetic — and the bucket bits
    * are interleaved (dim d's bit i lands at position i·D + d). */
  def zkey(dims: Seq[(Column, Long, Long)], bits: Int): Column = {
    require(dims.nonEmpty, "zkey needs at least one dimension")
    require(bits > 0 && bits * dims.size <= 62,
      s"bits*dims must fit a positive long, got $bits*${dims.size}")
    val n = 1L << bits
    val d = dims.size
    val buckets = dims.map { case (c, mn, mx) =>
      if (mx <= mn) lit(0L)
      else {
        // monotone: (v-mn)*n / span, clamped into [0, n)
        val span = mx - mn + 1
        least((c.cast("long") - lit(mn)) * lit(n) / lit(span), lit(n - 1))
      }
    }
    val terms = for {
      (b, dim) <- buckets.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * d + dim)
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` Z-clustered on `dimCols` (integral columns): one min/max
    * probe fixes the bucket ranges, then a range repartition on the Morton
    * key + local sort, so consecutive files cover disjoint Z ranges =
    * small dim-space rectangles. The key column is dropped before writing;
    * pruning runs off the ordinary parquet column stats. */
  def writeZOrdered(df: DataFrame, dimCols: Seq[String], path: String,
      bits: Int = 8, numFiles: Int = 32): Unit = {
    val mm = df.agg(
      min(col(dimCols.head).cast("long")).as(s"mn_${dimCols.head}"),
      (dimCols.tail.flatMap(c => Seq(
        min(col(c).cast("long")).as(s"mn_$c"),
        max(col(c).cast("long")).as(s"mx_$c"))) :+
        max(col(dimCols.head).cast("long")).as(s"mx_${dimCols.head}")): _*)
      .first()
    val dims = dimCols.map(c =>
      (col(c), mm.getAs[Long](s"mn_$c"), mm.getAs[Long](s"mx_$c")))
    df.withColumn("__graft_z", zkey(dims, bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }
}
