package graft.operators

import org.apache.spark.sql.DataFrame

/** Guard against degenerate SCAN parallelism ahead of CPU-heavy per-row
  * stages.
  *
  * Spark parallelizes a file scan by split, and a parquet row group is the
  * minimum split — so a small file (or a few large row groups) can enter the
  * plan as a handful of partitions, and every narrow stage before the first
  * exchange (shingling, hashing, signature computation, codec work) then
  * runs on that handful of cores no matter how many the cluster has. The
  * shuffle that follows fixes parallelism for everything AFTER it; this
  * helper fixes the work BEFORE it.
  *
  * [[spread]] is a conditional repartition: a no-op whenever the input
  * already carries at least half the cluster's default parallelism — which
  * at production scale (thousands of splits) is always, so the extra
  * exchange never appears in the 100 TB plan. When it does fire, it
  * shuffles only the operator's projected input (typically id + text), the
  * cheapest point in the pipeline to move rows.
  */
object Parallelize {

  /** Repartition `df` to the cluster's default parallelism iff its current
    * physical partition count is below half of it. Row order downstream is
    * partition-dependent either way (operators using this are set-based or
    * carry explicit ordering keys). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
