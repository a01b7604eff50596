package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Write-layout helpers shared by the artifact sinks. */
object Layout {

  /** `df` clustered by `keys` when its ESTIMATED size says the partitioned
    * write would otherwise scatter tasks×values small files; unchanged
    * (map-side write) when the whole frame fits inside one scan split —
    * there the task count is already bounded and the clustering shuffle
    * is pure overhead (r20, guide §6 small files / §2 scale-adaptive
    * partitioning: the gate derives from data size and the session's own
    * split setting, never from a local core count).
    *
    * Row-identical either way — `repartition(cols)` only moves rows.
    * Estimates come from the optimized plan's stats: an OVERestimate
    * engages clustering early (harmless — the write was about to be
    * multi-task anyway), an underestimate degrades to the historical
    * map-side write.
    */
  def clusterIfLarge(df: DataFrame, keys: Column*): DataFrame =
    if (estBytes(df) > splitBytes(df)) df.repartition(keys: _*) else df

  /** `df` spread over the default parallelism when its ESTIMATED size fits
    * inside ONE scan split — the guide §2.5 unsplittable-input fix,
    * size-gated so it engages exactly when the scan CANNOT parallelize
    * itself (a single-split input is at most one task regardless of core
    * count; the sf testdata's single-row-group parquet is the motivating
    * case) and no-ops at any scale where the scan has real splits. Costs
    * one row-identical round-robin shuffle of the (by the gate, tiny)
    * frame; callers apply it below an expensive per-row expansion (e.g.
    * the range-join interval explode) so that work leaves the single
    * scan task.
    */
  def parallelizeIfSingleSplit(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (cores > 1 && estBytes(df) <= splitBytes(df)) df.repartition(cores)
    else df
  }

  private def splitBytes(df: DataFrame): BigInt = {
    val v = df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes",
      (128L * 1024 * 1024).toString)
    BigInt(org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v))
  }

  private def estBytes(df: DataFrame): BigInt =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.stats.sizeInBytes
}
