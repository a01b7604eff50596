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
  def clusterIfLarge(df: DataFrame, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    val splitBytes = spark.conf.get("spark.sql.files.maxPartitionBytes",
      (128L * 1024 * 1024).toString)
    val threshold = org.apache.spark.network.util.JavaUtils
      .byteStringAsBytes(splitBytes)
    val est = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan.stats.sizeInBytes
    if (est > threshold) df.repartition(keys: _*) else df
  }
}
