package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed materialization — pay a table's shuffle ONCE at write time,
  * then join/aggregate on the bucket key any number of times with ZERO
  * exchanges.
  *
  * `bucketBy(n, key)` hash-partitions rows into `n` files per partition by
  * the key at write time and records the layout in the catalog; a
  * SortMergeJoin between two tables bucketed into the same count on their
  * join keys reads co-located buckets directly — `.explain` shows no
  * Exchange on either side. At 100 TB this is the difference between
  * re-shuffling the fact table for every join and never shuffling it at
  * all; the same layout also serves repeated `groupBy(key)` aggregations.
  * `sortBy(key)` additionally pre-sorts within buckets, letting the merge
  * join skip its sort.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table at `path`, registered
    * in the session catalog as `tableName` (replacing any previous
    * registration), and return the catalog-backed frame whose scans carry
    * the bucket layout.
    */
  def saveBucketed(df: DataFrame, tableName: String, path: String,
      buckets: Int, key: String): DataFrame = {
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
    df.sparkSession.table(tableName)
  }
}
