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
    // Cluster by the bucket key BEFORE the bucketed write (r20, guide §6
    // partitioning-on-write / §2.5 unsplittable-input): rows of one
    // bucket land in one task, so (a) the sort+write parallelizes across
    // `buckets` tasks instead of riding the scan's split count (the
    // sf0.1 inputs are single-row-group files → ONE task sorted and
    // wrote the whole fact table: 1.4 s of q44's 2.2 s), and (b) each
    // task emits exactly one file per bucket instead of every scan task
    // emitting one file for every bucket it happens to hold — at scale
    // that is tasks×buckets small files per layout. Same rows in the
    // same buckets in the same within-file order (bucket id and
    // repartition target share the key hash; sortBy orders within each
    // file), so every reader sees an identical layout.
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
    df.sparkSession.table(tableName)
  }
}
