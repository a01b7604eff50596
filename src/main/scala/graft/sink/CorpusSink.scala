package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sharded corpus output — the write side of a training-data
  * pipeline. Trainers consume corpora as a fixed list of shard files whose
  * CONTENT must be reproducible run-over-run (resume-safe data loaders,
  * byte-identical re-materialization for audits): a plain `df.write` gives
  * neither — row-to-file assignment and row order both float with task
  * scheduling.
  *
  * Contract here: shard = hash(id) partition (rerun-identical assignment),
  * rows sorted by id within each shard (rerun-identical order), one file
  * per shard. The global sort this deliberately is NOT (a total order
  * would range-shuffle the full corpus for no trainer-visible benefit;
  * hash sharding also spreads hot id ranges evenly).
  */
object CorpusSink {

  /** Write `df` as `numShards` deterministic shards under `dir`.
    *
    * `maxRecordsPerFile > 0` additionally caps file size: a shard whose
    * row count exceeds the cap rolls over to numbered files — the rolled
    * split point is row-count-based over the SORTED shard, so it stays
    * deterministic too.
    */
  def writeSharded(df: DataFrame, idCol: String, dir: String, numShards: Int,
      format: String = "parquet", maxRecordsPerFile: Long = 0L): Unit = {
    require(numShards > 0, "numShards > 0")
    val w = df
      .repartition(numShards, col(idCol))
      .sortWithinPartitions(col(idCol))
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile.toString)
    else w)
      .format(format).save(dir)
  }
}
