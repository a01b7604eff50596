package graft.keys

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}

/** Scalable global ordering index: assigns a contiguous 1-based position to
  * every row of a DataFrame under a total order, without ever funnelling the
  * data through a single partition.
  *
  * This is the scale-safe replacement for
  * `row_number().over(Window.orderBy(...))`, whose unpartitioned window pulls
  * the whole dataset into ONE task. Here the work is:
  *
  *   1. `repartitionByRange(sortCols)` — one shuffle; the range partitioner
  *      gives globally ordered partitions,
  *   2. `sortWithinPartitions` — per-partition sort, no further shuffle,
  *   3. `zipWithIndex` — Spark's two-pass trick: one tiny job counts rows
  *      per partition, then each partition stamps `partitionOffset + i`.
  *
  * Total cost: one range shuffle + one count pass — the same shape a global
  * `orderBy` already pays, so the index is effectively free on top of a sort.
  *
  * The sort columns must form a total order (include a unique tiebreaker):
  * with duplicate sort keys the range partitioner may split ties across
  * partition boundaries in sample-dependent ways and the assigned positions
  * of tied rows would not be reproducible.
  */
object GlobalIndex {

  /** Append column `idxName` = offset + (1-based position of the row in the
    * total order given by `sortCols`).
    */
  def withGlobalIndex(
      df: DataFrame,
      sortCols: Seq[Column],
      idxName: String,
      offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (offset + i + 1L))
    }
    val schema = sorted.schema.add(StructField(idxName, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }
}
