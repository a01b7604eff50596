package graft.keys

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField}
import org.apache.spark.storage.StorageLevel

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
    val sorted = persistSorted(df, sortCols)
    val indexed = sorted.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (offset + i + 1L))
    }
    val schema = df.schema.add(StructField(idxName, LongType, nullable = false))
    spark.createDataFrame(indexed, schema)
  }

  /** Range-shuffle + per-partition sort, PERSISTED: both callers run two
    * passes over the sorted rows (a counting/partial-sum pass, then the
    * stamping pass). Without the persist the shuffle files are reused but
    * the per-partition sort and the row decode re-execute for each pass —
    * ~2× the sort CPU on the full corpus. Memory-and-disk with lineage
    * retained: a lost block is recomputed, oversized partitions spill. No
    * explicit unpersist — the stamped result is lazy, so the cache must
    * outlive this call; the ContextCleaner frees the blocks once the
    * returned frame (whose plan holds the only reference) is unreachable.
    */
  private def persistSorted(df: DataFrame, sortCols: Seq[Column]) =
    df.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
      .rdd.persist(StorageLevel.MEMORY_AND_DISK)

  /** Append column `sumName` = running (inclusive) sum of LongType column
    * `valueCol` in the total order given by `sortCols` — the distributed
    * prefix sum, by the same two-pass shape as [[withGlobalIndex]]:
    *
    *   1. range-repartition + per-partition sort (one shuffle),
    *   2. a tiny first pass collecting ONE partial sum per partition
    *     (driver state = numPartitions longs, never row data),
    *   3. a second pass stamping `partitionPrefix + runningWithinPartition`.
    *
    * This replaces `sum().over(Window.orderBy(...))`, whose unpartitioned
    * frame funnels the whole dataset through one task. Values must be
    * integral (token counts, cents) — long addition is exact and
    * order-independent within the fixed sorted order, so the result is
    * deterministic and cross-engine reproducible. Same total-order caveat
    * as [[withGlobalIndex]]: include a unique tiebreaker in `sortCols`.
    */
  def withRunningSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String,
      sumName: String): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"$valueCol must be LongType (cast upstream); exact long addition is the contract")
    val vIdx = df.schema.fieldIndex(valueCol)
    // nulls fail FAST with the contract spelled out: getLong on a null slot
    // would return an opaque 0/NPE depending on the row backing, silently
    // corrupting every downstream prefix. SUM-style null skipping is NOT
    // offered — a running sum that silently drops rows would desynchronize
    // from the row positions callers pair it with; filter or coalesce
    // upstream to state the intent.
    def valueAt(r: Row): Long = {
      if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
        s"withRunningSum: null in '$valueCol' — the running sum is " +
          "position-paired with its rows, so nulls cannot be skipped; " +
          "coalesce or filter them upstream")
      r.getLong(vIdx)
    }
    val rdd = persistSorted(df, sortCols)
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += valueAt(r))
        Iterator.single((pid, s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val prefixes = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val stamped = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = prefixes(pid)
      it.map { r =>
        acc += valueAt(r)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    val schema = df.schema.add(StructField(sumName, LongType, nullable = false))
    spark.createDataFrame(stamped, schema)
  }
}
