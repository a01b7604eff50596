package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join via time binning — the scale path for
  * "point falls inside interval" joins.
  *
  * A naive range join has no equality predicate, so Spark plans a
  * BroadcastNestedLoopJoin (fine only when one side is tiny) or a cartesian
  * product (never fine). Binning manufactures the missing equi-key: time is
  * quantized into fixed-width bins, every interval is exploded over the bins
  * it covers, and the join becomes a hash/sort-merge equi-join on the bin id
  * followed by the exact range filter. With the bin width equal to the
  * interval width each interval covers at most two bins, so the explode is a
  * bounded 2× on the interval side and the pair blowup of the naive plan
  * never materializes.
  *
  * Scale notes for the 100 TB case:
  *  - the equi-join on `__bin` shuffles both sides by an 8-byte key;
  *    neither side needs to broadcast;
  *  - temporal hot spots (many points in one bin) are ordinary join skew —
  *    compose with [[Salt.saltedJoin]] or let AQE's skew-join splitting
  *    handle it, exactly as for any other skewed equi-join;
  *  - pre-aggregate the dense side below the join when the final result is
  *    an aggregate (see q47): the join then moves per-bin partials, not raw
  *    rows.
  */
object RangeJoin {

  import Num.floorDiv

  /** Epoch micros for TIMESTAMP or TIMESTAMP_NTZ columns — `unix_micros`
    * only accepts the former; the engine session is pinned UTC
    * ([[graft.core.GraftSession]]), where the NTZ→TZ cast is the identity
    * on the wall-clock value.
    */
  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Join each row of `points` into every interval of `intervals` whose
    * half-open window `[startCol, startCol + widthSec)` contains
    * `pointCol`. Both columns must be timestamps. Returns the inner join
    * of the two inputs (all columns of both; the helper bin column is
    * dropped), one output row per (interval, contained point) pair.
    *
    * `binSec` defaults to the interval width — the sweet spot where each
    * interval covers at most ⌈width/bin⌉+1 = 2 bins. A smaller bin trades a
    * wider interval-side explode for finer skew spreading.
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
      startCol: String, widthSec: Long, pointCol: String,
      binSec: Long = 0L): DataFrame = {
    require(widthSec > 0, "widthSec > 0")
    val b = if (binSec > 0) binSec else widthSec
    val bUs = b * 1000000L
    val wUs = widthSec * 1000000L

    val s = micros(col(startCol))
    // single-split interval inputs (guide §2.5 unsplittable input, r20):
    // the 2× bin explode, the join probe, and any partial aggregation
    // above the join otherwise all ride the scan's ONE task — measured
    // 0.9 s of q47's 2.1 s at sf0.1. Size-gated: no-op whenever the scan
    // has real splits (any deployment-scale input).
    val iv = graft.core.Layout.parallelizeIfSingleSplit(intervals)
      .withColumn("__bin",
        explode(sequence(floorDiv(s, bUs), floorDiv(s + lit(wUs - 1), bUs))))

    val p = micros(col(pointCol))
    val pt = points.withColumn("__bin", floorDiv(p, bUs))

    // the range predicate resolves each time column against ITS OWN side
    // (iv(startCol) / pt(pointCol), captured pre-join): resolving by bare
    // name after the join would throw an ambiguous-reference error whenever
    // the two inputs share a column name — including startCol == pointCol
    val start = micros(iv(startCol))
    val point = micros(pt(pointCol))
    iv.join(pt, iv("__bin") === pt("__bin"))
      .where(point >= start && point < start + lit(wUs))
      .drop(iv("__bin")).drop(pt("__bin"))
  }
}
