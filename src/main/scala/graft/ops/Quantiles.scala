package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped quantiles — exact and approximate.
  *
  * The exact form plans an ObjectHashAggregate that buffers each group's
  * values, so it is correct at any scale but memory-bound by the LARGEST
  * GROUP (not the table): right for per-language / per-source corpus
  * reporting where groups are numerous and bounded, wrong for a quantile
  * over one 100 TB group. For the unbounded case use [[approxQuantiles]] —
  * Spark's `approx_percentile` aggregates fixed-size QuantileSummaries
  * sketches with map-side partial merge, the standard single-pass
  * distributed-quantile design.
  *
  * Exactness across engines: `percentile` interpolates at rank
  * `p * (n-1)` (`lo + (hi-lo) * frac`), the same definition DuckDB's
  * `quantile_cont` uses. With integer inputs and dyadic percentiles
  * (multiples of 1/4, 1/8, …) every intermediate is an exact double, so the
  * results are bit-identical cross-engine — which is what lets q48 be
  * hash-checked. Non-dyadic percentiles (0.95) may differ in the last ulp
  * between engines; keep those to the approximate path or round.
  */
object Quantiles {

  /** Exact grouped percentiles of an integral column. Output: keys,
    * `n_rows`, and one `p<NN>` column per requested percentile.
    */
  def exactQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[Double]): DataFrame = {
    val aggs = ps.map(p => percentile(col(valueCol), lit(p)).as(pName(p))) :+
      count(lit(1)).as("n_rows")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Sketch-based grouped percentiles for unbounded groups: bounded state
    * per group (`1/accuracy` summary entries), map-side partial merge, one
    * shuffle. Error ≤ accuracy⁻¹ relative rank.
    */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
      ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val aggs = ps.map(p =>
      approx_percentile(col(valueCol), lit(p), lit(accuracy)).as(pName(p))) :+
      count(lit(1)).as("n_rows")
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Column name for percentile p: "p25", "p12_5", "p6_25" — full decimal
    * precision (rounding to an integer percent would both mislabel the
    * dyadic percentiles this module recommends and collide 0.125/0.13 into
    * one duplicate column name).
    */
  private def pName(p: Double): String =
    // BigDecimal(p) uses the double's shortest decimal representation, so
    // multiplying by 100 afterward is exact ("p29"); p * 100 in DOUBLE
    // first would bake in binary error ("p28_999999999999996")
    "p" + (BigDecimal(p) * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_").replace("-", "m")
}
