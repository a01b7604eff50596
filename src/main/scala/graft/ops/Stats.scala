package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact distributed statistics over clean fixed-point measure columns —
  * the feature-profiling pass of a training-data pipeline (drift checks,
  * feature/label correlation screens, distribution reports).
  *
  * Spark's built-in `covar_pop`/`corr` accumulate running doubles, so their
  * low bits depend on partition count and merge order — fine for analytics,
  * unusable for a bit-exact cross-engine gate or reproducible data-quality
  * signatures. Here every moment (Σx, Σy, Σx², Σy², Σxy) is an EXACT
  * decimal sum (the inputs are 2-decimal money/measure columns, products
  * are 4-decimal — both exact in DECIMAL(38,·) at any aggregation order),
  * and the float arithmetic happens once, deterministically, on the final
  * scalars. One shuffle, full map-side partial aggregation, O(groups)
  * state: the moments pattern scales exactly like a plain groupBy-sum.
  */
object Stats {

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Decimal moment → double through an exact integer: scale to an
    * integer-valued decimal, cast to BIGINT (exact), let the single
    * long→double IEEE rounding happen, divide by the (exactly
    * representable) scale. A direct decimal→double cast is NOT
    * engine-portable: Spark rounds the decimal correctly in one step,
    * while engines that convert the unscaled int128 and divide (DuckDB)
    * can land 1 ULP away — observed on real sums. This two-step form
    * forces every engine through the identical operation sequence, so the
    * operands of the finalization arithmetic are bit-identical by
    * construction. Domain: |moment| ·10^scale must fit a long — ~9·10¹⁴
    * for 4-decimal second moments, beyond any 2-decimal measure column
    * this operator is for; past that, split the aggregation by group
    * first.
    */
  private def exactDouble(c: Column, scale: Int): Column = {
    val s = math.pow(10, scale) // exact for scale <= 22
    (c * s.toLong).cast("long").cast("double") / lit(s)
  }

  /** Per-group exact second moments of (x, y), finalized as population
    * covariance and Pearson correlation. Output: keys, `n_rows`,
    * `covar_pop`, `corr`.
    *
    * Finalization order is pinned — `(sxy - sx*sy/n)/n` and its analogues —
    * and must be mirrored verbatim by any oracle: IEEE addition is
    * deterministic given identical operands and operation order (moments
    * enter as doubles via [[exactDouble]], which pins the operands too).
    */
  def covarCorr(df: DataFrame, keys: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val x = d2(col(xCol))
    val y = d2(col(yCol))
    val moments = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      exactDouble(sum(x), 2).as("sx"),
      exactDouble(sum(y), 2).as("sy"),
      exactDouble(sum(x * x), 4).as("sxx"),
      exactDouble(sum(y * y), 4).as("syy"),
      exactDouble(sum(x * y), 4).as("sxy"))
    val n = col("n_rows").cast("double")
    val cov = (col("sxy") - col("sx") * col("sy") / n) / n
    val varX = (col("sxx") - col("sx") * col("sx") / n) / n
    val varY = (col("syy") - col("sy") * col("sy") / n) / n
    moments.select(
      keys.map(col) ++ Seq(
        col("n_rows"),
        cov.as("covar_pop"),
        (cov / sqrt(varX * varY)).as("corr")): _*)
  }

  /** Fixed-width histogram of a 2-decimal measure column: exact integer
    * binning (values → cents → floor-division), one shuffle on the bin id.
    * Output: `bin` (index), `bin_lo` (inclusive lower edge), `n_rows`.
    *
    * Binning happens in INTEGER cents, never by dividing doubles — a
    * double division puts boundary values (`x == k·width`) in an
    * engine-dependent bin; integer floor-division is exact everywhere.
    * Empty bins are absent (at 100 TB a dense bin range is the caller's
    * join-with-`sequence` to add).
    */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double): DataFrame = {
    val widthCents = math.round(binWidth * 100)
    require(widthCents > 0, "binWidth must be a positive multiple of 0.01")
    val cents = (d2(col(valueCol)) * 100).cast("long")
    val bin = Num.floorDiv(cents, widthCents)
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("bin"),
        (col("bin") * widthCents / lit(100.0)).as("bin_lo"),
        col("n_rows"))
  }

  /** Robust outlier profile via median absolute deviation: per key group,
    * the median, the MAD (median of |x - median|), and how many rows sit
    * beyond `k` MADs — the outlier gate that, unlike mean/stddev z-scores,
    * is not itself dragged by the outliers it is hunting.
    *
    * Three passes by nature (median → deviations → deviation median +
    * count); each is one keyed shuffle with the group-median broadcast
    * back. Exactness: `percentile` at the dyadic 0.5 over integral inputs
    * interpolates exactly (see [[Quantiles]]); deviations are then exact
    * doubles, so the MAD and the `> k·mad` comparisons are engine-exact.
    * Memory bound is the largest GROUP (ObjectHashAggregate buffering, as
    * with [[Quantiles.exactQuantiles]]). Naming precondition: key columns
    * must not be named `med`, `mad`, or `n_rows` (the output stat columns).
    */
  def madProfile(df: DataFrame, keys: Seq[String], valueCol: String,
      k: Double): DataFrame = {
    val kc = keys.map(col)
    val med = df.groupBy(kc: _*)
      .agg(percentile(col(valueCol), lit(0.5)).as("__med"))
    val withDev = df.join(med, keys)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("__med")))
    val mad = withDev.groupBy(kc: _*)
      .agg(min(col("__med")).as("med"),
        percentile(col("__dev"), lit(0.5)).as("mad"),
        count(lit(1)).as("n_rows"))
    withDev.join(mad, keys)
      .groupBy(kc: _*)
      .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
        min(col("n_rows")).as("n_rows"),
        sum(when(col("__dev") > lit(k) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }
}
