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
  /** EXACT global order statistics by POSITION over a range-landed
    * document drop — quantiles as a LAYOUT LOOKUP: the sidecar's
    * per-band row counts locate the band holding the k-th global row
    * (`k = floor(q·(n−1))`, the lower discrete quantile — the value at a
    * global position is deterministic even under duplicate keys), so
    * each requested quantile reads ONE band: a zone-pruned range filter
    * plans exactly that band's files, `ORDER BY key LIMIT local+1`
    * pushes as top-N — the band's `sorted` proof early-exits the reader
    * after ~local+1 parsed rows — and the outer DESC `LIMIT 1` keeps the
    * selected row. No global sort, no shuffle, no sketch approximation —
    * at 100 TB with 1000 bands a quantile costs a fraction of one band's
    * scan, where `approx_percentile` pays a full corpus pass for an
    * approximate answer and an exact sort pays the range exchange. Task
    * memory is O(position within the band) — bounded by a band, the same
    * unit every other band read is sized by.
    *
    * Requires the drop's band layout to be PROVEN for `keyCol` (the
    * [[graft.sink.CorpusSink.landJsonlRangeIndexed]] posture) and the
    * scan to deliver every row (no pushed filters) — refuses loudly
    * otherwise: [[exactQuantiles]]/[[approxQuantiles]] are the
    * layout-free alternatives. Output: one row per requested quantile,
    * columns `(q, value)`.
    */
  def layoutQuantiles(df: DataFrame, keyCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantile positions must lie in [0, 1]")
    // the frame must be the SCAN itself (row-preserving Projects aside):
    // a residual Filter, Limit, or Sample above the scan drops rows the
    // sidecar counted, which would silently MISLOCATE every position —
    // orderedBandFileStats only vouches for predicates pushed INTO the
    // scan, so the plan shape between root and relation is checked here.
    // The peel admits ALIAS-FREE Projects only (pure column selection/
    // permutation): an aliasing Project could redefine or shadow keyCol
    // (`select((k*2).as("k"))`), and the filter/sort below would then run
    // on the aliased expression while band boundaries come from the raw
    // column's stats — silently mislocating every quantile.
    def scanOnly(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Option[org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation] =
      p match {
        case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          Some(r)
        case pr: org.apache.spark.sql.catalyst.plans.logical.Project
            if pr.projectList.forall(
              _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.AttributeReference]) =>
          scanOnly(pr.child) // attribute-only projection never drops rows
        case _ => None
      }
    val optimized = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.optimizedPlan
    val rel = scanOnly(optimized)
      // belt over the alias-free braces: the frame's keyCol attribute
      // must be the SCAN'S OWN output attribute (exprId, not name — a
      // shadowing alias must never borrow the real column's stats)
      .filter { r =>
        optimized.output.find(_.name == keyCol)
          .exists(a => r.output.exists(_.exprId == a.exprId))
      }
    val scan = rel.map(_.scan)
      .collect { case s: graft.ingest.v2.ExtJsonScan => s }
    val banded = scan.flatMap { s =>
      for {
        stats <- s.orderedBandFileStats(keyCol)
        groups <- s.orderedBandPartitions(keyCol)
      } yield (stats, groups)
    }
    val (stats, groups) = banded.getOrElse(throw new IllegalArgumentException(
      s"layoutQuantiles needs a proven band layout on '$keyCol' and a " +
        "bare unfiltered scan (no filter/limit/sample between it and the " +
        "frame — dropped rows would mislocate every position) — land with " +
        "CorpusSink.landJsonlRangeIndexed, or use " +
        "exactQuantiles/approxQuantiles for layout-free inputs"))
    val counts = stats.map(_.map(_.cols(keyCol).rows).sum)
    val n = counts.sum
    require(n > 0, "layoutQuantiles over an empty drop has no positions")
    val prefixes = counts.scanLeft(0L)(_ + _)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(df.schema(keyCol).dataType)
    qs.map { q =>
      val k = math.floor(q * (n - 1)).toLong
      val g = prefixes.indexWhere(_ > k) - 1
      val local = k - prefixes(g)
      require(local + 1 <= Int.MaxValue, s"band $g holds > 2^31 rows")
      df.filter(col(keyCol) >= lit(conv(groups(g).min)) &&
          col(keyCol) <= lit(conv(groups(g).max)))
        .select(col(keyCol).as("value"))
        .orderBy(col("value").asc)
        .limit(local.toInt + 1)
        .orderBy(col("value").desc)
        .limit(1)
        .select(lit(q).as("q"), col("value"))
    }.reduce(_.union(_))
  }

  private def pName(p: Double): String =
    // BigDecimal(p) uses the double's shortest decimal representation, so
    // multiplying by 100 afterward is exact ("p29"); p * 100 in DOUBLE
    // first would bake in binary error ("p28_999999999999996")
    "p" + (BigDecimal(p) * 100).underlying.stripTrailingZeros.toPlainString
      .replace(".", "_").replace("-", "m")
}
