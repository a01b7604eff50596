package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temperature-based corpus mixing — sample each language/source group
  * proportional to size^α (α = 0.5), the standard rebalancing between
  * proportional sampling (α=1, big groups dominate) and uniform (α=0,
  * tiny groups overfit). Deterministic end to end:
  *
  *  - selection is hash-mod on the document id (rerun-identical and
  *    task-retry-safe; `rand()` is neither),
  *  - per-group rates are computed IN THE PLAN from the group counts (a
  *    5-row aggregate broadcast back; no driver round-trip, no collect),
  *  - α is fixed at 0.5 because `sqrt` is an IEEE-754 correctly-rounded
  *    operation — bit-identical in every engine — while `pow(x, α)` is
  *    libm-dependent and would break cross-engine reproducibility. The
  *    weights are floored to integer millionths so the only cross-group
  *    arithmetic (their sum) is exact integer addition, immune to
  *    aggregation order.
  *
  * `targetFraction` is the desired share of the TOTAL corpus; per-group
  * rates `min(1, targetFraction·N·w_g / (Σw·n_g))` are floored to
  * per-million thresholds.
  */
object Mix {

  /** The kept subset. Output columns: `idCol`, `groupCol`. Rows with a
    * NULL group are excluded entirely — from the counts AND the output
    * (counting them while the equi-join made them unselectable would
    * silently depress every real group's rate).
    */
  def temperatureMix(docs: DataFrame, groupCol: String, idCol: String,
      targetFraction: Double): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1, "0 < targetFraction <= 1")
    // internal columns are double-underscore-prefixed: a caller's groupCol
    // named "n"/"w" (Spark resolves case-insensitively) must not collide
    val selectable = docs.where(col(groupCol).isNotNull)
    val counts = selectable.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w",
        floor(sqrt(col("__n").cast("double")) * 1000000.0).cast("long"))
    val totals = counts.agg(sum(col("__w")).as("__sumw"),
      sum(col("__n")).as("__total"))
    // identical operation ORDER to the oracle SQL — IEEE scalar arithmetic
    // is deterministic given identical operands and op order
    val rate = least(lit(1000000.0),
      lit(targetFraction) * col("__total").cast("double") * col("__w").cast("double") *
        lit(1000000.0) / (col("__sumw").cast("double") * col("__n").cast("double")))
    val thresholds = counts.crossJoin(broadcast(totals))
      .select(col(groupCol), floor(rate).cast("long").as("__thr"))
    // Knuth multiplicative hash into [0, 1e6). The id is reduced mod 1e6
    // BEFORE multiplying: (id·m) mod 1e6 == ((id mod 1e6)·(m mod 1e6))
    // mod 1e6, and the reduced product maxes at ~4.4e11 — a direct
    // id·2654435761 overflows long for ids above ~3.5e9 (ANSI mode would
    // throw exactly at the corpus sizes this operator targets). The
    // multiplier is coprime to 1e6, so consecutive ids cycle the FULL
    // range — a small one (q43's 1000003 ≡ 3 mod 1e6) maps small ids to
    // tiny values and selects everything below any realistic threshold.
    selectable.select(idCol, groupCol)
      .join(thresholds, groupCol)
      .where(pmod(pmod(col(idCol), lit(1000000L)) * 435761L, lit(1000000L))
        < col("__thr"))
      .select(idCol, groupCol)
  }

  /** Epoch-weighted replication — the UPSAMPLING half of corpus mixing
    * ([[temperatureMix]] only downsamples): a group with weight 2.3 emits
    * every document twice plus a deterministic 30% of documents a third
    * time, each copy tagged with its `epoch` ordinal (0-based) so
    * downstream shuffling/packing can interleave epochs.
    *
    * Fractional weights resolve per DOCUMENT (hash-mod, rerun-identical),
    * not per batch, so every run — and every engine — replicates the
    * identical document set. The weight is split into (whole copies,
    * fractional millionths) at PLAN time; the fractional test reuses the
    * same Knuth-scatter hash as [[temperatureMix]]. Map-only: the
    * replication is a bounded `explode(sequence)`, no shuffle, no join.
    */
  def epochMix(docs: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    def split(w: Double): (Int, Long) = {
      require(w >= 0 && w <= 100, s"weight out of range: $w")
      val base = math.floor(w).toInt
      // the oracle SQL is GENERATED from the same longs, so binary-double
      // representation error (0.3 -> 299999) cancels by construction
      ((base, ((BigDecimal(w) - base) * 1000000).toLong))
    }
    val (defBase, defFrac) = split(defaultWeight)
    val (baseCol, fracCol) = weights.foldLeft(
      (lit(defBase), lit(defFrac))) { case ((b, f), (k, w)) =>
      val (kb, kf) = split(w)
      (when(col(groupCol) === k, lit(kb)).otherwise(b),
        when(col(groupCol) === k, lit(kf)).otherwise(f))
    }
    val h = pmod(pmod(col(idCol), lit(1000000L)) * 435761L, lit(1000000L))
    val n = baseCol + when(h < fracCol, 1).otherwise(0)
    docs.where(col(groupCol).isNotNull)
      .select(col(idCol), col(groupCol), n.as("__n"))
      .where(col("__n") > 0)
      .select(col(idCol), col(groupCol),
        explode(sequence(lit(0), col("__n") - 1)).as("epoch"))
  }
}
