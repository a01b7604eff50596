package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — carve an EXACT-size per-group subset
  * (eval/benchmark sets, human-review samples) out of a corpus,
  * reproducibly: the sample is the k rows with the smallest
  * (hash(id), id) per group, so a rerun — or another engine — selects the
  * identical rows. `rand()`-based sampling is neither rerun-stable nor
  * task-retry-safe, and hash-mod filtering ([[Mix]], q43) only gives
  * ~proportional sizes, not exact counts.
  *
  * The naive formulation — `row_number` over a per-group window, keep
  * `<= k` — funnels every group's FULL membership through one task each:
  * a 100 TB corpus with five languages becomes five tasks. This runs
  * filter-and-refine instead:
  *
  *   1. per-group counts (one small aggregate),
  *   2. loose hash filter: keep rows with `hash < ~4k/n_g` of the hash
  *      space — ~4k expected survivors per group; the k smallest hashes
  *      are provably among them whenever at least k rows survive,
  *   3. exactness fallback: any group with FEWER than k survivors (tiny
  *      groups; pathological hash clumping) contributes its whole
  *      membership instead,
  *   4. one window over the pooled candidates — partitions are ~4k rows
  *      (or the small fallback groups), never a big group's full mass.
  *
  * The result is EXACTLY the naive window's output at a bounded fraction
  * of its largest partition. Same Knuth-multiplicative hash as [[Mix]]
  * (overflow-proof, SQL-recomputable for the oracle).
  */
object Sampling {

  /** Per-group k smallest-(hash, id) rows. Output: `idCol`, `groupCol`,
    * `rank` (1..k within the group, in hash order). Rows with a NULL group
    * are excluded — they belong to no stratum. `idCol` must be integral
    * and non-negative (document/surrogate ids; the hash contract of
    * [[Mix]]).
    */
  def stratifiedTopK(df: DataFrame, groupCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k > 0")
    val h = pmod(pmod(col(idCol), lit(1000000L)) * 435761L, lit(1000000L))
    val rows = df.where(col(groupCol).isNotNull)
      .select(col(idCol), col(groupCol), h.as("__h"))
    val counts = rows.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    // loose threshold: 4k·1e6/n + 1 of the 1e6 hash space, capped at full
    // space. `/` is IEEE double division in both Spark and DuckDB, so the
    // fractional threshold (and hence the candidate set) agrees across
    // engines — but only the final top-k output is the cross-engine
    // contract; the superset+fallback below makes it exact regardless.
    // Renamed group key: counts descends from rows.
    val thr = counts.select(col(groupCol).as("__tg"),
      least(lit(1000000L), lit(4000000L * k) / col("__n") + 1L).as("__thr"))
    val withThr = rows.join(thr, col(groupCol) === col("__tg"))
    val cand = withThr.where(col("__h") < col("__thr"))
    // groups whose loose filter kept fewer than k rows fall back to their
    // full membership — the guarantee stays exact, only the (small or
    // adversarial) group pays the full-window cost
    val short = cand.groupBy(groupCol).agg(count(lit(1)).as("__nc"))
      .where(col("__nc") < k).select(col(groupCol).as("__sg"))
    val pooled = cand
      .join(short, col(groupCol) === col("__sg"), "left_anti")
      .select(col(idCol), col(groupCol), col("__h"))
      .unionByName(withThr
        .join(short, col(groupCol) === col("__sg"), "left_semi")
        .select(col(idCol), col(groupCol), col("__h")))
    val w = Window.partitionBy(groupCol).orderBy(col("__h").asc, col(idCol).asc)
    pooled
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col(groupCol), col("rank"))
  }
}
