package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the acceptance checks a pipeline runs before
  * promoting a load: per-column null counts, distinct key cardinality,
  * duplicate-key detection. All integer-exact (counts, not sampled
  * estimates), so results are reproducible and cross-engine hashable;
  * each check is one aggregation with full map-side partials.
  */
object Checks {

  /** Per-column null/total counts in ONE pass over the data (one grand
    * aggregate, no per-column jobs). Output: one row per column —
    * (col_name, n_null, n_total).
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    // coalesce: sum() over an EMPTY frame is null, and an acceptance gate
    // comparing null counts must see 0 for an empty load, not null
    val aggs = cols.map(c =>
      coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
        .as(s"__n_$c")) :+
      count(lit(1)).as("__total")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to (col_name, n_null, n_total) via a
    // literal-array explode — no second scan
    wide.select(explode(array(cols.map(c =>
      struct(lit(c).as("col_name"), col(s"__n_$c").as("n_null"),
        col("__total").as("n_total"))): _*)).as("p"))
      .select("p.col_name", "p.n_null", "p.n_total")
  }

  /** Keys violating a uniqueness expectation: every key value appearing
    * more than once, with its count. Empty result = constraint holds.
    */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)
}
