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

  /** Key-skew profile for a prospective join/groupBy key: the `topK`
    * heaviest key values with row count, share of total, and the key
    * cardinality alongside — the numbers that decide whether a key needs
    * [[Salt]]ing, an AQE skew split, or is safe to shuffle on, measured
    * BEFORE the expensive job rather than discovered as a straggler task.
    *
    * Plan: one hash aggregation (map-side partials), totals broadcast
    * back as a scalar row, TakeOrdered top-k — never a global sort. The
    * final rank window runs over the already-limited k rows (bounded,
    * single task on k rows by construction). Null keys are excluded: they
    * never match in an equi-join, so they are a different problem (see
    * [[nullProfile]]) than skew.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(keyCol).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.crossJoin(broadcast(totals))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("n_rows").cast("double"))
          .as("share"),
        col("n_keys"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topK)
    top.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col(keyCol).asc)).cast("int"))
  }
}
