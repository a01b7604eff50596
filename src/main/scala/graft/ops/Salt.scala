package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation by key salting — the manual lever next to AQE's runtime
  * skew-join splitting (which only rewrites sort-merge JOINS; aggregation
  * skew and broadcast-ineligible skewed joins still need salting).
  *
  * Salts are DETERMINISTIC — derived by hashing the full row, never
  * `rand()`: task retries must re-produce the same salt or shuffle-file
  * reuse silently mixes distributions. Identical rows co-locate on one
  * salt, which is the correct behavior (they aggregate together anyway).
  */
object Salt {

  /** Deterministic salt in [0, factor) from the hash of the given columns
    * (pass the row's non-key columns — salting by the skewed key itself
    * would put the whole hot key back in one partition).
    */
  def saltExpr(factor: Int, from: Seq[Column]): Column =
    pmod(xxhash64(from: _*), lit(factor.toLong)).cast("int")

  /** Two-phase salted aggregation for skewed group keys: phase 1 groups by
    * (key, salt) — the hot key's rows spread over `factor` reducers — and
    * computes partial counts/sums; phase 2 merges partials per key. The
    * result is row-for-row identical to the unsalted
    * `groupBy(keys).agg(count, sum…)` (counts are exact; pass decimal
    * columns for exact sums, as everywhere else in the engine).
    *
    * Output columns: keys, `n_rows`, and `sum_<col>` per requested column.
    *
    * Two shuffles instead of one — the price of skew immunity; worth it
    * exactly when one key holds more rows than an executor's share. For
    * non-skewed data use a plain groupBy (Spark's partial aggregation
    * already combines map-side).
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
      factor: Int): DataFrame = {
    require(factor >= 1, "factor >= 1")
    val others = df.columns.filterNot(keys.contains).map(col).toSeq
    val salted = df.withColumn("__salt",
      saltExpr(factor, if (others.nonEmpty) others else Seq(lit(0))))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sumCols.map(c => sum(col(c)).as(s"__s_$c")): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        sumCols.map(c => sum(col(s"__s_$c")).as(s"sum_$c")): _*)
  }

  /** Salted equi-join for a skewed LEFT side against a small-but-not-
    * broadcastable right side: left rows get a deterministic salt, the
    * right side is replicated once per salt value (explode of a literal
    * range — `factor`× its size), and the join key becomes (key, salt).
    * The hot key's rows land on `factor` reducers instead of one.
    *
    * Result is identical to `left.join(right, keys, joinType)` for the
    * supported types (inner / left_outer: every left row keeps exactly its
    * original matches).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type for salting: $joinType")
    val others = left.columns.filterNot(keys.contains).map(col).toSeq
    val l = left.withColumn("__salt",
      saltExpr(factor, if (others.nonEmpty) others else Seq(lit(0))))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1)).cast("array<int>")))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
