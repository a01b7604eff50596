package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.ops.Stats

/** Oracle-checked queries for the exact-statistics operators
  * ([[graft.ops.Stats]]): per-group covariance/correlation (q50) and
  * fixed-width histogram (q51) — the feature-profiling shapes of a
  * training-data pipeline, computed via exact decimal moments so the
  * results are bit-identical at any parallelism and in any engine.
  */
object StatOps {

  /** Price↔quantity covariance and correlation per return flag: five
    * exact decimal moments in ONE grouped aggregation (single shuffle,
    * map-side partials), floats touched only in the final scalar step.
    */
  private def q50CovarCorr(s: SparkSession, d: String): DataFrame =
    Stats.covarCorr(Tables.lineitem(s, d), Seq("l_returnflag"),
      "l_extendedprice", "l_quantity")

  /** Order-value histogram at $20k bins: integer-cent floor-division
    * binning (boundary-exact), one shuffle on the bin id.
    */
  private def q51Histogram(s: SparkSession, d: String): DataFrame =
    Stats.histogram(Tables.orders(s, d), "o_totalprice", binWidth = 20000.0)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_covar_corr" -> q50CovarCorr _,
    "q51_histogram" -> q51Histogram _)

  // the oracle mirrors the exact finalization ORDER of Stats.covarCorr —
  // IEEE arithmetic is deterministic given identical operands and op order
  private val momentsSql = Seq(
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx",
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy",
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx",
    "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * " +
      "CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS syy",
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy").mkString(", ")

  val oracle: Map[String, String] = Map(
    "q50_covar_corr" ->
      ("WITH m AS (SELECT l_returnflag, COUNT(*) AS n_rows, " + momentsSql +
        " FROM lineitem GROUP BY l_returnflag), " +
        "f AS (SELECT l_returnflag, n_rows, CAST(n_rows AS DOUBLE) AS n, " +
        "  sx, sy, sxx, syy, sxy FROM m) " +
        "SELECT l_returnflag, n_rows, " +
        "  (sxy - sx * sy / n) / n AS covar_pop, " +
        "  ((sxy - sx * sy / n) / n) / " +
        "  sqrt(((sxx - sx * sx / n) / n) * ((syy - sy * sy / n) / n)) AS corr " +
        "FROM f"),
    // DuckDB's % / '//' truncate toward zero while Stats.histogram floors
    // (pmod); the explicit floor-mod ((x % d) + d) % d keeps negative
    // measures in the same bin on both engines — the subsequent division
    // is exact, so truncation == floor there
    "q51_histogram" ->
      ("WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 " +
        "  AS BIGINT) AS cents FROM orders), " +
        "b AS (SELECT (cents - (((cents % 2000000) + 2000000) % 2000000)) " +
        "  // 2000000 AS bin FROM c) " +
        "SELECT bin, CAST(bin * 2000000 / 100.0 AS DOUBLE) AS bin_lo, " +
        "COUNT(*) AS n_rows FROM b GROUP BY bin"))
}
