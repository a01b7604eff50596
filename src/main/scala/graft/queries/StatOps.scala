package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Checks, Diff, Stats}

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

  /** Data-quality null profile ([[Checks.nullProfile]]) over a frame with
    * deterministic planted nulls (the testdata is dense, so sparsity is
    * manufactured q15-style): per-column null/total counts from ONE grand
    * aggregate.
    */
  private def q62NullProfile(s: SparkSession, d: String): DataFrame = {
    val df = Tables.customer(s, d).select(col("c_custkey"),
      when(col("c_custkey") % 3 =!= 0, col("c_name")).as("name"),
      when(col("c_custkey") % 7 =!= 0, col("c_acctbal")).as("bal"))
    Checks.nullProfile(df, Seq("c_custkey", "name", "bal"))
  }

  /** Snapshot CDC ([[Diff.snapshotDiff]]): a deterministic "next day"
    * snapshot is derived from orders (every 10th key deleted, every 7th
    * status rewritten, every 13th re-keyed as an insert) and diffed
    * against the original — one full-outer join on the key, null-safe
    * column comparison. The upstream of every incremental pipeline when
    * the source only provides full snapshots.
    */
  private def q63SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val old = Tables.orders(s, d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val next = Tables.orders(s, d)
      .where(col("o_orderkey") % 10 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit("X"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice"))
      .union(Tables.orders(s, d)
        .where(col("o_orderkey") % 13 === 0)
        // NEGATED keys for the planted inserts: order keys are positive at
        // every scale factor, so negation can never collide with a real
        // key (a fixed additive offset would, once SF grows the keyspace)
        .select((-col("o_orderkey")).as("o_orderkey"),
          col("o_orderstatus"), col("o_totalprice")))
    Diff.snapshotDiff(old, next, Seq("o_orderkey"))
  }

  /** HLL++ approx-distinct with an exact-twin gate: per order priority,
    * the exact distinct-customer count alongside a BOOLEAN asserting the
    * approximate count (rsd 0.05) landed within 3·rsd of it. The oracle
    * plants `within_bound = true` — if Spark's sketch ever drifts out of
    * bound the hash check trips, making the error bound itself the
    * oracle-checked contract (the approximate VALUE has no cross-engine
    * twin; DuckDB's approx_count_distinct is a different sketch).
    *
    * At 100 TB the production call is the approx ALONE: one shuffle of
    * fixed-size sketch partials with map-side merge, no distinct-expand of
    * the key space. The exact twin here is the measurement harness, same
    * pattern as q23's brute-force ANN baseline.
    */
  private def q67ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey"), 0.05).as("__approx"))
      .select(col("o_orderpriority"), col("n_exact"),
        (abs(col("__approx") - col("n_exact")).cast("double") /
          col("n_exact").cast("double") <= 0.15).as("within_bound"))

  /** Robust outliers ([[Stats.madProfile]]): per-language token-count
    * median, MAD, and the count beyond 3 MADs — the quantile-based outlier
    * gate whose thresholds the outliers themselves can't drag (q61's
    * p75 cut and mean/stddev z-scores both can be).
    */
  private def q88MadOutliers(s: SparkSession, d: String): DataFrame =
    Stats.madProfile(
      Tables.documents(s, d).select(col("lang"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tokens")),
      Seq("lang"), "n_tokens", k = 3.0)

  /** Join-key skew profile ([[Checks.keySkewProfile]]): the 20 heaviest
    * event user_ids with share-of-total and key cardinality — the
    * pre-shuffle diagnostic that decides between a plain shuffle, salting
    * (q46), or an AQE skew split, run before the expensive job instead of
    * discovered as its straggler task.
    */
  private def q95KeySkew(s: SparkSession, d: String): DataFrame =
    Checks.keySkewProfile(Tables.events(s, d), "user_id", topK = 20)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_mad_outliers" -> q88MadOutliers _,
    "q95_key_skew" -> q95KeySkew _,
    "q50_covar_corr" -> q50CovarCorr _,
    "q51_histogram" -> q51Histogram _,
    "q62_null_profile" -> q62NullProfile _,
    "q63_snapshot_diff" -> q63SnapshotDiff _,
    "q67_approx_distinct" -> q67ApproxDistinct _)

  // the oracle mirrors the exact finalization ORDER of Stats.covarCorr —
  // IEEE arithmetic is deterministic given identical operands and op
  // order. Moments go decimal → scaled BIGINT → double → /scale, matching
  // Stats.exactDouble: a direct decimal→double CAST is 1-ULP
  // engine-dependent (DuckDB divides the unscaled integer; Spark rounds
  // the decimal in one step — observed divergent on sf0.001 group A).
  private def m2d(expr: String, scale: Long): String =
    s"CAST(CAST($expr * $scale AS BIGINT) AS DOUBLE) / $scale.0"
  private val momentsSql = Seq(
    m2d("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))", 100) + " AS sx",
    m2d("SUM(CAST(l_quantity AS DECIMAL(18,2)))", 100) + " AS sy",
    m2d("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "CAST(l_extendedprice AS DECIMAL(18,2)))", 10000) + " AS sxx",
    m2d("SUM(CAST(l_quantity AS DECIMAL(18,2)) * " +
      "CAST(l_quantity AS DECIMAL(18,2)))", 10000) + " AS syy",
    m2d("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "CAST(l_quantity AS DECIMAL(18,2)))", 10000) + " AS sxy").mkString(", ")

  val oracle: Map[String, String] = Map(
    // share is one exact integer-ratio division; rank ties break by key
    "q95_key_skew" ->
      ("WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events " +
        "  WHERE user_id IS NOT NULL GROUP BY user_id), " +
        "t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, " +
        "  COUNT(*) AS n_keys FROM c), " +
        "r AS (SELECT user_id, cnt, " +
        "  CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) AS share, n_keys, " +
        "  ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rnk FROM c, t) " +
        "SELECT user_id, cnt, share, n_keys, CAST(rnk AS INT) AS rnk " +
        "FROM r WHERE rnk <= 20"),
    // quantile_cont == Spark percentile at the dyadic 0.5 (see q48);
    // MIN() carries the per-group constants through the final agg exactly
    "q88_mad_outliers" ->
      ("WITH st AS (SELECT lang, len(string_split(text, ' ')) AS v " +
        "  FROM documents), " +
        "m AS (SELECT lang, quantile_cont(v, 0.5) AS med " +
        "  FROM st GROUP BY lang), " +
        "dv AS (SELECT st.lang, abs(CAST(v AS DOUBLE) - m.med) AS dev, m.med " +
        "  FROM st JOIN m ON st.lang = m.lang), " +
        "a AS (SELECT lang, MIN(med) AS med, quantile_cont(dev, 0.5) AS mad, " +
        "  COUNT(*) AS n_rows FROM dv GROUP BY lang) " +
        "SELECT dv.lang, MIN(a.med) AS med, MIN(a.mad) AS mad, " +
        "MIN(a.n_rows) AS n_rows, " +
        "CAST(SUM(CASE WHEN dv.dev > 3.0 * a.mad THEN 1 ELSE 0 END) AS BIGINT) " +
        "  AS n_outliers " +
        "FROM dv JOIN a ON dv.lang = a.lang GROUP BY dv.lang"),
    "q67_approx_distinct" ->
      ("SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact, " +
        "true AS within_bound FROM orders GROUP BY o_orderpriority"),
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
        "COUNT(*) AS n_rows FROM b GROUP BY bin"),
    "q62_null_profile" ->
      ("WITH d AS (SELECT c_custkey, " +
        "  CASE WHEN c_custkey % 3 <> 0 THEN c_name END AS name, " +
        "  CASE WHEN c_custkey % 7 <> 0 THEN c_acctbal END AS bal " +
        "  FROM customer) " +
        "SELECT 'c_custkey' AS col_name, " +
        "  CAST(COUNT(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT) AS n_null, " +
        "  COUNT(*) AS n_total FROM d " +
        "UNION ALL SELECT 'name', " +
        "  CAST(COUNT(*) FILTER (WHERE name IS NULL) AS BIGINT), COUNT(*) FROM d " +
        "UNION ALL SELECT 'bal', " +
        "  CAST(COUNT(*) FILTER (WHERE bal IS NULL) AS BIGINT), COUNT(*) FROM d"),
    "q63_snapshot_diff" ->
      ("WITH olds AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders), " +
        "news AS (SELECT o_orderkey, " +
        "  CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus, " +
        "  o_totalprice FROM orders WHERE o_orderkey % 10 <> 0 " +
        "  UNION ALL SELECT -o_orderkey, o_orderstatus, o_totalprice " +
        "  FROM orders WHERE o_orderkey % 13 = 0) " +
        "SELECT o_orderkey, op FROM (" +
        "  SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey, " +
        "  CASE WHEN o.o_orderkey IS NULL THEN 'insert' " +
        "    WHEN n.o_orderkey IS NULL THEN 'delete' " +
        "    WHEN NOT (o.o_orderstatus IS NOT DISTINCT FROM n.o_orderstatus) " +
        "      OR NOT (o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice) " +
        "    THEN 'update' END AS op " +
        "  FROM olds o FULL OUTER JOIN news n ON o.o_orderkey = n.o_orderkey) " +
        "WHERE op IS NOT NULL"))
}
