package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Tables
import graft.streaming.EventStreams

/** Oracle-checked batch runs of the stream operators over the `events`
  * table — the same DataFrame transforms StreamingSpec drives
  * incrementally (Structured Streaming's batch/stream unification is the
  * point: one definition, two execution modes).
  */
object EventOps {

  /** Tumbling 1-hour window × event_type aggregate. */
  private def q28TumblingWindow(s: SparkSession, d: String): DataFrame =
    EventStreams.tumblingTypeCounts(Tables.events(s, d))

  /** Per-user 30-minute-gap sessionization via session_window. */
  private def q29Sessionize(s: SparkSession, d: String): DataFrame =
    EventStreams.sessionize(Tables.events(s, d))

  /** Sliding 1-hour windows on a 15-minute slide: Spark's Expand node emits
    * one row per overlapping window (4 here), then one shuffle.
    */
  private def q39SlidingWindow(s: SparkSession, d: String): DataFrame =
    EventStreams.slidingCounts(Tables.events(s, d))

  /** Weekly cohort retention: users grouped by first-seen week, distinct
    * active users per (cohort, weeks-since-cohort) cell — the standard
    * product-analytics retention triangle. Weeks are integer epoch-week
    * ids (`unix_seconds div 604800`), never raw timestamps, so the hash
    * is engine-exact. Two shuffles: the per-user min, the cell count.
    */
  private def q80CohortRetention(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val weeks = Tables.events(s, d)
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 604800").as("week"))
      .distinct()
    val cohorts = weeks.groupBy("user_id")
      .agg(min(col("week")).as("cohort_week"))
    weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Ordered conversion funnel signup → click → purchase: per user the
    * earliest time of each stage, then how many users reach each stage IN
    * ORDER. Timestamps only flow through MIN and comparisons (never into
    * the output), so the single-row result is engine-exact. One shuffle
    * (per-user min-agg); the final count is a grand aggregate.
    */
  private def q81Funnel(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    def stage(t: String) = min(when(col("event_type") === t, col("ts")))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(stage("signup").as("t1"), stage("click").as("t2"),
        stage("purchase").as("t3"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("t1") < col("t2"), 1L).otherwise(0L)).as("n_signup_click"),
        sum(when(col("t1") < col("t2") && col("t2") < col("t3"), 1L)
          .otherwise(0L)).as("n_full_funnel"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_tumbling_window" -> q28TumblingWindow _,
    "q29_sessionize" -> q29Sessionize _,
    "q39_sliding_window" -> q39SlidingWindow _,
    "q80_cohort_retention" -> q80CohortRetention _,
    "q81_funnel" -> q81Funnel _)

  val oracle: Map[String, String] = Map(
    "q28_tumbling_window" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, " +
        "event_type, COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM events GROUP BY 1, 2"),
    // gap-based sessions: a new session starts when the gap to the previous
    // event is >= 30 min (session_window's window end is exclusive)
    "q29_sessionize" ->
      ("WITH x AS (SELECT user_id, ts, value, " +
        "CASE WHEN LAG(ts) OVER w IS NULL " +
        "  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s " +
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
        "y AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS sid FROM x) " +
        "SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, " +
        "COUNT(*) AS n_events, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM y GROUP BY user_id, sid"),
    // FLOOR(epoch()) matches unix_timestamp's truncation for the
    // post-epoch data; // matches div on non-negative weeks
    "q80_cohort_retention" ->
      ("WITH w AS (SELECT DISTINCT user_id, " +
        "  CAST(FLOOR(epoch(ts)) AS BIGINT) // 604800 AS week FROM events), " +
        "c AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY user_id) " +
        "SELECT c.cohort_week, w.week - c.cohort_week AS week_offset, " +
        "COUNT(DISTINCT w.user_id) AS n_users " +
        "FROM w JOIN c ON w.user_id = c.user_id " +
        "GROUP BY c.cohort_week, w.week - c.cohort_week"),
    "q81_funnel" ->
      ("WITH s AS (SELECT user_id, " +
        "  MIN(ts) FILTER (WHERE event_type = 'signup') AS t1, " +
        "  MIN(ts) FILTER (WHERE event_type = 'click') AS t2, " +
        "  MIN(ts) FILTER (WHERE event_type = 'purchase') AS t3 " +
        "  FROM events GROUP BY user_id) " +
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_users, " +
        "CAST(SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup, " +
        "CAST(SUM(CASE WHEN t1 < t2 THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click, " +
        "CAST(SUM(CASE WHEN t1 < t2 AND t2 < t3 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel " +
        "FROM s"),
    // each event belongs to the 4 sliding windows whose 15-min-aligned
    // starts cover it (Spark's window() origin and time_bucket agree:
    // both are whole-multiple-of-15-min aligned)
    "q39_sliding_window" ->
      ("WITH e AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS b FROM events), " +
        "w AS (SELECT b - k * INTERVAL '15 minutes' AS ws FROM e, range(0, 4) t(k)) " +
        "SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, " +
        "COUNT(*) AS n_events FROM w GROUP BY 1"))
}
