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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_tumbling_window" -> q28TumblingWindow _,
    "q29_sessionize" -> q29Sessionize _,
    "q39_sliding_window" -> q39SlidingWindow _)

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
    // each event belongs to the 4 sliding windows whose 15-min-aligned
    // starts cover it (Spark's window() origin and time_bucket agree:
    // both are whole-multiple-of-15-min aligned)
    "q39_sliding_window" ->
      ("WITH e AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS b FROM events), " +
        "w AS (SELECT b - k * INTERVAL '15 minutes' AS ws FROM e, range(0, 4) t(k)) " +
        "SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, " +
        "COUNT(*) AS n_events FROM w GROUP BY 1"))
}
