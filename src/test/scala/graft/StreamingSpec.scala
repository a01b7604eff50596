package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** Incremental execution of the stream operators: windowed aggregation over
  * a memory stream, custom-state sessionization (flatMapGroupsWithState +
  * event-time timeout), equivalence with the built-in session_window, and
  * AvailableNow exactly-once file ingestion.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, ts(t), user, typ, v)

  test("tumbling window aggregates a memory stream incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams
      .tumblingTypeCounts(in.toDF(), streaming = true)
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:45:00", 2, "click", 2.0),
        ev(3, "2024-01-01 11:05:00", 1, "view", 4.0))
      q.processAllAvailable()
      in.addData(ev(4, "2024-01-01 10:59:00", 3, "click", 8.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .orderBy("window_start", "event_type")
        .as[(String, String, Long, Double)].collect().toSeq
      assert(rows == Seq(
        ("2024-01-01 10:00:00", "click", 3L, 11.0),
        ("2024-01-01 11:00:00", "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState running totals refresh per batch and accumulate") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams
      .runningUserTotals(in.toDS(), idleMs = 60 * 60 * 1000,
        lateness = "0 seconds")
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:10:00", 1, "click", 2.0),
        ev(3, "2024-01-01 10:05:00", 2, "view", 4.0))
      q.processAllAvailable()
      in.addData(ev(4, "2024-01-01 11:30:00", 1, "click", 8.0))
      q.processAllAvailable()
      // update-mode memory sink keeps each batch's refreshed rows: user 1
      // appears once per batch with its cumulative totals at that point
      val rows = spark.table("totals")
        .as[EventStreams.UserTotals].collect()
        .map(t => (t.user_id, t.n_events, t.total_value)).toSet
      assert(rows == Set((1L, 2L, 3.0), (2L, 1L, 4.0), (1L, 3L, 11.0)))
      // sentinel advances the watermark past every idle deadline; the next
      // batch flushes-and-evicts both keys (the flush rows repeat the
      // latest totals, so the distinct set is unchanged except user 99)
      in.addData(ev(5, "2024-01-02 20:00:00", 99, "click", 0.0))
      q.processAllAvailable()
      in.addData(ev(6, "2024-01-02 20:00:01", 99, "click", 0.0))
      q.processAllAvailable()
      val afterFlush = spark.table("totals")
        .as[EventStreams.UserTotals].collect()
        .filter(_.user_id < 99)
        .map(t => (t.user_id, t.n_events, t.total_value))
      // eviction flush re-emits each key's final totals exactly once
      assert(afterFlush.count(_ == ((1L, 3L, 11.0))) == 2) // update + flush
      assert(afterFlush.count(_ == ((2L, 1L, 4.0))) == 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap and timeout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams
      .sessionizeWithState(in.toDS(), gapMs = 30 * 60 * 1000, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: session A (10:00, 10:10); user 2: session C (10:05)
      in.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:10:00", 1, "click", 2.0),
        ev(3, "2024-01-01 10:05:00", 2, "view", 4.0))
      q.processAllAvailable()
      // user 1 again at 11:30 -> gap closes session A inline, opens B
      in.addData(ev(4, "2024-01-01 11:30:00", 1, "click", 8.0))
      q.processAllAvailable()
      // sentinel far in the future advances the watermark; next batch fires
      // the event-time timeouts for B and C
      in.addData(ev(5, "2024-01-01 20:00:00", 99, "click", 0.0))
      q.processAllAvailable()
      in.addData(ev(6, "2024-01-01 20:00:01", 99, "click", 0.0))
      q.processAllAvailable()

      val sessions = spark.table("sessions").as[Session].collect()
        .filter(_.user_id < 99).sortBy(s => (s.user_id, s.session_start.getTime))
      assert(sessions.map(s => (s.user_id, s.n_events, s.total_value)).toSeq ==
        Seq((1L, 2L, 3.0), (1L, 1L, 8.0), (2L, 1L, 4.0)))
      assert(sessions.head.session_start == ts("2024-01-01 10:00:00"))
      assert(sessions.head.session_end == ts("2024-01-01 10:10:00"))
    } finally q.stop()
  }

  test("custom-state sessions match built-in session_window on the same data") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:10:00", 1, "click", 2.0),
      ev(3, "2024-01-01 11:30:00", 1, "click", 8.0),
      ev(4, "2024-01-01 10:05:00", 2, "view", 4.0),
      ev(5, "2024-01-01 10:20:00", 2, "view", 16.0))
    val builtin = EventStreams.sessionize(events.toDF())
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSet

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams
      .sessionizeWithState(in.toDS(), gapMs = 30 * 60 * 1000, lateness = "0 seconds")
      .writeStream.format("memory").queryName("sessions_eq")
      .outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      in.addData(ev(6, "2024-01-02 00:00:00", 99, "click", 0.0))
      q.processAllAvailable()
      in.addData(ev(7, "2024-01-02 00:00:01", 99, "click", 0.0))
      q.processAllAvailable()
      val custom = spark.table("sessions_eq").as[Session].collect()
        .filter(_.user_id < 99)
        .map(s => (s.user_id, s.n_events, s.total_value)).toSet
      assert(custom == builtin)
    } finally q.stop()
  }

  test("dedupStream drops watermark-window duplicates, evicts expired state") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = EventStreams
      .dedupStream(in.toDF(), Seq("event_id"), lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(1, "2024-01-01 10:00:30", 1, "click", 1.0), // same-batch dup
        ev(2, "2024-01-01 10:01:00", 2, "view", 2.0))
      q.processAllAvailable()
      // cross-batch dup within the watermark window: dropped
      in.addData(
        ev(1, "2024-01-01 10:02:00", 1, "click", 1.0),
        ev(3, "2024-01-01 11:00:00", 3, "click", 4.0))
      q.processAllAvailable()
      // advance the watermark far past id 1's expiry (10:10) so its state
      // is evicted — bounded state is the point of the operator
      in.addData(ev(4, "2024-01-01 12:00:00", 4, "click", 8.0))
      q.processAllAvailable()
      // id 1 reappears AFTER eviction with a live timestamp: re-emitted
      // (dedup is guaranteed within the watermark, not across all time)
      in.addData(ev(1, "2024-01-01 11:59:00", 1, "click", 1.0))
      q.processAllAvailable()

      val ids = spark.table("dedup").select("event_id")
        .as[Long].collect().toSeq.sorted
      assert(ids == Seq(1L, 1L, 2L, 3L, 4L))
    } finally q.stop()
  }

  test("enrichStream broadcast-joins a dimension onto a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[Event]
    val q = EventStreams.enrichStream(in.toDF(), dim, "user_id")
      .select("event_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData(
        ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
        ev(2, "2024-01-01 10:01:00", 2, "view", 2.0),
        ev(3, "2024-01-01 10:02:00", 9, "view", 4.0)) // no dim row
      q.processAllAvailable()
      val got = spark.table("enriched").as[(Long, Option[String])]
        .collect().toMap
      assert(got == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
    } finally q.stop()
  }

  test("dedupAgainstIndex admits only fingerprints absent from history") {
    implicit val sqlCtx = spark.sqlContext
    val history = Seq("seen before", "also   SEEN Before").toDF("text")
    val index = graft.ops.Dedup.fingerprintIndex(history, "text")
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val q = EventStreams.dedupAgainstIndex(stream, index, "text")
      .writeStream.format("memory").queryName("fresh_docs")
      .outputMode("append").start()
    try {
      in.addData(
        1L -> "seen before",        // exact historical dup
        2L -> "Seen    BEFORE",     // canonical-form dup (case/whitespace)
        3L -> "genuinely new text")
      q.processAllAvailable()
      // second microbatch: history is consulted again, within-batch
      // novelty is per the index only
      in.addData(4L -> "also seen before", 5L -> "another new one")
      q.processAllAvailable()
      val got = spark.table("fresh_docs").select("doc_id")
        .as[Long].collect().toSet
      assert(got == Set(3L, 5L))
    } finally q.stop()
  }

  test("streaming curation chain: length gate + index dedup compose on a stream") {
    // the batch curation recipe's streaming form: per-microbatch map-only
    // quality gate, then the stream-static anti-join against history —
    // chained streaming-safe operators, one query
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val history = Seq("previously ingested document text here ok")
      .toDF("text")
    val index = graft.ops.Dedup.fingerprintIndex(history, "text")
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
      .where(graft.ops.TextAnalysis.tokenCount(col("text")).between(3, 50))
    val q = EventStreams.dedupAgainstIndex(stream, index, "text")
      .writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      in.addData(
        1L -> "previously ingested DOCUMENT text here ok", // dup of history
        2L -> "too short",                                 // fails gate
        3L -> "a genuinely new document that passes the gate")
      q.processAllAvailable()
      val got = spark.table("curated").select("doc_id")
        .as[Long].collect().toSet
      assert(got == Set(3L))
    } finally q.stop()
  }

  test("classifier quality gate scores a stream identically to batch") {
    // model-based filtering is MAP-ONLY (the score folds inside each row),
    // so it passes through Structured Streaming stateless — per-microbatch
    // inference with zero stream state, and the streamed verdicts must be
    // bit-identical to the batch operator on the same rows
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "spark scan agg join shuffle",
      3L -> "a b a b a b a b")
    val in = MemoryStream[(Long, String)]
    val q = graft.ops.Classifier.scoreDocs(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", 64, 7L)
      .writeStream.format("memory").queryName("clf")
      .outputMode("append").start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("clf")
        .as[(Long, Long, Long, Boolean)].collect().toSet
      val batch = graft.ops.Classifier.scoreDocs(
          docs.toDF("doc_id", "text"), "doc_id", "text", 64, 7L)
        .as[(Long, Long, Long, Boolean)].collect().toSet
      assert(streamed == batch && streamed.size == 3)
    } finally q.stop()
  }

  test("intervalJoinStreams pairs same-key events within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val v = views.toDF().select(col("event_id").as("v_id"),
      col("ts").as("v_ts"), col("user_id").as("v_user"))
    val q = EventStreams.intervalJoinStreams(
      clicks.toDF(), v, "user_id", "v_user", "ts", "v_ts",
      within = "5 MINUTES", lateness = "1 minute")
      .select("event_id", "v_id")
      .writeStream.format("memory").queryName("paired")
      .outputMode("append").start()
    try {
      clicks.addData(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0))
      views.addData(
        ev(100, "2024-01-01 10:03:00", 1, "view", 0.0), // within 5 min: pair
        ev(101, "2024-01-01 10:30:00", 1, "view", 0.0), // outside: no pair
        ev(102, "2024-01-01 10:04:00", 2, "view", 0.0)) // other key: no pair
      q.processAllAvailable()
      // advance both watermarks so results flush in append mode
      clicks.addData(ev(5, "2024-01-01 12:00:00", 99, "click", 0.0))
      views.addData(ev(105, "2024-01-01 12:00:00", 99, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("paired").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 100L)))
      assert(!got.exists(p => p._2 == 101L || p._2 == 102L))
    } finally q.stop()
  }

  test("AvailableNow file source processes each file exactly once across runs") {
    val dir = Files.createTempDirectory("graft_stream_in").toString
    val checkpoint = Files.createTempDirectory("graft_stream_cp").toString
    val outDir = Files.createTempDirectory("graft_stream_out").toString
    val schema = Seq(ev(0, "2024-01-01 00:00:00", 0, "x", 0.0)).toDS().schema

    def runOnce(): Long = {
      val q = EventStreams.incrementalFileSource(spark, schema, dir)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir).count()
    }

    Seq(ev(1, "2024-01-01 10:00:00", 1, "a", 1.0),
      ev(2, "2024-01-01 10:01:00", 2, "b", 2.0))
      .toDS().write.mode("append").parquet(dir)
    assert(runOnce() == 2)

    Seq(ev(3, "2024-01-01 10:02:00", 3, "c", 3.0))
      .toDS().write.mode("append").parquet(dir)
    // second run with the same checkpoint processes ONLY the new file:
    // cumulative sink row count is 3, not 5
    assert(runOnce() == 3)
  }
}
