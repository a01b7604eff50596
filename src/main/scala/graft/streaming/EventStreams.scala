package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{DecimalType, StructType}

/** Event-stream operators (engine extension — the reference's "daily
  * update" is scheduled batch, SURVEY §2.3 note; these are the Structured
  * Streaming upgrades a real deployment of the same pipelines needs).
  *
  * Every transform here is defined once over a DataFrame and works in BOTH
  * batch and streaming mode — the standard Structured Streaming contract —
  * so the DuckDB oracle validates the batch semantics while StreamingSpec
  * validates incremental execution, watermarking, and state.
  */
object EventStreams {

  /** Tumbling-window aggregate per event type: one shuffle on (window,
    * type); in streaming mode the watermark bounds state and admits
    * late data up to `lateness`.
    */
  def tumblingTypeCounts(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes", streaming: Boolean = false): DataFrame = {
    val base = if (streaming) events.withWatermark("ts", lateness) else events
    base
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Sliding-window event rate (hour window, 15-minute slide): the Expand
    * node emits one row per overlapping window, then a single shuffle.
    */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"))

  /** Per-user sessionization via the built-in `session_window` (gap-merged
    * event-time sessions — state-backed in streaming, plain aggregation in
    * batch). Output: one row per (user, session).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes", streaming: Boolean = false): DataFrame = {
    val base = if (streaming) events.withWatermark("ts", lateness) else events
    base
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"), col("total_value"))
  }

  /** One event row for the typed custom-state path. */
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** One closed session. */
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Open-session accumulator (public: the state encoder's generated code
    * must construct and read it).
    */
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * `KeyValueGroupedDataset` escape hatch for session logic the built-in
    * `session_window` can't express (here: same gap semantics, so
    * StreamingSpec can cross-check the two). Event-time timeout closes a
    * session once the watermark passes last-event + gap.
    */
  def sessionizeWithState(events: Dataset[Event], gapMs: Long,
      lateness: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, new Timestamp(s.start),
              new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed ::= Session(user, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Live running totals for one user — emitted every time the user's
    * state changes (update mode), plus one final flush when the idle
    * timeout evicts the state.
    */
  final case class UserTotals(user_id: Long, n_events: Long,
      total_value: Double, last_ts: Timestamp)

  /** Per-user running accumulator (public for the state encoder). */
  final case class TotalsState(n: Long, total: Double, last: Long)

  /** Live per-key running counters via `mapGroupsWithState` — the
    * dashboard-counter workload (`flatMapGroupsWithState`'s append-mode
    * sibling [[sessionizeWithState]] emits CLOSED units; this emits the
    * CURRENT total on every update). Each microbatch folds its events
    * into the key's state and emits one refreshed row per touched key.
    *
    * State is bounded by an EVENT-time idle timeout: once the watermark
    * passes a key's last event + `idleMs`, the key is flushed once more
    * and evicted, so the operator runs forever on working-set-sized
    * state. Event time (not processing time) keeps eviction
    * replay-deterministic — and a processing-time timeout would make the
    * engine schedule timeout-check microbatches continuously even with no
    * data. Arrival-order semantics (no deterministic SQL twin); the
    * deterministic batch equivalent is a plain groupBy-agg (q03/q33).
    */
  def runningUserTotals(events: Dataset[Event], idleMs: Long,
      lateness: String = "10 minutes"): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .mapGroupsWithState[TotalsState, UserTotals](
        GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[TotalsState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserTotals(user, s.n, s.total, new Timestamp(s.last))
          } else {
            val s = rows.foldLeft(
              state.getOption.getOrElse(TotalsState(0L, 0.0, 0L))) { (acc, e) =>
              TotalsState(acc.n + 1, acc.total + e.value,
                math.max(acc.last, e.ts.getTime))
            }
            state.update(s)
            state.setTimeoutTimestamp(s.last + idleMs)
            UserTotals(user, s.n, s.total, new Timestamp(s.last))
          }
      }
  }

  /** Streaming exact dedup on the given columns with state bounded by the
    * watermark: a duplicate arriving within `lateness` of the original's
    * event time is dropped; state for older keys is evicted, so the
    * operator runs forever on bounded memory (an unbounded
    * `dropDuplicates` would grow state monotonically — the classic
    * streaming-dedup leak). Exactly-once file/replay duplicates land well
    * inside any sane watermark, which is the case this exists for.
    *
    * Keep-FIRST-ARRIVAL semantics (processing order, not event order) —
    * inherently nondeterministic under reordering, so there is no DuckDB
    * oracle entry; the deterministic batch equivalent is the keyed
    * keep-first dedup (q17, [[graft.ops.Dedup.keepFirst]]).
    * StreamingSpec drives duplicates across microbatches and past the
    * watermark to pin both the dropping and the state eviction.
    */
  def dedupStream(events: DataFrame, cols: Seq[String],
      lateness: String = "10 minutes", tsCol: String = "ts"): DataFrame =
    events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(cols.head, cols.tail: _*)

  /** Stream-static enrichment: join a stream against a (small, slowly
    * changing) dimension frame. The static side plans a broadcast hash
    * join per microbatch — no stream state, no watermark needed, late
    * data irrelevant (the static side is re-resolvable at any time).
    * This is the streaming form of the reference's key-reconciliation
    * lookup (SURVEY §2 Q7) for continuously arriving deltas.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left_outer")

  /** Streaming ingest dedup against the corpus's historical fingerprint
    * index ([[graft.ops.Dedup.fingerprintIndex]] schema: fp): admit only
    * batch rows whose canonical fingerprint is absent from the index —
    * the streaming form of the incremental batch dedup (q83), for a
    * corpus that grows continuously instead of by daily files. The
    * anti-join is stream-static: re-planned per microbatch against the
    * (re-resolvable) index, no stream state, no watermark. Within-batch
    * duplicates are NOT collapsed here — compose with [[dedupStream]]
    * upstream when arrival duplicates matter; this operator's contract is
    * exactly "new versus history".
    */
  def dedupAgainstIndex(stream: DataFrame, index: DataFrame,
      textCol: String): DataFrame = {
    val fp = "__graft_fp"
    stream
      .withColumn(fp, graft.ops.TextAnalysis.fingerprint(col(textCol)))
      .join(index.select(col("fp").as(fp)), Seq(fp), "left_anti")
      .drop(fp)
  }

  /** Stream-stream interval join: pair each left event with right events
    * of the same key whose time lies within `[leftTime - within,
    * leftTime + within]`. BOTH sides are watermarked — that is what lets
    * Spark bound the buffered state: a right row can be evicted once the
    * left watermark passes `rightTime + within`, and vice versa; without
    * the time-range predicate the state would grow forever. The range
    * condition also serves as the pruning predicate inside the
    * symmetric-hash join, so per-key buffers stay small.
    *
    * Column names: pass disambiguated frames (e.g. suffix the right side)
    * — the join condition references both sides' time columns by name.
    */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      within: String, lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTime, lateness)
    val r = right.withWatermark(rightTime, lateness)
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
        s"$rightTime BETWEEN $leftTime - INTERVAL $within " +
        s"AND $leftTime + INTERVAL $within"))
  }

  /** Incremental file-source ingest with `Trigger.AvailableNow` — the
    * streaming upgrade of the daily-delta pipeline (SURVEY §1.4): each
    * invocation processes exactly the files that arrived since the last
    * checkpoint, then stops. Returns the streaming DataFrame; callers
    * attach the same batch transforms and a sink.
    */
  def incrementalFileSource(spark: SparkSession, schema: StructType,
      dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(schema).format(format).load(dir)
}
