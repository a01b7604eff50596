package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.RangeJoin

/** Binned interval-join semantics: half-open boundary behavior, bin-crossing
  * correctness, and equality with the naive (nested-loop) range join on a
  * corpus dense enough to exercise every bin-alignment case.
  */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("window is inclusive at start, exclusive at end") {
    val intervals = Seq((1L, ts("2024-01-01 00:00:00")))
      .toDF("iv_id", "start")
    val points = Seq(
      (10L, ts("2023-12-31 23:59:59.999999")), // 1µs before start
      (11L, ts("2024-01-01 00:00:00")),        // == start: in
      (12L, ts("2024-01-01 00:59:59.999999")), // last µs inside: in
      (13L, ts("2024-01-01 01:00:00")))        // == end: out
      .toDF("p_id", "at")
    val got = RangeJoin
      .pointInInterval(intervals, points, "start", widthSec = 3600, pointCol = "at")
      .select("p_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(11L, 12L))
  }

  test("intervals crossing a bin boundary catch points in both bins") {
    // bin = width = 1h; an interval starting at :30 spans two bins
    val intervals = Seq((1L, ts("2024-01-01 00:30:00"))).toDF("iv_id", "start")
    val points = Seq(
      (10L, ts("2024-01-01 00:45:00")), // first bin
      (11L, ts("2024-01-01 01:15:00")), // second bin
      (12L, ts("2024-01-01 01:31:00"))) // second bin, past the window
      .toDF("p_id", "at")
    val got = RangeJoin
      .pointInInterval(intervals, points, "start", 3600, "at")
      .select("p_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(10L, 11L))
  }

  test("binned join equals the naive range join on dense random-ish data") {
    // 200 intervals × 500 points over 3 days, 2h windows: plenty of
    // aligned/crossing/empty/multi-match cases
    val base = ts("2024-01-01 00:00:00").getTime
    val intervals = (0 until 200)
      .map(i => (i.toLong, new Timestamp(base + i * 19 * 60000L)))
      .toDF("iv_id", "start")
    val points = (0 until 500)
      .map(i => (i.toLong, new Timestamp(base + i * 7 * 60000L + i % 13)))
      .toDF("p_id", "at")
    val got = RangeJoin
      .pointInInterval(intervals, points, "start", widthSec = 7200, pointCol = "at")
      .select("iv_id", "p_id").as[(Long, Long)].collect().toSet
    val naive = intervals.crossJoin(points)
      .where(col("at") >= col("start") &&
        col("at") < col("start") + expr("INTERVAL 2 HOURS"))
      .select("iv_id", "p_id").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }

  test("pre-epoch timestamps bin correctly (floor, not truncate-toward-zero)") {
    // 1965: negative epoch micros. Truncating division would round the bin
    // UP for negatives, shifting the interval's bin range off by one and
    // silently losing matches at bin boundaries.
    val intervals = Seq((1L, ts("1965-06-01 23:30:00"))).toDF("iv_id", "start")
    val points = Seq(
      (10L, ts("1965-06-01 23:30:00")), // == start: in
      (11L, ts("1965-06-02 00:15:00")), // next day, inside window: in
      (12L, ts("1965-06-02 00:30:00")), // == end: out
      (13L, ts("1965-06-01 23:29:59"))) // before: out
      .toDF("p_id", "at")
    val got = RangeJoin
      .pointInInterval(intervals, points, "start", widthSec = 3600, pointCol = "at")
      .select("p_id").as[Long].collect().sorted
    assert(got.toSeq == Seq(10L, 11L))
  }

  test("a sub-width bin explodes intervals wider but finds the same pairs") {
    val intervals = Seq((1L, ts("2024-01-01 00:30:00"))).toDF("iv_id", "start")
    val points = Seq(
      (10L, ts("2024-01-01 00:30:00")),
      (11L, ts("2024-01-01 02:29:59")),
      (12L, ts("2024-01-01 02:30:00"))).toDF("p_id", "at")
    for (bin <- Seq(600L, 3600L, 7200L, 10000L)) {
      val got = RangeJoin
        .pointInInterval(intervals, points, "start", 7200, "at", binSec = bin)
        .select("p_id").as[Long].collect().sorted
      assert(got.toSeq == Seq(10L, 11L), s"binSec=$bin")
    }
  }
}
