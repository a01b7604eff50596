package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

/** As-of join semantics against a hand-checked fixture: inclusive time
  * match, greatest-tiebreak resolution on time ties, inner semantics for
  * rows with no prior right row, and invariance to input partitioning
  * (the union+window composition must not depend on physical layout).
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // right: per-key versioned state (key, time, version id, value)
  private val right = Seq(
    (1L, ts("2024-01-10 00:00:00"), 100L, 10.0),
    (1L, ts("2024-01-20 00:00:00"), 101L, 20.0),
    (1L, ts("2024-01-20 00:00:00"), 102L, 21.0), // same time, higher id wins
    (2L, ts("2024-01-15 00:00:00"), 200L, 50.0)
  ).toDF("k", "t", "rid", "v")

  // left: lookups (id, key, time)
  private val left = Seq(
    (1L, 1L, ts("2024-01-05 00:00:00")), // before any right row -> dropped
    (2L, 1L, ts("2024-01-10 00:00:00")), // exactly at a right time -> inclusive
    (3L, 1L, ts("2024-01-15 00:00:00")), // between versions -> 100
    (4L, 1L, ts("2024-01-25 00:00:00")), // after the tie -> 102 (max rid)
    (5L, 2L, ts("2024-02-01 00:00:00")), // other key -> 200
    (6L, 3L, ts("2024-02-01 00:00:00"))  // key with no right rows -> dropped
  ).toDF("id", "k", "t")

  private val expected = Map(2L -> 100L, 3L -> 100L, 4L -> 102L, 5L -> 200L)

  test("as-of picks the latest right row at or before each left time") {
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t", "rid", Seq("rid", "v"))
      .select($"id", $"asof.rid".as("rid"), $"asof.v".as("v"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(out == expected)
  }

  test("as-of matches the SQL argmax reference on random keyed time series") {
    // seeded random fixtures with deliberate time ties and shared keys;
    // reference = per left row, the right row maximizing (time, tiebreak)
    // among same-key rows with time <= left time
    val rnd = new scala.util.Random(424242)
    for (trial <- 1 to 8) {
      val nKeys = 1 + rnd.nextInt(5)
      val right = Seq.fill(30)((rnd.nextInt(nKeys).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(20) * 3600000L),
        rnd.nextLong().abs % 1000, rnd.nextDouble()))
      val left = Seq.tabulate(40)(i => (i.toLong, rnd.nextInt(nKeys + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(22) * 3600000L)))
      val expected = left.flatMap { case (id, k, t) =>
        val q = right.filter(r => r._1 == k && !r._2.after(t))
        if (q.isEmpty) None
        else {
          val best = q.maxBy(r => (r._2.getTime, r._3))
          Some(id -> best._3)
        }
      }.toMap
      val got = AsOfJoin.asOf(
        left.toDF("id", "k", "t"), right.toDF("k", "t", "rid", "v"),
        "k", "k", "t", "t", "rid", Seq("rid"))
        .select($"id", $"asof.rid".as("rid"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("a null tiebreak loses time ties to any non-null tiebreak") {
    // SQL contract: ORDER BY time DESC, tiebreak DESC NULLS LAST LIMIT 1 —
    // the null-tb row wins only when it is the sole candidate
    val r = Seq(
      (1L, ts("2024-01-10 00:00:00"), Option.empty[Long], 1.0), // null tb
      (1L, ts("2024-01-10 00:00:00"), Option(7L), 2.0),
      (2L, ts("2024-01-10 00:00:00"), Option.empty[Long], 3.0)  // sole: wins
    ).toDF("k", "t", "rid", "v")
    val l = Seq((1L, 1L, ts("2024-01-15 00:00:00")),
      (2L, 2L, ts("2024-01-15 00:00:00"))).toDF("id", "k", "t")
    val out = AsOfJoin.asOf(l, r, "k", "k", "t", "t", "rid", Seq("v"))
      .select($"id", $"asof.v".as("v"))
      .as[(Long, Double)].collect().toMap
    assert(out == Map(1L -> 2.0, 2L -> 3.0))
  }

  test("null right keys/times never match (SQL comparison semantics)") {
    // a null-time right row would sort nulls-first ("older than all") and
    // a null-key right row would meet null-key left rows via partitionBy —
    // both must be invisible, exactly as in the equi-join formulation
    val nullishRight = right.union(Seq(
      (Option(1L), Option.empty[Timestamp], 999L, 99.0), // null time
      (Option.empty[Long], Option(ts("2024-01-01 00:00:00")), 998L, 98.0)
    ).toDF("k", "t", "rid", "v"))
    val nullKeyLeft = left.union(
      Seq((7L, Option.empty[Long], Option(ts("2024-02-01 00:00:00"))))
        .toDF("id", "k", "t"))
    val out = AsOfJoin
      .asOf(nullKeyLeft, nullishRight, "k", "k", "t", "t", "rid", Seq("rid", "v"))
      .select($"id", $"asof.rid".as("rid"))
      .as[(Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(out == expected) // ids 1, 6, 7 dropped; no 999/998 carries
  }

  test("as-of result is invariant to input partitioning") {
    val out = AsOfJoin.asOf(left.repartition(7), right.repartition(5),
      "k", "k", "t", "t", "rid", Seq("rid"))
      .select($"id", $"asof.rid".as("rid"))
      .as[(Long, Long)].collect().toMap
    assert(out == expected)
  }

  test("two-level carry matches single-level across bucket widths") {
    // the fixture exercises boundary cases (ties, inclusive match, empty
    // buckets between versions); widths from 1 hour (every row its own
    // bucket) to 10 years (everything in one bucket) must all agree
    for (bucketSec <- Seq(3600L, 86400L, 7L * 86400L, 365L * 86400L, 3650L * 86400L)) {
      val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t", "rid",
        Seq("rid", "v"), bucketSec = bucketSec)
        .select($"id", $"asof.rid".as("rid"))
        .as[(Long, Long)].collect().toMap
      assert(out == expected, s"bucketSec=$bucketSec")
    }
  }

  test("bucketWidthFor sizes the width to the hottest key, 0 when unskewed") {
    // hot key 1: 200 hourly rows over ~200h; key 2: 5 rows. target 50 →
    // the hot key should land in ≈ 4 buckets of ≈ 50 rows
    val rows = Seq.tabulate(200)(i =>
      (1L, new Timestamp(1700000000000L + i * 3600000L), i.toLong, 0.0)) ++
      Seq.tabulate(5)(i =>
        (2L, new Timestamp(1700000000000L + i * 3600000L), 900L + i, 0.0))
    val df = rows.toDF("k", "t", "rid", "v")
    // no key exceeds the target → single-level is the right plan
    assert(AsOfJoin.bucketWidthFor(df, "k", "t", targetRowsPerBucket = 200L) == 0L)
    val w = AsOfJoin.bucketWidthFor(df, "k", "t", targetRowsPerBucket = 50L)
    assert(w > 0L)
    // span = 199h; hot = 200 rows → width ≈ span/4: the hot key's history
    // splits into ~4 target-sized buckets (ceil'd, so 4 or 5)
    val span = 199L * 3600L
    val bucketsOfHot = (span + w - 1) / w
    assert(bucketsOfHot >= 3 && bucketsOfHot <= 5, s"width $w -> $bucketsOfHot buckets")
    // and the derived width preserves semantics like any other width
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t", "rid",
      Seq("rid"), bucketSec = AsOfJoin.bucketWidthFor(right, "k", "t", 2L))
      .select($"id", $"asof.rid".as("rid"))
      .as[(Long, Long)].collect().toMap
    assert(out == expected)
    // degenerate inputs: empty frame → 0 (nothing to bucket)
    assert(AsOfJoin.bucketWidthFor(df.limit(0), "k", "t") == 0L)
  }

  test("bucketWidthFor sizes to the hot key's OWN span, not the global one") {
    // hot key 1: 100 rows packed into 1 hour; cold key 2: 2 rows 10 years
    // apart. A global-span derivation would hand back ~years-wide buckets
    // and the hot key's whole history would still funnel through one task;
    // the per-key form must split the hot hour into ~10 target-10 buckets.
    val rows = Seq.tabulate(100)(i =>
      (1L, new Timestamp(1700000000000L + i * 36000L), i.toLong, 0.0)) ++
      Seq((2L, new Timestamp(1400000000000L), 900L, 0.0),
        (2L, new Timestamp(1700000000000L), 901L, 0.0))
    val w = AsOfJoin.bucketWidthFor(rows.toDF("k", "t", "rid", "v"), "k", "t",
      targetRowsPerBucket = 10L)
    val hotSpanSec = 99L * 36L // 99 gaps x 36s
    assert(w > 0L && w <= hotSpanSec / 5,
      s"width $w not sized to the hot key's ${hotSpanSec}s span")
    val bucketsOfHot = (hotSpanSec + w - 1) / w
    assert(bucketsOfHot >= 8 && bucketsOfHot <= 12,
      s"width $w -> $bucketsOfHot buckets of the hot hour")
  }

  test("two-level carry matches the argmax reference on random hot-key series") {
    // one hot key holds ~all rows — the skew case the bucketing exists for;
    // correctness must be unchanged and ties must resolve identically
    val rnd = new scala.util.Random(99173)
    for (trial <- 1 to 4) {
      val right = Seq.fill(400)((if (rnd.nextInt(10) == 0) 2L else 1L,
        new Timestamp(1700000000000L + rnd.nextInt(200) * 3600000L),
        rnd.nextLong().abs % 1000, rnd.nextDouble()))
      val left = Seq.tabulate(300)(i => (i.toLong,
        if (rnd.nextInt(10) == 0) 2L else 1L,
        new Timestamp(1700000000000L + rnd.nextInt(220) * 3600000L)))
      val expected = left.flatMap { case (id, k, t) =>
        val q = right.filter(r => r._1 == k && !r._2.after(t))
        if (q.isEmpty) None else Some(id -> q.maxBy(r => (r._2.getTime, r._3))._3)
      }.toMap
      val got = AsOfJoin.asOf(
        left.toDF("id", "k", "t"), right.toDF("k", "t", "rid", "v"),
        "k", "k", "t", "t", "rid", Seq("rid"), bucketSec = 6L * 3600L)
        .select($"id", $"asof.rid".as("rid"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("two-level carry windows partition by (key, bucket), never key alone") {
    // the skew guarantee is a PLAN property: every window over the unioned
    // rows must include the bucket in its partition spec, so no task can be
    // handed a hot key's full history (the boundary-carry window partitions
    // by key alone, but its rows are one per (key, bucket) — bounded by the
    // time span, not the row count)
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t", "rid",
      Seq("rid"), bucketSec = 86400L)
    val plan = out.queryExecution.optimizedPlan.toString
    val windowSpecs = plan.linesIterator
      .filter(_.contains("windowspecdefinition(")).toSeq
    assert(windowSpecs.nonEmpty)
    val rowCarries = windowSpecs.filter(l => l.contains("__t#") && l.contains("last("))
    assert(rowCarries.nonEmpty, s"no running-carry window found in:\n$plan")
    rowCarries.foreach { l =>
      assert(l.contains("__b#"),
        s"row-level carry window not bucket-partitioned:\n$l")
    }
  }

  test("as-of carries every requested right column and keeps left schema") {
    val out = AsOfJoin.asOf(left, right, "k", "k", "t", "t", "rid", Seq("rid", "v"))
    assert(out.columns.toSeq == Seq("id", "k", "t", "asof"))
    val v4 = out.filter($"id" === 4L).select($"asof.v").as[Double].head()
    assert(v4 == 21.0)
  }
}
