package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Checks, Diff}

/** Snapshot-diff and data-quality check semantics, including the null
  * transitions a naive `=!=` comparison silently misses.
  */
class DiffSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete and skips unchanged") {
    val old = Seq((1L, Option("a"), 10.0), (2L, Option("b"), 20.0),
      (3L, Option("c"), 30.0), (4L, Option.empty[String], 40.0))
      .toDF("k", "s", "v")
    val next = Seq(
      (1L, Option("a"), 10.0),      // unchanged -> not emitted
      (2L, Option("B"), 20.0),      // value change -> update
      (4L, Option("now"), 40.0),    // null -> value: update
      (5L, Option("new"), 50.0))    // insert; 3 deleted
      .toDF("k", "s", "v")
    val got = Diff.snapshotDiff(old, next, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 3L -> "delete",
      4L -> "update", 5L -> "insert"))
  }

  test("snapshotDiff flags value -> null transitions as updates") {
    val old = Seq((1L, Option("x"))).toDF("k", "s")
    val next = Seq((1L, Option.empty[String])).toDF("k", "s")
    val got = Diff.snapshotDiff(old, next, Seq("k"))
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "update")))
  }

  test("null-KEYED rows classify by presence, not key-null tests") {
    // a null-keyed old row matches nothing -> delete (the key-null
    // formulation would misreport it as an insert); present in both
    // snapshots -> one delete + one insert, as any keyed MERGE would
    val old = Seq((Option(1L), "a"), (Option.empty[Long], "ghost"))
      .toDF("k", "s")
    val next = Seq((Option(1L), "a"), (Option.empty[Long], "ghost"))
      .toDF("k", "s")
    val got = Diff.snapshotDiff(old, next, Seq("k"))
      .as[(Option[Long], String)].collect().toSeq.sortBy(_._2)
    assert(got == Seq((None, "delete"), (None, "insert")))

    val delOnly = Diff.snapshotDiff(
      Seq((Option.empty[Long], "x")).toDF("k", "s"),
      Seq.empty[(Option[Long], String)].toDF("k", "s"), Seq("k"))
      .as[(Option[Long], String)].collect().toSeq
    assert(delOnly == Seq((None, "delete")))
  }

  test("nullProfile reports 0 (not null) on an empty frame") {
    val empty = Seq.empty[(Long, Option[String])].toDF("k", "s")
    val got = Checks.nullProfile(empty, Seq("k", "s"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(("k", 0L, 0L), ("s", 0L, 0L)))
  }

  test("nullProfile counts per-column nulls in one pass") {
    val df = Seq((1L, Option("a"), Option(1.0)), (2L, Option.empty[String],
      Option.empty[Double]), (3L, Option("c"), Option.empty[Double]))
      .toDF("k", "s", "v")
    val got = Checks.nullProfile(df, Seq("k", "s", "v"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map("k" -> ((0L, 3L)), "s" -> ((1L, 3L)), "v" -> ((2L, 3L))))
  }

  test("duplicateKeys returns only violated keys with counts") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "p")
    val got = Checks.duplicateKeys(df, Seq("k"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }
}
