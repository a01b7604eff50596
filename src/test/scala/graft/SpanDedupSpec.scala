package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SpanDedup

/** Exact-substring span removal semantics: canonical-first retention,
  * interval coalescing across overlapping duplicated windows, within-doc
  * repeats, short-doc passthrough, and partitioning-independence.
  */
class SpanDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // w=5 keeps fixtures readable; the operator is width-generic
  private val w = 5

  private def run(rows: Seq[(Long, String)], width: Int = w) =
    SpanDedup.removeDuplicateSpans(rows.toDF("doc_id", "text"),
      "doc_id", "text", width)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("cross-doc shared run is cut from the later doc only, as one span") {
    val shared = "s1 s2 s3 s4 s5 s6 s7 s8" // 8 tokens >= w
    val a = s"a1 a2 $shared a3 a4"
    val b = s"b1 b2 b3 $shared b4"
    val out = run(Seq(1L -> a, 2L -> b))
    // doc 1 is canonical: untouched
    assert(out(1L) == ((a, 12L, 0L)))
    // doc 2: the 4 flagged windows merge to exactly the 8 shared tokens
    assert(out(2L) == (("b1 b2 b3 b4", 4L, 8L)))
  }

  test("within-doc repeat keeps the first occurrence") {
    val run1 = "p q r s t"
    val doc = s"$run1 x1 x2 x3 $run1 y1"
    val out = run(Seq(7L -> doc))
    assert(out(7L) == ((s"$run1 x1 x2 x3 y1", 9L, 5L)))
  }

  test("docs shorter than w pass through unchanged") {
    val out = run(Seq(1L -> "a b c", 2L -> "a b c"))
    assert(out(1L) == (("a b c", 3L, 0L)))
    assert(out(2L) == (("a b c", 3L, 0L)))
  }

  test("doc that is entirely a duplicate span is emptied, row preserved") {
    val shared = "z1 z2 z3 z4 z5 z6"
    val out = run(Seq(1L -> s"k1 $shared k2", 2L -> shared))
    assert(out(2L) == (("", 0L, 6L)))
    assert(out(1L)._3 == 0L)
  }

  test("map-side rebuild: consecutive-space (empty) tokens survive exactly") {
    // r21 rebuild internals: the clean-doc path must be the string
    // identity (split-on-space/join-by-space preserves empty tokens), and
    // a flagged doc's positional cut must count empty tokens like any
    // other token — the explode/re-collect form it replaced did
    val shared = "c1 c2 c3 c4 c5 c6"
    val clean = "a1  a2 a3" // double space: tokens [a1, "", a2, a3]
    val flaggedDoc = s"x1  $shared x2" // empty token at pos 2, cut at 3..8
    val out = run(Seq(1L -> clean, 2L -> s"h1 $shared h2", 3L -> flaggedDoc))
    assert(out(1L) == ((clean, 4L, 0L)))
    assert(out(3L) == (("x1  x2", 3L, 6L)))
  }

  test("adjacent duplicated runs coalesce into one interval") {
    // doc 2 copies two different spans of doc 1 back to back: the merged
    // cut is contiguous, and surviving text keeps original order
    val s1 = "m1 m2 m3 m4 m5"
    val s2 = "n1 n2 n3 n4 n5"
    val out = run(Seq(1L -> s"$s1 q1 q2 $s2", 2L -> s"u1 $s1 $s2 u2"))
    assert(out(2L) == (("u1 u2", 2L, 10L)))
  }

  test("duplicationProfile counts shared and repeated windows") {
    val rows = Seq(
      1L -> "s1 s2 s3 s4 s5 a1", // shares its first window with doc 2
      2L -> "b1 s1 s2 s3 s4 s5",
      3L -> "u1 u2 u3 u4 u5",    // unique single window
      4L -> "x y")               // shorter than w: zero windows
    val out = SpanDedup.duplicationProfile(rows.toDF("doc_id", "text"),
      "doc_id", "text", w)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out(1L) == ((2L, 1L, 2L, 0.5)))
    assert(out(2L) == ((2L, 1L, 2L, 0.5)))
    assert(out(3L) == ((1L, 0L, 1L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0L, 0.0)))
  }

  test("caller's column names survive into the output") {
    val df = Seq((1L, "k1 z1 z2 z3 z4 z5 k2"), (2L, "z1 z2 z3 z4 z5"))
      .toDF("asset_id", "body")
    val out = SpanDedup.removeDuplicateSpans(df, "asset_id", "body", w)
    assert(out.columns.toSeq ==
      Seq("asset_id", "body", "n_kept", "n_dropped"))
    val prof = SpanDedup.duplicationProfile(df, "asset_id", "body", w)
    assert(prof.columns.head == "asset_id")
  }

  test("result is independent of input partitioning") {
    val rows = Seq(
      1L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9",
      2L -> "d0 c1 c2 c3 c4 c5 c6 d1",
      3L -> "c3 c4 c5 c6 c7 c8 c9 d2")
    val base = rows.toDF("doc_id", "text")
    val once = SpanDedup.removeDuplicateSpans(base, "doc_id", "text", w)
      .collect().map(_.toSeq).toSet
    val again = SpanDedup.removeDuplicateSpans(base.repartition(7),
      "doc_id", "text", w).collect().map(_.toSeq).toSet
    assert(once == again)
  }
}
