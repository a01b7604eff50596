package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dsir

/** Unit semantics for DSIR-style hashed-ngram importance weighting. */
class DsirSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("featureBucket matches the reference rolling-hash fold") {
    def ref(s: String, b: Int): Long = {
      var a = 0L
      s.foreach(c => a = (a * 31 + c.toLong) % (1L << 40))
      a % b
    }
    val strs = Seq("hello", "a b", "the quick", "zz",
      "a much longer string whose unreduced fold would overflow a long")
    val out = strs.toDF("s")
      .select(col("s"), Dsir.featureBucket(col("s"), 512).as("b"))
      .as[(String, Long)].collect().toMap
    strs.foreach(s => assert(out(s) == ref(s, 512), s))
  }

  test("native graft_dsir_buckets is value-identical to the HOF reference") {
    val texts = Seq("apple banana apple", "single", "a b c d e f g",
      "the quick brown fox jumps over the lazy dog", "x", "ab ab ab")
    val bad = texts.toDF("text").filter(
      !(Dsir.featureBucketsNative(col("text"), 512) ===
        Dsir.featureBuckets(col("text"), 512)))
    assert(bad.count() == 0)
  }

  test("featureBuckets counts every unigram and bigram occurrence") {
    val n = Seq("a b c a b").toDF("text")
      .select(size(Dsir.featureBuckets(col("text"), 64)).as("n"))
      .as[Int].head()
    assert(n == 5 + 4) // 5 unigram + 4 bigram occurrences, duplicates kept
  }

  test("importance weights separate target-like from off-target documents") {
    // raw must be DOMINATED by off-target mass for the sign gate to be
    // decisive: a raw doc is part of the raw distribution itself, so with
    // a 50/50 mix its features are also raw-common and Laplace smoothing
    // flattens the delta toward (and past) 0
    val raw = (Seq(
      (1L, "apple banana apple banana apple banana"),
      (5L, "apple banana zebra quartz apple gnome")) ++ Seq(
      "xylophone quartz xylophone quartz zebra gnome",
      "quartz gnome zebra quartz xylophone gnome",
      "zebra zebra gnome xylophone quartz gnome",
      "gnome xylophone quartz zebra xylophone zebra",
      "quartz quartz gnome zebra gnome xylophone",
      "zebra gnome xylophone gnome quartz zebra").zipWithIndex
      .map { case (t, i) => (10L + i, t) }).toDF("doc_id", "text")
    val target = Seq(
      "apple banana apple banana apple",
      "banana apple banana apple banana",
      "apple banana banana apple apple",
      "banana banana apple apple banana").zipWithIndex
      .map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", 64)
      .select("doc_id", "weight_mill", "keep")
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // the pure-target-style doc must outrank the mixed doc, which must
    // outrank every pure-off-target doc; the keep gate follows the sign
    assert(w(1L)._1 > w(5L)._1)
    (10L to 15L).foreach(i => assert(w(5L)._1 > w(i)._1 && !w(i)._2, i))
    assert(w(1L)._2)
    // keep is exactly the sign of the weight, on every row
    assert(w.values.forall { case (wm, k) => k == (wm > 0) })
  }
}
