package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Repetition

/** Character-mass repetition metrics pinned to hand-computed values. */
class RepetitionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("wordRepetitionProfile: exact fractions and the composite gate") {
    val docs = Seq(
      (1L, "aa aa b"),        // cm: aa->4, b->1; dup mass 4/5, top 4/5
      (2L, "one two three"),  // no repeats; top word mass 5/11
      (3L, "w w w w w w w w w w")) // a single repeated word
      .toDF("doc_id", "text")
    val out = Repetition.wordRepetitionProfile(docs, "doc_id", "text")
      .select("doc_id", "n_words", "dup_word_frac", "dup_char_frac",
        "top_char_frac", "flagged")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 1.0 / 3.0, 0.8, 0.8, true)))
    assert(out(2L) == ((2L, 3L, 0.0, 0.0, 5.0 / 11.0, true)))
    assert(out(3L) == ((3L, 10L, 0.9, 1.0, 1.0, true)))
    // a long diverse doc passes the gate
    val ok = Repetition.wordRepetitionProfile(
      Seq((9L, (1 to 50).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("flagged").as[Boolean].collect().toSeq
    assert(ok == Seq(false))
  }

  test("randomized invariants: every fraction in [0,1], dup implies repeats") {
    val rnd = new scala.util.Random(13)
    val words = Vector("x", "yy", "zzz", "wwww", "v")
    val docs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(25))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val out = Repetition.wordRepetitionProfile(docs, "doc_id", "text")
      .select("n_words", "dup_word_frac", "dup_char_frac", "top_char_frac")
      .as[(Long, Double, Double, Double)].collect()
    assert(out.length == 200)
    assert(out.forall { case (_, a, b, c) =>
      a >= 0.0 && a < 1.0 && b >= 0.0 && b <= 1.0 && c > 0.0 && c <= 1.0 })
    // char mass in duplicated words can only exist when tokens repeat
    assert(out.forall { case (_, dupW, dupC, _) => dupC == 0.0 || dupW > 0.0 })
  }
}
