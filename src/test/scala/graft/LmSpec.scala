package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Lm

/** Bigram-LM training + scoring on a corpus small enough to count by hand:
  * the count threshold, context totals, OOV accounting, and the
  * integer-millionths probability mass are all pinned to exact values.
  */
class LmSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // d1 bigrams: "a b","b a","a b","b c"; d2 bigrams: "a b","b x"
  // pair counts: ab=3 ba=1 bc=1 bx=1; contexts: a->3, b->3
  private val docs = Seq((1L, "a b a b c"), (2L, "a b x"), (3L, "solo"))
    .toDF("doc_id", "text")

  test("bigramLm thresholds pairs and carries exact context totals") {
    val lm = Lm.bigramLm(docs, "text", minCount = 2L)
      .as[(String, Long, Long)].collect().toSet
    assert(lm == Set(("a b", 3L, 3L)))
  }

  test("scoreDocuments: OOV counts, prob mass, and the <2-token contract") {
    val lm = Lm.bigramLm(docs, "text", minCount = 2L)
    val scored = Lm.scoreDocuments(docs, "doc_id", "text", lm)
      .select("doc_id", "n_bigrams", "n_oov", "prob_mass", "oov_rate")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // d1: 2 of 4 bigrams in-LM, each (1e6*3) div 3 = 1e6; d2: 1 of 2;
    // d3 has one token -> no bigrams -> absent
    assert(scored == Set(
      (1L, 4L, 2L, 2000000L, 0.5),
      (2L, 2L, 1L, 1000000L, 0.5)))
  }

  test("randomized invariants: self-trained LM at minCount=1 has zero OOV; " +
      "mass and rate stay in bounds") {
    val rnd = new scala.util.Random(11)
    val words = Vector("aa", "bb", "cc", "dd", "ee")
    val corpus = (1 to 200).map { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(20))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val lm1 = Lm.bigramLm(corpus, "text", minCount = 1L)
    val scored = Lm.scoreDocuments(corpus, "doc_id", "text", lm1)
      .select("n_bigrams", "n_oov", "prob_mass", "oov_rate")
      .as[(Long, Long, Long, Double)].collect()
    assert(scored.length == 200)
    // every corpus bigram is in its own minCount=1 LM
    assert(scored.forall(_._2 == 0L))
    // each in-LM occurrence contributes at most 1e6 (P <= 1), at least 1
    assert(scored.forall { case (nb, _, mass, _) =>
      mass >= nb && mass <= 1000000L * nb })
    assert(scored.forall { case (nb, oov, _, rate) =>
      oov <= nb && rate == oov.toDouble / nb.toDouble })
  }

  test("kneserNeyTable matches the hand-computed textbook case") {
    // "a b a b a c": ab:2 ba:2 ac:1; T=3 types
    // P(b|a) = 1.25/3 + .75*(2/3)*(1/3) = 583333 millionths (floored)
    // P(a|b) = 1.25/2 + .75*(1/2)*(1/3) = 750000
    // P(c|a) = 0.25/3 + .75*(2/3)*(1/3) = 250000
    val tiny = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val out = Lm.kneserNeyTable(tiny, "text", minCount = 1L)
      .select("w1", "w2", "c", "p_kn_mill")
      .as[(String, String, Long, Long)].collect().toSet
    assert(out == Set(("a", "b", 2L, 583333L), ("b", "a", 2L, 750000L),
      ("a", "c", 1L, 250000L)))
  }

  test("kneserNey per-context mass never exceeds one (back-off reserve)") {
    val out = Lm.kneserNeyTable(docs, "text", minCount = 1L)
    val sums = out.groupBy("w1")
      .agg(org.apache.spark.sql.functions.sum("p_kn_mill").as("s"))
      .as[(String, Long)].collect()
    assert(sums.nonEmpty && sums.forall(_._2 <= 1000000L))
  }

  test("kneserNeyTrigramTable matches the hand-computed textbook case") {
    // "a b a b a b c" trigrams: (a,b,a):2 (b,a,b):2 (a,b,c):1
    // ctx: (a,b) c12=3 n3=2; (b,a) c12=2 n3=1
    // m: (b,a)=1 (a,b)=1 (b,c)=1; M: b=2 a=1
    // pair types {(b,a),(a,b),(b,c)} -> T=3; nb: b=2 a=1; p: a=b=c=1
    // (a,b,a): P2=(1-.75)/2+.75*(2/2)*(1/3)=.375, P=1.25/3+.75*(2/3)*.375
    //          = .604166..  -> 604166
    // (b,a,b): P2=.25/1+.75*(1/1)*(1/3)=.5,  P=1.25/2+.75*(1/2)*.5 = .8125
    // (a,b,c): P2=.25/2+.75*(2/2)*(1/3)=.375, P=.25/3+.75*(2/3)*.375
    //          = .270833.. -> 270833
    val tiny = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val out = Lm.kneserNeyTrigramTable(tiny, "text", minCount = 1L)
      .select("w1", "w2", "w3", "c", "p_kn3_mill")
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(out == Set(
      ("a", "b", "a", 2L, 604166L),
      ("b", "a", "b", 2L, 812500L),
      ("a", "b", "c", 1L, 270833L)))
  }

  test("scoreDocumentsTrigram: OOV counts and mass against the hand-computed table") {
    // table from "a b a b a b c" (see the table golden): aba=604166,
    // bab=812500, abc=270833
    val train = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val table = Lm.kneserNeyTrigramTable(train, "text", minCount = 1L)
    // d1 = the training doc: aba, bab, aba, bab, abc -> mass 2*604166 +
    // 2*812500 + 270833; d2 has one OOV trigram (abx); d3 too short
    val score = Seq((1L, "a b a b a b c"), (2L, "a b a b x"), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = Lm.scoreDocumentsTrigram(score, "doc_id", "text", table)
      .select("doc_id", "n_trigrams", "n_oov", "kn_mass", "oov_rate")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 5L, 0L, 3104165L, 0.0),
      (2L, 3L, 1L, 1416666L, 1.0 / 3.0)))
  }

  test("trigram KN per-context mass never exceeds one (back-off reserve)") {
    val rnd = new scala.util.Random(7)
    val words = Vector("aa", "bb", "cc", "dd")
    val corpus = (1 to 120).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(15))(words(rnd.nextInt(words.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val sums = Lm.kneserNeyTrigramTable(corpus, "text", minCount = 1L)
      .groupBy("w1", "w2")
      .agg(org.apache.spark.sql.functions.sum("p_kn3_mill").as("s"))
      .as[(String, String, Long)].collect()
    assert(sums.nonEmpty && sums.forall(_._3 <= 1000000L))
  }

  test("saveTable/loadTable round-trip scores identically to inline training") {
    // the train-once/score-many lifecycle: a persisted table must be
    // value-identical to the in-memory one (strings + integer millionths,
    // no floats to drift), so scoring against the LOADED artifact equals
    // scoring against inline training, row for row
    val train = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val score = Seq((1L, "a b a b a b c"), (2L, "a b a b x")).toDF("doc_id", "text")
    val table = Lm.kneserNeyTrigramTable(train, "text", minCount = 1L)
    val path = java.nio.file.Files.createTempDirectory("graft_lm").toString + "/kn3"
    Lm.saveTable(table, path)
    val loaded = Lm.loadTable(spark, path)
    assert(loaded.orderBy("w1", "w2", "w3").collect().toSeq ==
      table.orderBy("w1", "w2", "w3").collect().toSeq)
    def scored(t: org.apache.spark.sql.DataFrame) =
      Lm.scoreDocumentsTrigram(score, "doc_id", "text", t)
        .select("doc_id", "n_trigrams", "n_oov", "kn_mass", "oov_rate")
        .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(scored(loaded) == scored(table))
    // bigram table takes the same lifecycle
    val bg = Lm.bigramLm(docs, "text", minCount = 2L)
    Lm.saveTable(bg, path + "_bg")
    assert(Lm.loadTable(spark, path + "_bg").orderBy("bg").collect().toSeq ==
      bg.orderBy("bg").collect().toSeq)
  }

  test("a document of pure OOV text scores zero mass, rate 1.0") {
    val lm = Lm.bigramLm(docs, "text", minCount = 2L)
    val alien = Seq((9L, "z z z")).toDF("doc_id", "text")
    val out = Lm.scoreDocuments(alien, "doc_id", "text", lm)
      .select("doc_id", "n_bigrams", "n_oov", "prob_mass", "oov_rate")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((9L, 2L, 2L, 0L, 1.0)))
  }
}
