package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** BPE merge training against the classic hand-computed corpus
  * (low×5, lower×2, newest×6, widest×3) plus greedy-overlap semantics.
  */
class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    (("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)).trim)
    .toDF("text")

  test("trainMerges reproduces the textbook merge sequence") {
    // pair counts round 1: es=st=9 (tie -> lexicographic: es), then
    // (es,t)=9, then lo=ow=7 (tie -> lo)
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 3)
    assert(merges == Seq(
      (1, "e", "s", 9L), (2, "es", "t", 9L), (3, "l", "o", 7L)))
  }

  test("applyMerge is leftmost-greedy on overlapping runs") {
    val df = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a"), Seq("b", "a"))
      .toDF("syms")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("aa", "aa"), Seq("aa", "a"), Seq("b", "a")))
  }

  test("pairCounts weights pairs by token frequency") {
    val vocab = Bpe.tokenFreqs(corpus, "text")
      .select(split(col("tok"), "").as("syms"), col("freq"))
    val counts = Bpe.pairCounts(vocab)
      .as[(String, String, Long)].collect()
      .map(t => (t._1 + t._2) -> t._3).toMap
    assert(counts("es") == 9L && counts("st") == 9L)
    assert(counts("lo") == 7L && counts("ow") == 7L)
    assert(counts("we") == 8L) // newest x6 + lower x2
    assert(counts("er") == 2L)
  }

  test("applyMerge matches a driver-side greedy reference on random inputs") {
    def ref(syms: Seq[String], a: String, b: String): Seq[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.init :+ (a + b)
        else acc :+ x
      }
    val rnd = new scala.util.Random(77)
    val alphabet = Vector("a", "b", "c", "ab", "bc")
    val cases = Seq.fill(60) {
      val syms = Seq.fill(1 + rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.size)))
      val a = alphabet(rnd.nextInt(alphabet.size))
      val b = alphabet(rnd.nextInt(alphabet.size))
      (syms, a, b)
    }
    for (((syms, a, b), i) <- cases.zipWithIndex) {
      val got = Seq(syms).toDF("syms")
        .select(Bpe.applyMerge(col("syms"), a, b).as("m"))
        .as[Seq[String]].head()
      assert(got == ref(syms, a, b), s"case $i: syms=$syms merge=($a,$b)")
    }
  }

  test("trainMerges stops early when no pairs remain") {
    val tiny = Seq("ab ab").toDF("text")
    val merges = Bpe.trainMerges(tiny, "text", numMerges = 10)
    // one merge fuses every token into a single symbol; then no pairs
    assert(merges == Seq((1, "a", "b", 2L)))
  }
}
