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

  private def encodeOne(tok: String, merges: Seq[(String, String)]): Seq[String] =
    Seq(tok).toDF("tok")
      .select(Bpe.encodePieces(col("tok"), merges).as("p"))
      .as[Seq[String]].head()

  test("encode with trained merges reproduces the textbook segmentation") {
    // the round trip the tokenizer story promises: train on the classic
    // corpus, encode its own tokens (and an unseen one) with the result
    val merges = Bpe.trainMerges(corpus, "text", numMerges = 3)
      .map { case (_, l, r, _) => (l, r) } // (e,s), (es,t), (l,o)
    assert(encodeOne("lowest", merges) == Seq("lo", "w", "est"))
    assert(encodeOne("newest", merges) == Seq("n", "e", "w", "est"))
    assert(encodeOne("low", merges) == Seq("lo", "w"))
    assert(encodeOne("widest", merges) == Seq("w", "i", "d", "est"))
    assert(encodeOne("es", merges) == Seq("es")) // lone pair, no es+t
  }

  test("encode edge cases: empty, single symbol, no applicable merge, null") {
    val merges = Seq("a" -> "b")
    assert(encodeOne("", merges) == Seq())
    assert(encodeOne("a", merges) == Seq("a"))
    assert(encodeOne("xyz", merges) == Seq("x", "y", "z"))
    val withNull = Seq(Option("ab"), None).toDF("tok")
      .select(Bpe.encodePieces(col("tok"), merges).as("p"))
      .as[Option[Seq[String]]].collect().toSet
    assert(withNull == Set(Some(Seq("ab")), None))
  }

  test("native encode equals the rank-order applyMerge fold on random inputs") {
    // the kernel's lowest-rank-present loop vs the definitional
    // rank-by-rank leftmost-greedy fold ([[Bpe.applyMerge]]): identical on
    // any TRAINING-CONSISTENT table (each merge's output symbol only ever
    // appears in later-ranked merges). Random tables are generated the way
    // training generates them — each new merge pairs two symbols already
    // producible — so the equivalence precondition holds by construction.
    val rnd = new scala.util.Random(5150)
    for (trial <- 1 to 12) {
      val producible = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d")
      val merges = Seq.fill(2 + rnd.nextInt(4)) {
        val l = producible(rnd.nextInt(producible.size))
        val r = producible(rnd.nextInt(producible.size))
        producible += (l + r)
        (l, r)
      }
      val toks = Seq.fill(25)(
        Seq.fill(1 + rnd.nextInt(9))("abcd" (rnd.nextInt(4))).mkString)
      val df = toks.toDF("tok")
      val folded = merges.foldLeft(Bpe.symbols(col("tok"))) {
        case (acc, (l, r)) => Bpe.applyMerge(acc, l, r)
      }
      val got = df.select(col("tok"),
        Bpe.encodePieces(col("tok"), merges).as("native"), folded.as("folded"))
        .as[(String, Seq[String], Seq[String])].collect()
      for ((tok, native, fold) <- got)
        assert(native == fold, s"trial $trial tok=$tok merges=$merges")
    }
  }

  test("encodeCorpus keeps occurrence positions and joins vocab encodings back") {
    val docs = Seq((1L, "low lower low"), (2L, "newest")).toDF("id", "text")
    val merges = Seq("l" -> "o", "e" -> "s", "es" -> "t")
    val got = Bpe.encodeCorpus(docs, "id", "text", merges)
      .as[(Long, Int, String, Seq[String])].collect().toSet
    assert(got == Set(
      (1L, 0, "low", Seq("lo", "w")),
      (1L, 1, "lower", Seq("lo", "w", "e", "r")),
      (1L, 2, "low", Seq("lo", "w")),
      (2L, 0, "newest", Seq("n", "e", "w", "est"))))
  }
}
