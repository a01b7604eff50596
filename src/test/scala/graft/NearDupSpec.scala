package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, NearDup, Shingles, TextAnalysis}

/** Unit semantics for shingling, exact/near dedup, MinHash-LSH, SimHash. */
class NearDupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different text about spark engines here"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "tiny")                                         // < 3 tokens
  ).toDF("doc_id", "text")

  test("wordShingles emits size-n distinct shingles, empty below n tokens") {
    val sh = docs.select(col("doc_id"),
      Shingles.wordShingles(col("text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L).length == 7) // 9 tokens -> 7 trigrams, all distinct
    assert(sh(1L).head == "the quick brown")
    assert(sh(5L).isEmpty)
    assert(sh(3L).forall(_.split(" ").length == 3))
  }

  test("charNgrams slides over characters") {
    val out = Seq(("abcd")).toDF("t")
      .select(Shingles.charNgrams(col("t"), 3).as("g"))
      .as[Seq[String]].head()
    assert(out == Seq("abc", "bcd"))
  }

  test("exact fingerprint dedup collapses case/whitespace variants") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text")
    ).toDF("doc_id", "text")
    val kept = Dedup.exactByFingerprint(df, "text", Seq(col("doc_id").asc))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("ngramJaccardPairs finds the near-dup pair with correct jaccard") {
    val pairs = NearDup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().sortBy(p => (p._1, p._2))
    // doc1/doc2 share 6 of 8 distinct trigrams; doc4 is identical to doc1
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    val j12 = pairs.find(p => p._1 == 1L && p._2 == 2L).get._3
    assert(j12 == 6.0 / 8.0)
    assert(pairs.find(p => p._1 == 1L && p._2 == 4L).get._3 == 1.0)
  }

  test("maxDf cap drops hot shingles from pairing") {
    // shingle sets identical across 4 docs -> every shingle has df=4;
    // cap at 3 removes them all, so no pairs survive
    val hot = Seq((1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    assert(NearDup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.1, maxDf = 3).count() == 0)
    assert(NearDup.ngramJaccardPairs(hot, "doc_id", "text", 3, 0.1).count() == 6)
  }

  test("capped ngramJaccardPairs prunes hot candidates but reports exact jaccard") {
    // docs 1/2: near-dups over RARE shingles (df=2) — must survive the cap
    // with their exact jaccard; docs 3..8: identical boilerplate whose every
    // shingle is hot (df=6) — the documented miss condition for the cap
    val corpus = (Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta")) ++
      (3L to 8L).map(i => (i, "the quick brown fox jumps"))).toDF("doc_id", "text")
    val capped = NearDup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5, maxDf = 4)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(capped == Seq((1L, 2L, 0.5))) // exact value, from full shingle sets
    val exact = NearDup.ngramJaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(exact.length == 16) // (1,2) plus all 15 boilerplate pairs
    assert(exact.contains((1L, 2L, 0.5)))
  }

  test("capped path equals exact path on the documents table") {
    val table = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val exact = NearDup.ngramJaccardPairs(table, "doc_id", "text", 3, 0.8)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val capped = NearDup.ngramJaccardPairs(table, "doc_id", "text", 3, 0.8, maxDf = 16)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(capped == exact)
  }

  test("minhashLshPairs equals exact ngramJaccardPairs on the documents table") {
    val table = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val exact = NearDup.ngramJaccardPairs(table, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = NearDup.minhashLshPairs(table, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("saved shingle index round-trips and incremental pairs match inline") {
    val dir = java.nio.file.Files.createTempDirectory("shidx").toString
    val history = docs.filter(col("doc_id") =!= 5L)
    NearDup.saveShingleIndex(history, "doc_id", "text", 3, s"$dir/idx")
    val idx = NearDup.loadShingleIndex(spark, s"$dir/idx")
    // batch: an exact copy of 1 and a fresh unrelated doc
    val batch = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "nothing in common with anything stored before now")
    ).toDF("doc_id", "text")
    val got = NearDup.incrementalNearDupPairs(
        batch, idx, "doc_id", "text", 3, 0.8)
      .orderBy("i", "j")
      .as[(Long, Long, Double)].collect().toSeq
    // 100 duplicates history docs 1 and 4 exactly; 2 is below 0.8 at n=3
    assert(got == Seq((100L, 1L, 1.0), (100L, 4L, 1.0)))
    // history text must not be needed: the loaded index alone suffices
    assert(idx.columns.toSet == Set("doc_id", "h", "n_sh"))
  }

  test("saved decontamination Bloom filter reproduces the inline sweep") {
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    val corpus = docs.filter(col("doc_id") =!= 5L)
    val probe = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val bytes = NearDup.buildShingleBloom(probe, "doc_id", "text", 3)
    NearDup.saveShingleBloom(spark, bytes, s"$dir/bloom.bin")
    val loaded = NearDup.loadShingleBloom(spark, s"$dir/bloom.bin")
    assert(java.util.Arrays.equals(loaded, bytes))
    val viaLoaded = NearDup.bloomContainmentPairsWith(
        corpus, probe, "doc_id", "text", 3, 0.5, loaded)
      .orderBy("i").as[(Long, Long, Double)].collect().toSeq
    val inline = NearDup.bloomContainmentPairs(
        corpus, probe, "doc_id", "text", 3, 0.5)
      .orderBy("i").as[(Long, Long, Double)].collect().toSeq
    assert(viaLoaded == inline)
    // exact dups of 100 at containment 1.0, the near-dup at 6/7
    assert(viaLoaded.map(_._1).toSet == Set(1L, 2L, 4L), viaLoaded)
  }

  test("minhash signature has one entry per permutation, stable across runs") {
    val sig = docs.filter(col("doc_id") === 1)
      .select(NearDup.minhashSignature(
        Shingles.wordShingles(col("text"), 3), 16).as("sig"))
      .as[Seq[Long]]
    assert(sig.head().length == 16)
    assert(sig.head() == sig.head())
  }

  test("grouped minhashSignatures equals the HOF reference formulation") {
    val ref = docs.filter(size(Shingles.wordShingles(col("text"), 3)) > 0)
      .select(col("doc_id"), NearDup.minhashSignature(
        Shingles.wordShingles(col("text"), 3), 16).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val fast = NearDup.minhashSignatures(docs, "doc_id", "text", 3, 16)
      .as[(Long, Seq[Long])].collect().toMap
    assert(fast == ref)
  }

  test("grouped simhashFingerprints equals the HOF reference formulation") {
    val ref = docs.filter(size(Shingles.wordShingles(col("text"), 3)) > 0)
      .select(col("doc_id"), NearDup.simhash(
        Shingles.wordShingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect().toMap
    val fast = NearDup.simhashFingerprints(docs, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(fast == ref)
  }

  test("simhash: identical texts distance 0, near-dups closer than unrelated") {
    val fp = docs.filter(size(Shingles.wordShingles(col("text"), 3)) > 0)
      .select(col("doc_id"),
        NearDup.simhash(Shingles.wordShingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(4L))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(2L)) < ham(fp(1L), fp(3L)))
  }

  test("simhashPairs blocking finds every pair within the hamming budget") {
    val pairs = NearDup.simhashPairs(docs, "doc_id", "text", 3, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // brute-force oracle over collected fingerprints
    val fp = docs.filter(size(Shingles.wordShingles(col("text"), 3)) > 0)
      .select(col("doc_id"),
        NearDup.simhash(Shingles.wordShingles(col("text"), 3)).as("fp"))
      .as[(Long, Long)].collect()
    val truth = (for {
      (i, fi) <- fp; (j, fj) <- fp if i < j
      h = java.lang.Long.bitCount(fi ^ fj) if h <= 16
    } yield (i, j, h)).toSet
    assert(pairs.toSet == truth)
  }

  test("simhashDupPairs returns exactly the identical-shingle-set pairs") {
    val out = NearDup.simhashDupPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force oracle: pairs with equal (nonempty) shingle SETS
    val sets = docs
      .select(col("doc_id"), Shingles.wordShingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, sh) => (id, sh.toSet) }
      .filter(_._2.nonEmpty)
    val truth = (for {
      (i, si) <- sets; (j, sj) <- sets if i < j && si == sj
    } yield (i, j, 1.0)).toSet
    assert(truth.nonEmpty) // fixture has identical docs 1 and 4
    assert(out.toSet == truth)
  }

  test("fingerprint64 matches fingerprint on canonical-equality") {
    val df = Seq(("A  b C"), ("a b c"), ("x y")).toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("f32"),
        TextAnalysis.fingerprint64(col("text")).as("f64"))
      .collect()
    assert(df(0).getString(0) == df(1).getString(0))
    assert(df(0).getLong(1) == df(1).getLong(1))
    assert(df(0).getLong(1) != df(2).getLong(1))
  }

  /** Scala reference of the winnowing sketch for cross-checking the column
    * implementation: base-31 rolling hash, min per w-window, distinct+sort.
    */
  private def winnowRef(text: String, k: Int, w: Int): Seq[Long] = {
    if (text.length < k + w - 1) return Seq.empty
    val hs = text.sliding(k).map(_.foldLeft(0L)((a, c) => a * 31L + c)).toVector
    hs.sliding(w).map(_.min).toVector.distinct.sorted
  }

  private def winnowDf(texts: Seq[String], k: Int, w: Int) =
    texts.toDF("text")
      .select(col("text"), TextAnalysis.charCodes(col("text")).as("codes"))
      .select(col("text"), TextAnalysis.kgramHashesFromCodes(col("codes"), k).as("hs"))
      .select(col("text"), TextAnalysis.winnowSelect(col("hs"), w).as("fp"))

  test("kgramHashesFromCodes equals the one-shot kgramHashes") {
    val out = docs
      .select(TextAnalysis.kgramHashes(col("text"), 4).as("a"),
        TextAnalysis.kgramHashesFromCodes(
          TextAnalysis.charCodes(col("text")), 4).as("b"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (a, b) => assert(a == b) }
  }

  test("winnow fingerprint matches the reference sketch") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "abababababab",   // heavy repetition -> collapses to few fingerprints
      "zyxwvutsrqponm") // strictly decreasing hashes -> rolling window mins
    val out = winnowDf(texts, 5, 4)
      .as[(String, Seq[Long])].collect().toMap
    for (t <- texts) assert(out(t) == winnowRef(t, 5, 4), s"mismatch on '$t'")
  }

  test("native graft_shingles is value-identical to the HOF wordShingles") {
    val corpus = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("text"))
      .union(Seq("", "a b", "a b c", "a  b  c d", "x x x x x", "one two three two one two three")
        .toDF("text"))
    for (n <- Seq(2, 3, 5)) {
      val out = corpus.select(
        Shingles.wordShingles(col("text"), n).as("a"),
        Shingles.wordShinglesNative(col("text"), n).as("b"))
        .as[(Seq[String], Seq[String])].collect()
      // exact equality including the first-occurrence dedup ORDER
      out.foreach { case (a, b) => assert(a == b, s"n=$n") }
    }
  }

  test("native graft_winnow is value-identical to the HOF winnowing chain") {
    // the three-projection HOF formulation is the semantic reference; the
    // fused native kernel must reproduce it exactly, including edge cases
    // (short text, heavy repetition, corpus data, and non-BMP text — a
    // supplementary character is TWO UTF-16 code units but ONE code point,
    // and both paths must count it once)
    val corpus = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("text"))
      .union(Seq("", "ab", "abababababab", "zyxwvutsrqponm",
        "emoji 😀🤖😀🤖 mid 𤭢𤭢𤭢 tail text",
        "😀abc😀abc😀abc😀").toDF("text"))
    for ((k, w) <- Seq((8, 4), (5, 4), (3, 2))) {
      // HOF chain through stacked projections (mandatory — inlining it
      // re-evaluates the O(n·k) subtree per window, see TextAnalysis docs)
      val out = corpus
        .select(col("text"), TextAnalysis.charCodes(col("text")).as("codes"))
        .select(col("text"), TextAnalysis.kgramHashesFromCodes(col("codes"), k).as("hs"))
        .select(
          TextAnalysis.winnowSelect(col("hs"), w).as("a"),
          call_function("graft_winnow", col("text"), lit(k), lit(w)).as("b"))
        .as[(Seq[Long], Seq[Long])].collect()
      out.foreach { case (a, b) => assert(a == b, s"k=$k w=$w") }
    }
  }

  test("winnow: shared long substring -> shared fingerprint; short text -> empty") {
    val a = "completely unrelated prefix THE COMMON SHARED MIDDLE SECTION and a tail"
    val b = "other document that embeds THE COMMON SHARED MIDDLE SECTION differently"
    val out = winnowDf(Seq(a, b, "short"), 8, 4)
      .select("fp").as[Seq[Long]].collect()
    assert(out(0).toSet.intersect(out(1).toSet).nonEmpty)
    assert(out(2).isEmpty) // 5 chars < k + w - 1 = 11
  }

  test("winnowOverlapPairs finds embedded-substring pairs, full overlap on copies") {
    val shared = "THE COMMON SHARED MIDDLE SECTION OF MEANINGFUL LENGTH HERE"
    val docs = Seq(
      (1L, s"completely unrelated prefix $shared and a tail ending"),
      (2L, s"other document wrapping $shared in different context"),
      (3L, s"completely unrelated prefix $shared and a tail ending"), // copy of 1
      (4L, "nothing in common with anyone else at all in this row"))
      .toDF("doc_id", "text")
    val pairs = NearDup.winnowOverlapPairs(docs, "doc_id", "text",
      k = 8, w = 4, maxDf = 10L, minShared = 2L)
      .select("i", "j", "overlap")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // the byte-identical pair shares its whole fingerprint set
    assert(pairs((1L, 3L)) == 1.0)
    // the embedded-substring pairs are found in both directions
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    // the unrelated doc pairs with nobody
    assert(!pairs.keys.exists { case (i, j) => i == 4L || j == 4L })
  }

  test("graft_bloom_contains: no false negatives, null-safe, binary-literal only") {
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    (0L until 50L).foreach(bloom.putLong)
    val bytes = graft.functions.BloomRef.serialize(bloom)
    val probe = Seq[java.lang.Long](3L, 49L, 1000L, null).toDF("h")
      .select(col("h"),
        call_function("graft_bloom_contains", col("h"), lit(bytes)).as("m"))
      .as[(Option[Long], Option[Boolean])].collect().toMap
    // inserted values MUST hit (no false negatives); null propagates
    assert(probe(Some(3L)).contains(true) && probe(Some(49L)).contains(true))
    assert(probe(None).isEmpty)
    // a non-literal filter argument is a plan-time error, not a per-row one
    val err = intercept[Exception] {
      Seq(1L).toDF("h").select(
        call_function("graft_bloom_contains", col("h"), col("h"))).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${msgs(t.getCause)}"
    assert(msgs(err).contains("binary literal"))
  }

  test("bloom-prefiltered containment equals the exact sweep, at any fpp") {
    val docs = graft.core.Tables.documents(TestSpark.spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") >= 50)
    val probe = docs.filter(col("doc_id") < 50)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("i", "j", "containment")
        .as[(Long, Long, Double)].collect().toSet
    val exact = collect(
      NearDup.containmentPairs(corpus, probe, "doc_id", "text", 3, 0.5))
    assert(exact.nonEmpty) // the comparison must not pass vacuously
    // tight filter: the production setting
    assert(collect(NearDup.bloomContainmentPairs(
      corpus, probe, "doc_id", "text", 3, 0.5)) == exact)
    // absurdly loose filter (50% fpp): false positives flood the prefilter
    // and the exact intersection count must still erase every one
    assert(collect(NearDup.bloomContainmentPairs(
      corpus, probe, "doc_id", "text", 3, 0.5, fpp = 0.5)) == exact)
  }
}
