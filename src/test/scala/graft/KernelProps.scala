package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{ShingleKernel, WinnowHash}

/** ScalaCheck properties for the native expression kernels (SURVEY §5.4):
  * each kernel is checked against an independent brute-force reference over
  * randomized inputs — hundreds of cases beyond the example-based specs,
  * with no Spark session needed (the kernels are pure).
  */
object KernelProps extends Properties("graft.kernels") {

  private val text: Gen[String] = for {
    toks <- Gen.listOf(Gen.oneOf("a", "b", "ab", "xyz", "", "Hello", "42", "été"))
  } yield toks.mkString(" ")

  /** Independent shingling reference: sliding + first-occurrence distinct. */
  private def refShingles(s: String, n: Int): Seq[String] = {
    val t = s.split(" ", -1).toSeq
    if (t.length < n) Seq.empty
    else t.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  property("shingle kernel equals sliding+distinct reference") =
    forAll(text, Gen.choose(1, 4)) { (s, n) =>
      val out = ShingleKernel.compute(UTF8String.fromString(s), n)
      (0 until out.numElements()).map(i => out.getUTF8String(i).toString) ==
        refShingles(s, n)
    }

  /** Independent winnowing reference: per-gram fold over Unicode CODE
    * POINTS (the unit `split(text, "") → ascii` yields — a surrogate pair
    * is ONE element), brute-force window minima, distinct, sorted.
    */
  private def refWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray.toSeq
    val n = cps.length
    if (n < k) return Seq.empty
    val hs = (0 to n - k).map(i =>
      cps.slice(i, i + k).foldLeft(0L)((a, c) => a * 31L + c))
    if (hs.length < w) Seq.empty
    else hs.sliding(w).map(_.min).toSeq.distinct.sorted
  }

  property("winnow kernel equals brute-force reference") =
    forAll(Gen.asciiPrintableStr, Gen.choose(1, 6), Gen.choose(1, 5)) { (s, k, w) =>
      val out = WinnowHash.compute(UTF8String.fromString(s), k, w)
      (0 until out.numElements()).map(out.getLong) == refWinnow(s, k, w)
    }

  /** Non-BMP coverage: supplementary characters (emoji, rare CJK) occupy
    * TWO UTF-16 code units but must count as ONE k-gram element — a
    * code-unit iteration would produce different gram counts and hashes.
    */
  private val nonBmpText: Gen[String] = for {
    toks <- Gen.nonEmptyListOf(Gen.oneOf(
      "a", "é", "😀" /* 😀 U+1F600 */, "🤖" /* 🤖 */,
      "𤭢" /* 𤭢 U+24B62 */, "xy", "7"))
  } yield toks.mkString

  property("winnow kernel is code-point-correct on non-BMP text") =
    forAll(nonBmpText, Gen.choose(1, 4), Gen.choose(1, 4)) { (s, k, w) =>
      val out = WinnowHash.compute(UTF8String.fromString(s), k, w)
      (0 until out.numElements()).map(out.getLong) == refWinnow(s, k, w)
    }

  property("winnow fingerprints are a subset of all k-gram hashes") =
    forAll(Gen.asciiPrintableStr.suchThat(_.length >= 8)) { s =>
      val k = 4; val w = 3
      val all = (0 to s.length - k).map(i =>
        s.substring(i, i + k).foldLeft(0L)((a, c) => a * 31L + c)).toSet
      val out = WinnowHash.compute(UTF8String.fromString(s), k, w)
      (0 until out.numElements()).map(out.getLong).forall(all.contains)
    }

  private def norm(s: String): String =
    graft.functions.TextNorm.normalize(UTF8String.fromString(s)).toString

  property("normalize kernel is idempotent") =
    forAll(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf("Café", "NAÏVE", "über", " ", "\t", "\n", "a", "É"))
        .map(_.mkString))) { s =>
      norm(norm(s)) == norm(s)
    }

  property("normalize kernel output has no runs, no edge spaces, no uppercase") =
    forAll(Gen.asciiPrintableStr) { s =>
      val out = norm(s)
      !out.contains("  ") && out == out.trim && out == out.toLowerCase &&
        Seq('\t', '\n', '\r', '\f').forall(c => !out.contains(c))
    }

  property("normalize kernel strips Latin diacritics to their base letters") =
    forAll(Gen.listOf(Gen.oneOf(
      "Café" -> "cafe", "NAÏVE" -> "naive", "résumé" -> "resume",
      "Über" -> "uber", "piñata" -> "pinata", "Åbo" -> "abo",
      "plain" -> "plain"))) { pairs =>
      norm(pairs.map(_._1).mkString(" ")) == pairs.map(_._2).mkString(" ")
    }

  /** Independent window-hash reference: split on every space, join each
    * w-token slide with single spaces, hash the RESULTING STRING's bytes
    * with Spark's xxhash64 seed. The kernel instead hashes byte ranges of
    * the original text in place — equality here proves the
    * window-is-a-substring identity the kernel rests on, empty tokens and
    * non-ASCII included.
    */
  private def refWindowHashes(s: String, w: Int): Seq[Long] = {
    val t = s.split(" ", -1).toSeq
    if (t.length < w) Seq.empty
    else t.sliding(w).map { win =>
      val u = UTF8String.fromString(win.mkString(" "))
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
    }.toSeq
  }

  /** Independent occurrence-ngram reference: split on every space, emit
    * each n-token slide joined with single spaces, duplicates preserved in
    * position order.
    */
  private def refNgrams(s: String, n: Int): Seq[String] = {
    val t = s.split(" ", -1).toSeq
    if (t.length < n) Seq.empty else t.sliding(n).map(_.mkString(" ")).toSeq
  }

  property("ngram kernel equals sliding occurrence reference") =
    forAll(text, Gen.choose(1, 4)) { (s, n) =>
      val out = graft.functions.NgramKernel
        .compute(UTF8String.fromString(s), n)
      (0 until out.numElements()).map(i =>
        out.getUTF8String(i).toString) == refNgrams(s, n)
    }

  property("token-count kernel equals split-size reference") =
    forAll(Gen.oneOf(text, Gen.const(""), Gen.const(" "),
      Gen.const("  a  b "))) { s =>
      graft.functions.TokenCountKernel.compute(UTF8String.fromString(s)) ==
        s.split(" ", -1).length
    }

  property("window-hash kernel equals split+join+xxhash64 reference") =
    forAll(text, Gen.choose(2, 5)) { (s, w) =>
      val out = graft.functions.TokenWindowHash
        .compute(UTF8String.fromString(s), w)
      (0 until out.numElements()).map(out.getLong) == refWindowHashes(s, w)
    }

  // --- TopKSketch (the TypedImperativeAggregate buffer) -----------------

  private val item: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e", "f",
    "g", "h", "été", "😀", "")
  private val stream: Gen[List[String]] = Gen.listOf(item)

  private def sketchOf(cap: Int, xs: Seq[String]): graft.functions.TopKSketch = {
    val sk = new graft.functions.TopKSketch(cap)
    xs.foreach(x => sk.add(UTF8String.fromString(x)))
    sk
  }

  private def exact(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  /** The exactness contract the q105 oracle hash relies on: while distinct
    * items stay within capacity across every partial AND merge, the
    * summary IS the exact count table and the result is independent of how
    * Spark splits the stream into partials and in which order it merges
    * them.
    */
  property("topk sketch is the exact count table under capacity, any merge split") =
    forAll(stream, Gen.choose(1, 5)) { (xs, pieces) =>
      val cap = 16 // >= the 11-item alphabet: no eviction anywhere
      val parts = (0 until pieces).map(i => xs.zipWithIndex.collect {
        case (x, j) if j % pieces == i => x
      })
      val merged = parts.map(p => sketchOf(cap, p)).reduceLeft { (a, b) =>
        a.mergeIn(b); a
      }
      val ex = exact(xs)
      merged.entries.map { case (k, c) => k.toString -> c.count }.toMap == ex &&
        merged.entries.valuesIterator.forall(_.err == 0L)
    }

  /** Space-saving bounds past capacity, update path: for every tracked
    * item, count - err <= true <= count; every UNtracked item's true count
    * is <= floorCount; floorCount <= N/capacity.
    */
  property("topk sketch keeps space-saving bounds past capacity") =
    forAll(stream, Gen.choose(1, 4)) { (xs, cap) =>
      val sk = sketchOf(cap, xs)
      val ex = exact(xs).withDefaultValue(0L)
      val tracked = sk.entries.map { case (k, c) => k.toString -> c }.toMap
      tracked.forall { case (k, c) =>
        c.count - c.err <= ex(k) && ex(k) <= c.count
      } &&
        ex.keysIterator.filterNot(tracked.contains)
          .forall(k => ex(k) <= sk.floorCount) &&
        (xs.isEmpty || sk.floorCount <= xs.size.toLong / cap + 1)
    }

  /** The same bounds survive a merge of independently-built summaries —
    * the invariant Spark's partial/final aggregation actually exercises.
    */
  property("topk sketch merge preserves bounds over the concatenated stream") =
    forAll(stream, stream, Gen.choose(1, 4)) { (xs, ys, cap) =>
      val a = sketchOf(cap, xs)
      a.mergeIn(sketchOf(cap, ys))
      val ex = exact(xs ++ ys).withDefaultValue(0L)
      val tracked = a.entries.map { case (k, c) => k.toString -> c }.toMap
      tracked.forall { case (k, c) =>
        c.count - c.err <= ex(k) && ex(k) <= c.count
      } &&
        ex.keysIterator.filterNot(tracked.contains)
          .forall(k => ex(k) <= a.floorCount)
    }

  /** The weighted form (q49's count-table ranking) under capacity: the
    * sketch is the exact weighted-sum table, independent of merge split.
    */
  property("topk sketch weighted adds are the exact sum table under capacity") =
    forAll(Gen.listOf(Gen.zip(item, Gen.choose(1L, 50L))), Gen.choose(1, 4)) {
      (xs, pieces) =>
        val cap = 16
        val parts = (0 until pieces).map(i => xs.zipWithIndex.collect {
          case (x, j) if j % pieces == i => x
        })
        val merged = parts.map { p =>
          val sk = new graft.functions.TopKSketch(cap)
          p.foreach { case (x, w) => sk.add(UTF8String.fromString(x), w) }
          sk
        }.reduceLeft { (a, b) => a.mergeIn(b); a }
        val ex = xs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
        merged.entries.map { case (k, c) => k.toString -> c.count }.toMap == ex &&
          merged.entries.valuesIterator.forall(_.err == 0L)
    }

  /** Past capacity, weighted adds keep the same space-saving bounds as
    * unit adds — eviction inherits the floor regardless of increment
    * size, so count-err <= true <= count and untracked <= floor survive.
    */
  property("topk sketch weighted adds keep space-saving bounds past capacity") =
    forAll(Gen.listOf(Gen.zip(item, Gen.choose(1L, 50L))), Gen.choose(1, 4)) {
      (xs, cap) =>
        val sk = new graft.functions.TopKSketch(cap)
        xs.foreach { case (x, w) => sk.add(UTF8String.fromString(x), w) }
        val ex = xs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
          .withDefaultValue(0L)
        val tracked = sk.entries.map { case (k, c) => k.toString -> c }.toMap
        tracked.forall { case (k, c) =>
          c.count - c.err <= ex(k) && ex(k) <= c.count
        } &&
          ex.keysIterator.filterNot(tracked.contains)
            .forall(k => ex(k) <= sk.floorCount)
    }

  property("topk sketch serialize round-trips") =
    forAll(stream, Gen.choose(1, 6)) { (xs, cap) =>
      val sk = sketchOf(cap, xs)
      val rt = graft.functions.TopKSketch.deserialize(cap, sk.serialize())
      rt.entries.map { case (k, c) => (k.toString, c.count, c.err) }.toSet ==
        sk.entries.map { case (k, c) => (k.toString, c.count, c.err) }.toSet
    }

  /** Independent projection reference: round each component to millionths,
    * then the signed sum per output dim using the kernel's own sign (the
    * sign recipe itself is pinned against the DuckDB oracle by q114).
    */
  property("rproject kernel equals round-then-signed-sum reference") =
    forAll(Gen.listOf(Gen.chooseNum(-1.0f, 1.0f)), Gen.choose(1, 12),
      Gen.choose(0L, 10000L)) { (xs, outDim, seed) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        xs.toArray[Any])
      val out = graft.functions.RandomProjectKernel
        .compute(arr, elemIsFloat = true, outDim, seed)
      val mill = xs.map(x => math.floor(x.toDouble * 1000000.0 + 0.5).toLong)
      (0 until outDim).forall { j =>
        out.getLong(j) == mill.zipWithIndex.map { case (m, i) =>
          graft.functions.RandomProjectKernel.sign(i, j, seed) * m
        }.sum
      }
    }

  /** Independent embedding reference: the DSIR bucket kernel's occurrence
    * list (itself property-pinned against the HOF form in DsirSpec),
    * signs summed per output dim — the fused kernel must never diverge
    * from the compose-then-sum path.
    */
  property("hash-embed kernel equals buckets→signed-sum reference") =
    forAll(text, Gen.choose(1, 64), Gen.choose(1, 8)) { (s, buckets, outDim) =>
      val u = UTF8String.fromString(s)
      val out = graft.functions.HashEmbedKernel.compute(u, buckets, outDim, 42L)
      val bs = graft.functions.DsirBucketsKernel.compute(u, buckets)
      (0 until outDim).forall { j =>
        out.getLong(j) == (0 until bs.numElements()).map(i =>
          graft.functions.RandomProjectKernel.sign(bs.getLong(i).toInt, j, 42L)
        ).sum
      }
    }

  // --- TopKRowsBuffer (exact bounded min-k heap) ------------------------

  private val pairGen = org.scalacheck.Gen.zip(
    org.scalacheck.Gen.choose(-1000L, 1000L), org.scalacheck.Gen.choose(0L, 100L))

  /** Exactness: the buffer's sorted output is the true min-k of the
    * stream under (key asc, id asc) — no approximation regime at all.
    * Long keys are stored as themselves, so this is exact at ANY
    * magnitude (the Long.MaxValue-adjacent cases included).
    */
  property("topk_rows equals the exact sorted min-k") =
    forAll(org.scalacheck.Gen.listOf(pairGen), org.scalacheck.Gen.choose(1, 12),
        org.scalacheck.Gen.listOf(org.scalacheck.Gen.zip(
          org.scalacheck.Gen.choose(Long.MinValue, Long.MaxValue),
          org.scalacheck.Gen.choose(0L, 100L)))) { (xs, k, extremes) =>
      val all = xs ++ extremes
      val b = new graft.functions.TopKRowsBuffer(k)
      all.foreach { case (key, id) => b.add(key, id) }
      val expect = all.sortBy { case (key, id) => (key, id) }.take(k)
      b.sorted.toSeq == expect
    }

  /** The double encoding is an order isomorphism onto signed longs under
    * java.lang.Double.compare (NaN greatest, -0.0 < +0.0) and an exact
    * round trip — the property that makes double-keyed rankings
    * row-identical to the window formulation.
    */
  property("topk_rows double encoding preserves Double.compare order exactly") = {
    val special = org.scalacheck.Gen.oneOf(Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, 0.0, -0.0,
      Double.MinPositiveValue, Double.MaxValue, -Double.MaxValue)
    val anyD = org.scalacheck.Gen.frequency(
      3 -> org.scalacheck.Gen.choose(-1e12, 1e12), 1 -> special)
    forAll(anyD, anyD) { (a, b) =>
      val ea = graft.functions.TopKRowsBuffer.doubleToSortable(a)
      val eb = graft.functions.TopKRowsBuffer.doubleToSortable(b)
      java.lang.Long.compare(ea, eb).signum ==
        java.lang.Double.compare(a, b).signum &&
        java.lang.Double.compare(
          graft.functions.TopKRowsBuffer.sortableToDouble(ea), a) == 0
    }
  }

  /** Merge-order independence: any partition of the stream, merged in
    * any grouping order, yields the same min-k — the property that makes
    * the aggregate deterministic under Spark's partial/final scheduling.
    */
  property("topk_rows merge is order-independent and exact") =
    forAll(org.scalacheck.Gen.listOf(pairGen), org.scalacheck.Gen.choose(1, 8),
        org.scalacheck.Gen.choose(1, 5)) { (xs, k, pieces) =>
      val parts = (0 until pieces).map(i => xs.zipWithIndex.collect {
        case (x, j) if j % pieces == i => x
      })
      val buffers = parts.map { p =>
        val b = new graft.functions.TopKRowsBuffer(k)
        p.foreach { case (key, id) => b.add(key, id) }
        b
      }
      val fwd = {
        val b = new graft.functions.TopKRowsBuffer(k)
        buffers.foreach(b.mergeIn); b.sorted.toSeq
      }
      val rev = {
        val b = new graft.functions.TopKRowsBuffer(k)
        buffers.reverse.foreach(b.mergeIn); b.sorted.toSeq
      }
      val expect = xs.sortBy { case (key, id) => (key, id) }.take(k)
      fwd == expect && rev == expect
    }

  property("topk_rows serialize round-trips") =
    forAll(org.scalacheck.Gen.listOf(pairGen), org.scalacheck.Gen.choose(1, 8)) { (xs, k) =>
      val b = new graft.functions.TopKRowsBuffer(k)
      xs.foreach { case (key, id) => b.add(key, id) }
      graft.functions.TopKRowsBuffer.deserialize(k, b.serialize())
        .sorted.toSeq == b.sorted.toSeq
    }
}
