package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection: exact n-gram Jaccard (inverted index), MinHash +
  * LSH banding, and SimHash with pigeonhole blocking.
  *
  * Every operator here follows the same scale discipline: candidate pairs are
  * produced by a JOIN ON A BLOCKING KEY (shared shingle, LSH band bucket,
  * SimHash chunk) — never an all-pairs crossJoin. At 100 TB the shuffle moves
  * (key, doc_id) pairs and small signature arrays, not the corpus text.
  *
  * Signature computation is deliberately NOT written with higher-order
  * column functions (`transform`/`aggregate`): Spark evaluates those
  * interpreted, outside whole-stage codegen. Instead signatures are computed
  * as explode → groupBy(doc) with N codegen'd `min`/`sum` aggregates — the
  * per-shingle hash work stays inside WholeStageCodegen and partial
  * aggregation halves the shuffle. (Measured on this corpus: ~20× faster
  * than the HOF formulation.)
  */
object NearDup {

  /** Exploded distinct shingles with their 64-bit base hash: (id, h). */
  private def shingleHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol), explode(Shingles.wordShinglesNative(col(textCol), n)).as("s"))
      .select(col(idCol), xxhash64(col("s")).as("h"))

  /** The MATERIALIZED inverted index: distinct (id, shingle-hash) postings,
    * persisted memory-and-disk with lineage retained.
    *
    * Why persist: every consumer — per-doc sizes, the hot-shingle document
    * frequency, BOTH sides of the candidate self-join, the verification
    * sets — re-reads the postings, and Spark broadcasts one side of the
    * self-join, so without materialization the shingling subtree (an
    * interpreted higher-order projection, the single most expensive map
    * stage here) is re-evaluated up to four times per query — measured ~4×
    * the whole-query cost at sf0.1. Building the inverted index ONCE is
    * the standard shape at scale; the postings are 16 bytes per distinct
    * (doc, shingle) — far smaller than the corpus text — and spill to disk
    * when they don't fit. Lineage is retained (unlike a checkpoint), so a
    * lost executor recomputes its blocks instead of failing the job, and
    * the ContextCleaner unpersists automatically once the index is
    * unreachable.
    */
  private def postings(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // persist-once guard ([[graft.core.CacheOnce]]): two sweeps over the
    // same probe in one session share the cached plan instead of warning
    graft.core.CacheOnce.persistOnce(shingleHashes(docs, idCol, textCol, n))
  }

  /** Release the CacheOnce pin [[postings]] placed for this exact
    * (frame, idCol, textCol, n) — for callers that build postings over
    * FRESH per-invocation frames (the streaming ingest's micro-batches):
    * every batch has a distinct canonical plan, so the ContextCleaner
    * never collects the entries and executor storage would grow without
    * bound. Safe only when the caller owns the frame's lifecycle; registry
    * queries leave cleanup to the ContextCleaner instead.
    */
  private[graft] def unpersistPostings(docs: DataFrame, idCol: String,
      textCol: String, n: Int): Unit = {
    val df = shingleHashes(docs, idCol, textCol, n)
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) {
      df.unpersist(blocking = false); ()
    }
  }

  /** Persist the inverted shingle index as the near-dup family's
    * build-once/query-many artifact (the [[graft.ops.Similarity]] IVF /
    * [[Lm]] table lifecycle, for text): one row per distinct (doc,
    * shingle-hash) with the doc's distinct-shingle count denormalized on —
    * `(idCol, h, n_sh)` — so a query session joins the loaded index
    * directly, no second aggregation over history. 16-byte-a-row parquet,
    * far smaller than the corpus text it replaces.
    */
  def saveShingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int, path: String): Unit = {
    val idx = postings(docs, idCol, textCol, n)
    val sizes = idx.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    idx.join(sizes, Seq(idCol)).write.mode("overwrite").parquet(path)
  }

  /** The saved index back as a frame ([[saveShingleIndex]] layout). */
  def loadShingleIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(path)

  /** Near-dup pairs of a NEW batch against a saved history index — the
    * incremental twin of [[ngramJaccardPairs]] (and the near-dup analogue
    * of [[Dedup.incrementalByFingerprint]]): shingle ONLY the batch, join
    * its postings against the loaded index on the 8-byte shingle hash with
    * the same size-compatibility prune, count shared shingles per
    * candidate pair, and keep exact Jaccard >= `minJaccard`. Per-batch
    * cost scales with the batch and its shared-shingle candidates, never
    * with the history corpus — history text is never read, only its
    * 16-byte postings.
    *
    * Output: (i = batch id, j = history id, jaccard). Batch and history
    * id spaces are assumed disjoint (the incremental-ingest contract).
    */
  def incrementalNearDupPairs(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String, n: Int, minJaccard: Double): DataFrame = {
    val bIdx = postings(batch, idCol, textCol, n)
    val bSizes = bIdx.groupBy(idCol).agg(count(lit(1)).as("n_i"))
    val left = bIdx.join(bSizes, Seq(idCol))
      .select(col(idCol).as("i"), col("h"), col("n_i"))
    val right = index.select(col(idCol).as("j"), col("h").as("hj"),
      col("n_sh").as("n_j"))
    val inter = left.join(right,
        col("h") === col("hj") &&
          col("n_i").cast("double") >= lit(minJaccard) * col("n_j") &&
          col("n_j").cast("double") >= lit(minJaccard) * col("n_i"))
      .groupBy("i", "j", "n_i", "n_j")
      .agg(count(lit(1)).as("n_common"))
    val jac = col("n_common").cast("double") /
      (col("n_i") + col("n_j") - col("n_common")).cast("double")
    inter.select(col("i"), col("j"), jac.as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Exact Jaccard over two distinct-hash sets — the same value as the
    * string-set Jaccard unless two distinct shingles of the pair collide in
    * 64 bits (~2⁻⁶⁴ per pair; the DuckDB oracle recomputes from strings and
    * confirms equality on every run). Lets verification reuse the persisted
    * [[postings]] instead of re-shingling the corpus.
    */
  private def hashSetJaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Per-doc hash sets rebuilt from the persisted postings: (id, hs). */
  private def hashSets(idx: DataFrame, idCol: String): DataFrame =
    idx.groupBy(idCol).agg(collect_set(col("h")).as("hs"))

  /** All pairs (i < j) with word-`n`-gram Jaccard >= `minJaccard`, computed
    * with an inverted shingle index: explode distinct shingles, self-join on
    * the shingle (hash shuffle on the shingle string), count shared shingles
    * per pair, then `|A∩B| / (|A| + |B| - |A∩B|)`.
    *
    * Candidate pruning:
    *  - size-compatibility: Jaccard >= t forces `t·|B| <= |A| <= |B|/t`, so
    *    the self-join condition drops size-incompatible pairs before they
    *    reach the shuffle-heavy groupBy;
    *  - `maxDf > 0` switches to filter-and-refine over a capped index:
    *    shingles occurring in more than `maxDf` documents are dropped from
    *    the INDEX ONLY (the stop-shingle cap that keeps one hot shingle
    *    from generating O(df²) candidates), candidate pairs come from the
    *    capped index with an upper-bound prune (see inline comment), and
    *    the few surviving candidates are verified against the exact
    *    Jaccard over the FULL shingle-hash sets — so no reported value is
    *    ever an estimate. A
    *    qualifying pair is missed only if EVERY shingle it shares is hot;
    *    at thresholds like 0.8 (pairs share most of their shingle union)
    *    that requires the whole overlap to be boilerplate, vanishingly
    *    rare in practice and absent from this corpus — the capped run is
    *    oracle-checked equal to the exact one.
    *
    * Output: (i, j, jaccard), i < j under the ordering of `idCol`.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double, maxDf: Int = 0): DataFrame = {
    // the index joins on the 8-byte xxhash64 of the shingle, not the string:
    // same result (64-bit collisions are ~2^-64 per distinct-shingle pair),
    // half the shuffle bytes
    val idx = postings(docs, idCol, textCol, n)
    val sizes = idx.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    if (maxDf <= 0) {
      val withSize = idx.join(sizes, Seq(idCol))
      val left = withSize.select(col(idCol).as("i"), col("h"), col("n_sh").as("n_i"))
      // the probe side's hash is RENAMED, not just re-selected: both sides
      // descend from the same persisted index, so a bare col("h") on each
      // would carry the same expression id and Spark would log a
      // trivially-true 'h = h' warning while auto-disambiguating — a log
      // line that trains readers to ignore warnings
      val right = withSize.select(col(idCol).as("j"), col("h").as("hj"), col("n_sh").as("n_j"))
      val inter = left.join(right,
          col("h") === col("hj") && col("i") < col("j") &&
            col("n_i").cast("double") >= lit(minJaccard) * col("n_j") &&
            col("n_j").cast("double") >= lit(minJaccard) * col("n_i"))
        .groupBy("i", "j", "n_i", "n_j")
        .agg(count(lit(1)).as("n_common"))
      val jac = col("n_common").cast("double") /
        (col("n_i") + col("n_j") - col("n_common")).cast("double")
      inter
        .select(col("i"), col("j"), jac.as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    } else {
      // Filter-and-refine over the CAPPED index. Phase 1 (filter): count
      // shared capped shingles per candidate pair — a counting aggregate,
      // no arrays shipped — and bound the true Jaccard from above:
      //   n_common <= c + min(hot_i, hot_j)
      // (a pair can share at most min of the two docs' hot-shingle counts
      // beyond what the capped index saw), and Jaccard is increasing in
      // n_common. Candidates whose upper bound misses the threshold are
      // dropped WITHOUT ever touching shingle sets — that is almost all of
      // them. Phase 2 (refine): the few survivors are verified against the
      // exact hash-set Jaccard.
      // "hh" alias: hot descends from idx, so an unaliased h-on-h anti-join
      // would be a same-expression-id self-join (see the "hj" note above)
      val hot = idx.groupBy("h").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select(col("h").as("hh"))
      val capped = idx.join(hot, col("h") === col("hh"), "left_anti")
      val cappedSizes = capped.groupBy(idCol).agg(count(lit(1)).as("n_cap"))
      val stats = sizes.join(cappedSizes, Seq(idCol), "left_outer")
        .select(col(idCol), col("n_sh"),
          (col("n_sh") - coalesce(col("n_cap"), lit(0L))).as("n_hot"))
      val withSize = capped.join(stats, Seq(idCol))
      val left = withSize.select(col(idCol).as("i"), col("h"),
        col("n_sh").as("n_i"), col("n_hot").as("hot_i"))
      val right = withSize.select(col(idCol).as("j"), col("h").as("hj"),
        col("n_sh").as("n_j"), col("n_hot").as("hot_j"))
      val cand = left.join(right,
          col("h") === col("hj") && col("i") < col("j") &&
            col("n_i").cast("double") >= lit(minJaccard) * col("n_j") &&
            col("n_j").cast("double") >= lit(minJaccard) * col("n_i"))
        .groupBy("i", "j", "n_i", "n_j", "hot_i", "hot_j")
        .agg(count(lit(1)).as("c"))
      val maxCommon = col("c") + least(col("hot_i"), col("hot_j"))
      val upperJac = maxCommon.cast("double") /
        (col("n_i") + col("n_j") - maxCommon).cast("double")
      val survivors = cand.filter(upperJac >= lit(minJaccard)).select("i", "j")
      val sets = hashSets(idx, idCol)
      survivors
        .join(sets.select(col(idCol).as("i"), col("hs").as("hs_i")), Seq("i"))
        .join(sets.select(col(idCol).as("j"), col("hs").as("hs_j")), Seq("j"))
        .select(col("i"), col("j"),
          hashSetJaccard(col("hs_i"), col("hs_j")).as("jaccard"))
        .filter(col("jaccard") >= minJaccard)
    }
  }

  /** Cross-corpus n-gram containment — benchmark DECONTAMINATION: find
    * training documents that contain an evaluation document's content.
    * Returns pairs (i ∈ corpus, j ∈ probe) with
    * `|shingles(i) ∩ shingles(j)| / |shingles(j)| >= minContainment` —
    * the one-sided overlap metric (a long training doc fully containing a
    * short benchmark item scores 1.0 even though their Jaccard is low,
    * which is exactly why decontamination uses containment, not Jaccard).
    *
    * Same inverted-index shape as [[ngramJaccardPairs]]: both sides explode
    * to (id, shingle-hash) postings, join on the 8-byte hash, count shared
    * shingles per pair — candidate pairs only ever arise from a shared
    * shingle, never an all-pairs scan. The probe side (benchmark suites) is
    * typically tiny next to the corpus; the join shuffles postings on the
    * hash, so corpus scale is bounded by the inverted index, not pairs.
    *
    * Output: (i, j, containment).
    */
  def containmentPairs(corpus: DataFrame, probe: DataFrame, idCol: String,
      textCol: String, n: Int, minContainment: Double): DataFrame = {
    val ci = shingleHashes(corpus, idCol, textCol, n)
      .select(col(idCol).as("i"), col("h"))
    val pj = postings(probe, idCol, textCol, n)
    containmentFrom(ci, pj, idCol, minContainment)
  }

  /** [[containmentPairs]] with a broadcast Bloom prefilter on the CORPUS
    * side — the 100 TB form of the decontamination sweep. The probe
    * (benchmark) shingle set is tiny next to the corpus, so a driver-built
    * Bloom filter over its distinct shingle hashes
    * ([[graft.functions.BloomContains]], `fpp` default 1%) is probed
    * map-side at the corpus scan: only postings that MIGHT match a probe
    * shingle enter the intersection join's shuffle. No false negatives
    * means no lost pair; false positives join to nothing and vanish in
    * the exact intersection count — the output is IDENTICAL to
    * [[containmentPairs]] (q112 shares q42's oracle to prove it) while
    * the corpus-side shuffle drops from "every posting" to "postings
    * colliding with the benchmark suite" (~contamination rate + fpp).
    *
    * The filter is sized to the probe's POSTING count (≥ its distinct
    * hash count, so realized fpp ≤ `fpp`); the build is one aggregation
    * over the already-persisted probe postings.
    */
  def bloomContainmentPairs(corpus: DataFrame, probe: DataFrame, idCol: String,
      textCol: String, n: Int, minContainment: Double,
      fpp: Double = 0.01): DataFrame =
    bloomContainmentPairsWith(corpus, probe, idCol, textCol, n,
      minContainment, buildShingleBloom(probe, idCol, textCol, n, fpp))

  /** The decontamination prefilter as a build-once artifact: the
    * benchmark suite's shingle-hash Bloom filter, serialized. Real
    * pipelines build this ONCE per benchmark release and reuse it across
    * every corpus sweep ([[saveShingleBloom]]/[[loadShingleBloom]] — the
    * filter lifecycle beside the IVF / KN-table / shingle-index ones).
    */
  def buildShingleBloom(probe: DataFrame, idCol: String, textCol: String,
      n: Int, fpp: Double = 0.01): Array[Byte] = {
    val pj = postings(probe, idCol, textCol, n)
    graft.functions.BloomRef.serialize(
      pj.stat.bloomFilter("h", math.max(pj.count(), 1L), fpp))
  }

  /** Persist the serialized prefilter (single small file). */
  def saveShingleBloom(spark: org.apache.spark.sql.SparkSession,
      bytes: Array[Byte], path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    try out.write(bytes) finally out.close()
  }

  def loadShingleBloom(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    try in.readAllBytes() finally in.close()
  }

  /** [[bloomContainmentPairs]] against an ALREADY-BUILT filter (e.g. a
    * [[loadShingleBloom]] artifact): the corpus-side map prefilter costs
    * nothing to set up, and the probe side is only re-shingled for the
    * exact verification join — the shape of a recurring contamination
    * sweep against a fixed benchmark suite.
    */
  def bloomContainmentPairsWith(corpus: DataFrame, probe: DataFrame,
      idCol: String, textCol: String, n: Int, minContainment: Double,
      bloomBytes: Array[Byte]): DataFrame = {
    val pj = postings(probe, idCol, textCol, n)
    val ci = shingleHashes(corpus, idCol, textCol, n)
      .filter(call_function("graft_bloom_contains", col("h"), lit(bloomBytes)))
      .select(col(idCol).as("i"), col("h"))
    containmentFrom(ci, pj, idCol, minContainment)
  }

  /** Containment of a SAVED probe index's documents inside a corpus
    * frame — [[containmentPairs]] with the probe side pre-shingled (a
    * [[saveShingleIndex]] artifact: its denormalized `n_sh` IS the probe
    * set size, so no aggregation over the index): the shape of a
    * recurring decontamination sweep against a fixed benchmark release,
    * and the batch-side gate of a streaming ingest. Output (i ∈ corpus,
    * j ∈ index, containment).
    */
  def containmentVsIndex(corpus: DataFrame, index: DataFrame, idCol: String,
      textCol: String, n: Int, minContainment: Double): DataFrame = {
    val ci = shingleHashes(corpus, idCol, textCol, n)
      .select(col(idCol).as("i"), col("h"))
    // the index is one row per distinct (id, h), so the per-id posting
    // count containmentFrom derives equals the denormalized n_sh
    containmentFrom(ci, index.select(col(idCol), col("h")), idCol,
      minContainment)
  }

  /** Shared tail of the containment sweeps: exact per-pair shared-shingle
    * count over (i, h) corpus postings × (probe-id, h) probe postings,
    * normalized by the probe side's set size.
    */
  private def containmentFrom(ci: DataFrame, pj: DataFrame, idCol: String,
      minContainment: Double): DataFrame = {
    val sizes = pj.groupBy(idCol).agg(count(lit(1)).as("n_j"))
    val inter = ci
      .join(pj.select(col(idCol).as("j"), col("h")), Seq("h"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col(idCol).as("j"), col("n_j")), Seq("j"))
      .select(col("i"), col("j"),
        (col("n_common").cast("double") / col("n_j").cast("double"))
          .as("containment"))
      .filter(col("containment") >= minContainment)
  }

  /** MinHash signature column (array<long>, one entry per permutation) for a
    * shingle-array column. Permutation p is the hash family
    * `xxhash64(xxhash64(shingle), p)`; the signature entry is the minimum
    * over the document's shingles.
    *
    * NOTE: higher-order-function formulation — interpreted, row-at-a-time;
    * fine for ad-hoc use on small data and as the semantic reference for
    * [[minhashSignatures]], which computes the identical values via
    * codegen'd grouped aggregation and is what the scale pipeline uses.
    */
  def minhashSignature(shingles: Column, numPerm: Int): Column =
    array((0 until numPerm).map { p =>
      array_min(transform(shingles, s => xxhash64(xxhash64(s), lit(p))))
    }: _*)

  /** MinHash signatures per document, computed scale-first: explode distinct
    * shingles, hash each once, then ONE groupBy(doc) with `numPerm`
    * codegen'd `min(xxhash64(h, p))` aggregates (map-side partial min, one
    * shuffle of (doc, numPerm×8B) partial rows). Returns (idCol, sig).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numPerm: Int): DataFrame = {
    val hashed = shingleHashes(docs, idCol, textCol, n)
    val aggs = (0 until numPerm).map(p => min(xxhash64(col("h"), lit(p))).as(s"__mh$p"))
    hashed.groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numPerm).map(p => col(s"__mh$p")): _*).as("sig"))
  }

  /** LSH band buckets for a MinHash signature: `bands` buckets, each the
    * xxhash64 of `rowsPerBand` consecutive signature entries (plus the band
    * index, so buckets from different bands never collide).
    */
  def lshBandBuckets(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand), lit(b))
    }: _*)

  /** MinHash+LSH near-dup pairs, exact-verified.
    *
    * Pipeline (the standard banded-LSH shape):
    *   1. minhash signature per doc ([[minhashSignatures]] — one shuffle),
    *   2. explode band buckets, self-join on the bucket → candidate pairs
    *      (hash shuffle on the 8-byte bucket key; with b bands of r rows the
    *      probability a pair of Jaccard s collides is 1-(1-s^r)^b),
    *   3. verify every candidate against the EXACT shingle-set Jaccard and
    *      keep pairs >= `minJaccard` — false positives never escape, and
    *      with (b, r) sized for the threshold the miss probability at
    *      s >= minJaccard is negligible (default 16 bands × 4 rows:
    *      P(miss | s=0.9) ≈ 4e-8).
    *
    * Output: (i, j, jaccard) — identical contract to [[ngramJaccardPairs]],
    * at a fraction of the shuffle (signatures, not shingles).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double, bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val idx = postings(docs, idCol, textCol, n)
    val numPerm = bands * rowsPerBand
    val aggs = (0 until numPerm).map(p => min(xxhash64(col("h"), lit(p))).as(s"__mh$p"))
    // signatures persisted too: both sides of the band self-join re-read
    // them, and each row is only (id, numPerm × 8 B)
    val sigs = idx.groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numPerm).map(p => col(s"__mh$p")): _*).as("sig"))
      .persist()
    val banded = sigs.select(col(idCol),
      explode(lshBandBuckets(col("sig"), bands, rowsPerBand)).as("bucket"))
    val cand = banded.select(col(idCol).as("i"), col("bucket"))
      .join(banded.select(col(idCol).as("j"), col("bucket").as("bucketj")),
        col("bucket") === col("bucketj")) // renamed: see ngramJaccardPairs
      .filter(col("i") < col("j"))
      .select("i", "j")
      .distinct()
    val sets = hashSets(idx, idCol)
    val verified = cand
      .join(sets.select(col(idCol).as("i"), col("hs").as("hs_i")), Seq("i"))
      .join(sets.select(col(idCol).as("j"), col("hs").as("hs_j")), Seq("j"))
      .select(col("i"), col("j"),
        hashSetJaccard(col("hs_i"), col("hs_j")).as("jaccard"))
    verified.filter(col("jaccard") >= minJaccard)
  }

  private val simhashBits = 64

  /** 64-bit SimHash over a shingle-array column: bit k of the fingerprint is
    * the sign of Σ over shingles of (bit k of xxhash64(shingle) ? +1 : -1).
    *
    * Higher-order-function reference formulation (interpreted) — the scale
    * pipeline uses [[simhashFingerprints]], which computes identical values
    * with codegen'd grouped sums.
    */
  def simhash(shingles: Column): Column = {
    val bitVec: Column => Column = h =>
      array((0 until simhashBits).map { k =>
        when(h.bitwiseAND(lit(1L << k)) =!= 0L, lit(1)).otherwise(lit(-1))
      }: _*)
    val counts = aggregate(
      shingles,
      array_repeat(lit(0), simhashBits),
      (acc, s) => zip_with(acc, bitVec(xxhash64(s)), (a, b) => a + b))
    (0 until simhashBits).map { k =>
      when(element_at(counts, k + 1) > 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** [[simhashFingerprints]] over already-exploded (id, shingle-hash) rows —
    * lets callers holding the persisted [[postings]] index derive
    * fingerprints without re-shingling the corpus.
    */
  private def simhashFromHashes(hashed: DataFrame, idCol: String): DataFrame = {
    val aggs = (0 until simhashBits).map { k =>
      sum(when(col("h").bitwiseAND(lit(1L << k)) =!= 0L, 1).otherwise(-1)).as(s"__sb$k")
    }
    hashed.groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        (0 until simhashBits).map { k =>
          when(col(s"__sb$k") > 0, lit(1L << k)).otherwise(lit(0L))
        }.reduce(_ + _).as("fp"))
  }

  /** SimHash fingerprints per document, scale-first: explode + hash once,
    * then one groupBy(doc) with 64 codegen'd conditional-sum aggregates,
    * packed back into a single long. Returns (idCol, fp).
    */
  def simhashFingerprints(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    simhashFromHashes(shingleHashes(docs, idCol, textCol, n), idCol)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash-blocked exact-duplicate pairs — the oracle-checkable form of
    * the SimHash pipeline. Identical shingle sets produce identical
    * fingerprints (SimHash is a deterministic function of the set), so
    * every identical-set pair collides in the fingerprint-equality join:
    * recall for the identical-set contract is structurally 1, no tuning.
    * Candidates are then verified for EXACT set equality (Jaccard == 1
    * over the full hash sets), so a coincidental fingerprint collision
    * between different sets never escapes.
    *
    * Result: all pairs (i < j) whose (nonempty) word-`n`-gram sets are
    * identical — an engine-hash-free contract a SQL oracle can recompute,
    * unlike raw [[simhashPairs]] Hamming values. Scale shape: one shuffle
    * of (id, 8-byte fp) for the blocking join; only colliding candidates
    * ever touch the hash sets.
    *
    * Output: (i, j, jaccard) with jaccard identically 1.0 — kept for the
    * family's common output contract.
    */
  def simhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val idx = postings(docs, idCol, textCol, n)
    val fp = simhashFromHashes(idx, idCol)
    val cand = fp.select(col(idCol).as("i"), col("fp"))
      .join(fp.select(col(idCol).as("j"), col("fp").as("fpj")),
        col("fp") === col("fpj")) // renamed: see ngramJaccardPairs
      .filter(col("i") < col("j"))
      .select("i", "j")
    val sets = hashSets(idx, idCol)
    cand
      .join(sets.select(col(idCol).as("i"), col("hs").as("hs_i")), Seq("i"))
      .join(sets.select(col(idCol).as("j"), col("hs").as("hs_j")), Seq("j"))
      .select(col("i"), col("j"),
        hashSetJaccard(col("hs_i"), col("hs_j")).as("jaccard"))
      .filter(col("jaccard") === 1.0)
  }

  /** SimHash near-dup pairs with Hamming distance <= `maxHamming`.
    *
    * Blocking is the pigeonhole split: the 64-bit fingerprint is cut into
    * `maxHamming + 1` chunks; two fingerprints within `maxHamming` bits must
    * agree on at least one whole chunk, so joining on (chunk index, chunk
    * value) finds every qualifying pair while only ever shuffling
    * (chunk, id, fingerprint) triples. Note the inherent trade-off: a larger
    * `maxHamming` means narrower chunks and weaker blocking — SimHash's
    * documented limitation versus MinHash-LSH.
    *
    * Output: (i, j, hamming).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < simhashBits, "0 <= maxHamming < 64")
    val chunks = maxHamming + 1
    val base = simhashBits / chunks
    val extra = simhashBits % chunks
    // chunk c covers [off(c), off(c+1)) where the first `extra` chunks get an
    // extra bit — all 64 bits covered, no overlap.
    val offsets = (0 to chunks).map(c => c * base + math.min(c, extra))
    // persisted: the chunk self-join reads the fingerprints from both sides,
    // and each is one (id, fp) long pair vs a 64-aggregate groupBy to rebuild
    val fp = simhashFingerprints(docs, idCol, textCol, n).persist()
    val chunked = fp.select(col(idCol), col("fp"),
      explode(array((0 until chunks).map { c =>
        val width = offsets(c + 1) - offsets(c)
        val mask = if (width == 64) -1L else (1L << width) - 1L
        struct(lit(c).as("c"),
          shiftright(col("fp"), offsets(c)).bitwiseAND(lit(mask)).as("v"))
      }: _*)).as("chunk"))
    chunked.select(col(idCol).as("i"), col("fp").as("fp_i"), col("chunk"))
      .join(chunked.select(col(idCol).as("j"), col("fp").as("fp_j"),
        col("chunk").as("chunkj")),
        col("chunk") === col("chunkj")) // renamed: see ngramJaccardPairs
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"), hamming(col("fp_i"), col("fp_j")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** MOSS-style fingerprint-overlap pairs: document pairs sharing at least
    * `minShared` winnowing fingerprints ([[graft.functions.WinnowFingerprints]]
    * — the `graft_winnow` kernel), with the overlap fraction
    * `n_shared / min(|fp_i|, |fp_j|)` (containment of the smaller set).
    * The winnowing guarantee makes this a substring-match detector: any
    * shared run of >= k+w-1 characters shares at least one fingerprint.
    *
    * Scale posture mirrors [[ngramJaccardPairs]]: candidates come from a
    * blocked self-join on the 8-byte fingerprint — never all pairs — and
    * fingerprints occurring in more than `maxDf` documents are dropped
    * first (boilerplate 8-grams otherwise make one hot fingerprint a
    * quasi-cartesian; MOSS's "ignore matches in many documents" rule).
    * The exchange moves (id, fp) longs only; the pruned posting list is
    * persisted because the document-frequency agg, both join sides, and
    * the per-doc size agg all re-read it.
    */
  def winnowOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, maxDf: Long, minShared: Long): DataFrame = {
    val f = docs.select(col(idCol).as("i"),
      explode(call_function("graft_winnow", col(textCol), lit(k), lit(w)))
        .as("fp"))
      .persist()
    val docFreq = f.groupBy("fp").agg(count(lit(1)).as("df"))
    val rare = f.join(docFreq.where(col("df") <= maxDf), "fp")
      .select(col("i"), col("fp"))
      .persist()
    val shared = rare
      .join(rare.select(col("i").as("j"), col("fp").as("__fp")),
        col("fp") === col("__fp") && col("i") < col("j"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
    val sizes = rare.groupBy("i").agg(count(lit(1)).as("nf"))
    shared
      .join(sizes.select(col("i"), col("nf").as("__ni")), "i")
      .join(sizes.select(col("i").as("j"), col("nf").as("__nj")), "j")
      .select(col("i"), col("j"), col("n_shared"),
        (col("n_shared").cast("double") /
          least(col("__ni"), col("__nj")).cast("double")).as("overlap"))
  }
}
