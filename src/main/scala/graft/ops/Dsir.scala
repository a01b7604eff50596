package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: hashed n-gram importance weighting of a raw
  * corpus against a target domain (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling" — public paper; the
  * bag-of-hashed-ngrams formulation, not the code).
  *
  * Both distributions are estimated as Laplace-smoothed frequencies over a
  * FIXED-SIZE bucket table (`buckets` hashed unigram+bigram features), so
  * the model state is bounded regardless of corpus size — the property
  * that lets the same program run at 100 TB: ONE persisted raw-corpus
  * feature pass shared by the histogram aggregation and the scoring join,
  * one target-corpus feature pass, one B-row broadcast join, one
  * per-document sum. No vocabulary-sized state, no global sort.
  *
  * Engine-portable arithmetic throughout (the repo's oracle discipline):
  * bucket ids come from the winnowing rolling hash (`a*31+c` over char
  * codes, mod `2^40` in the loop so neither engine can overflow, then mod
  * `buckets`), and probabilities are exact integer MILLIONTHS via floor
  * division. The per-document weight is
  *
  *   weight_mill = Σ_occurrences (p_target_mill[b] − p_raw_mill[b])
  *
  * — a log-free linear surrogate of DSIR's Σ log(p/q): same sign per
  * feature, same "target-like minus raw-like" decision boundary at 0, and
  * an exact long sum both engines agree on bit-for-bit (Σ log p/q needs
  * libm and diverges across engines in the last ulp). Selection composes
  * downstream: `weight_mill > 0` is the map-only gate, top-fraction
  * selection can reuse the distributed prefix-sum machinery
  * ([[graft.keys.GlobalIndex]]) when a budget is required.
  */
object Dsir {

  /** Modulus keeping the rolling-hash fold overflow-free in BOTH engines:
    * acc < 2^40, so acc*31 + c < 2^45 « 2^63 (DuckDB BIGINT overflow
    * RAISES rather than wraps, so staying inside 63 bits is correctness,
    * not hygiene).
    */
  private val hashMod = 1L << 40

  /** Portable feature bucket of a non-empty string: rolling hash of its
    * char codes folded mod 2^40, reduced mod `buckets`. Non-negative by
    * construction (all operands non-negative).
    */
  def featureBucket(s: Column, buckets: Int): Column =
    aggregate(
      transform(split(s, ""), c => ascii(c).cast("long")),
      lit(0L), (a, c) => (a * 31 + c) % hashMod) % buckets

  /** Hashed unigram+bigram feature OCCURRENCES of a document (duplicates
    * preserved — frequency estimation, like the LM counting form).
    * Interpreted HOF reference formulation; [[featureBucketsNative]] is
    * the hot-path form (DsirSpec pins value-identity).
    */
  def featureBuckets(text: Column, buckets: Int): Column =
    transform(
      concat(Shingles.wordNgramOccurrencesNative(text, 1),
        Shingles.wordNgramOccurrencesNative(text, 2)),
      s => featureBucket(s, buckets))

  /** Fused one-pass form of [[featureBuckets]]
    * ([[graft.functions.DsirBuckets]], injected as `graft_dsir_buckets` —
    * requires a GraftExtensions session): no n-gram strings are ever
    * materialized, the unigram and bigram hash states advance together
    * over one scan of the text.
    */
  def featureBucketsNative(text: Column, buckets: Int): Column =
    call_function("graft_dsir_buckets", text, lit(buckets))

  private def persistOnce(df: DataFrame): DataFrame =
    graft.core.CacheOnce.persistOnce(df)

  /** Laplace-smoothed bucket histogram of a corpus, in exact integer
    * millionths: one row per OBSERVED bucket with
    * `p_mill = (10^6 · (cnt+1)) div (total + buckets)`; unobserved buckets
    * implicitly carry `p0_mill = 10^6 div (total + buckets)`, returned as
    * the second element. One corpus-sized explode + one B-bounded agg.
    */
  def bucketHistogram(docs: DataFrame, textCol: String,
      buckets: Int): (DataFrame, Long) =
    histogramOf(docs
      .select(explode(featureBucketsNative(col(textCol), buckets)).as("b")),
      buckets)

  /** [[bucketHistogram]] over an already-exploded single-column `b` frame
    * (lets the raw corpus share ONE exploded pass between its histogram
    * and the scoring join).
    */
  private def histogramOf(feats: DataFrame, buckets: Int): (DataFrame, Long) = {
    val counts = feats
      .groupBy("b").agg(count(lit(1)).as("cnt"))
      .persist()
    val total = counts.agg(sum(col("cnt"))).first().getLong(0)
    val denom = total + buckets
    // `div`, not `/`: Spark's `/` promotes longs to double — the oracle's
    // floor division must be matched exactly
    val hist = counts.select(col("b"),
      expr(s"(1000000 * (cnt + 1)) div $denom").as("p_mill"))
    (hist, 1000000L / denom)
  }

  /** Per-document importance weights of `raw` against `target`:
    * (idCol, n_feats, weight_mill, keep). `keep = weight_mill > 0` — the
    * document's features look more target-domain than raw-average.
    *
    * Scale shape: both histograms are B-row broadcasts; the scoring pass
    * is one raw-corpus explode, one broadcast join, one groupBy(id) sum
    * with map-side partials.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame = {
    // ONE raw-corpus explode, persisted: its histogram agg AND the scoring
    // join both read the cached (id, b) frame — without it the corpus'
    // bucketing pass (the expensive map stage) runs twice
    val rawFeats = persistOnce(raw.select(col(idCol),
      explode(featureBucketsNative(col(textCol), buckets)).as("b")))
    val (tgtHist, tgtP0) = bucketHistogram(target, textCol, buckets)
    val (rawHist, rawP0) = histogramOf(rawFeats.select("b"), buckets)
    val deltas = tgtHist.select(col("b"), col("p_mill").as("tp"))
      .join(rawHist.select(col("b"), col("p_mill").as("rp")), Seq("b"), "full")
      .select(col("b"),
        (coalesce(col("tp"), lit(tgtP0)) -
          coalesce(col("rp"), lit(rawP0))).as("delta_mill"))
    rawFeats
      .join(broadcast(deltas), Seq("b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        sum(col("delta_mill")).as("weight_mill"))
      .withColumn("keep", col("weight_mill") > 0)
  }
}
