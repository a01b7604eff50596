package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model estimation and document scoring — the corpus-level
  * fluency filter of a pre-training pipeline (CC-Net-style: score every
  * document against an LM and gate on the score).
  *
  * All arithmetic stays in the integer domain so the result is bit-exact at
  * any parallelism and in any engine: per-bigram probabilities are scaled to
  * integer millionths with INTEGRAL division (`div`, matching DuckDB `//`
  * for the non-negative operands counts are), summed exactly as longs, and
  * the only floating-point op is one final IEEE division per output row.
  * A true log-probability would hit libm: `ln` is not correctly-rounded and
  * differs between Java and other engines in the last ULP — the scaled
  * rational form keeps the same ordering information without it.
  *
  * Scale shape: the LM table is bigram-vocabulary-sized (bounded by the
  * token vocabulary squared, Zipf-truncated by `minCount` in practice —
  * millions of rows, not corpus-sized). Scoring is one explode (map-only),
  * one hash join on the bigram string, one per-document aggregation. The
  * occurrence stream never carries document text — only (id, bigram).
  */
object Lm {

  /** Train a count-thresholded bigram LM from a corpus: one row per bigram
    * with `n_pair` (its occurrence count) and `n_ctx` (its first word's
    * total continuation count), keeping bigrams seen at least `minCount`
    * times. `n_pair / n_ctx` is the conditional MLE P(w2 | w1).
    *
    * Two grouped aggregations with map-side partials; the context agg runs
    * over the already-reduced pair table, not the corpus.
    */
  def bigramLm(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    // persisted: the pair table feeds BOTH the context agg and the join's
    // probe side — without it the corpus explode + count (the expensive
    // stage) re-executes for each. Vocabulary-sized, so pinning it is
    // bounded regardless of corpus size.
    val pc = docs
      .select(explode(Shingles.wordNgramOccurrencesNative(col(textCol), 2)).as("bg"))
      .groupBy("bg")
      .agg(count(lit(1)).as("n_pair"))
      .persist()
    val cx = pc
      .groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("n_pair")).as("n_ctx"))
    pc.join(cx, split(pc("bg"), " ").getItem(0) === cx("w1"))
      .where(col("n_pair") >= minCount)
      .select(pc("bg"), col("n_pair"), col("n_ctx"))
  }

  /** Score documents against a trained bigram LM ([[bigramLm]] schema:
    * bg, n_pair, n_ctx). Per document:
    *
    *   - `n_bigrams`: total bigram occurrences;
    *   - `n_oov`: occurrences whose bigram is absent from the LM;
    *   - `prob_mass`: Σ over in-LM occurrences of
    *     `(1000000 * n_pair) div n_ctx` — integer millionths of the
    *     conditional probability, an exact long sum;
    *   - `oov_rate`: n_oov / n_bigrams, the one floating-point op.
    *
    * Documents with fewer than two tokens produce no bigrams and are
    * absent from the output (mirrors the n-gram contract in
    * [[Shingles.wordNgramOccurrences]]).
    */
  def scoreDocuments(docs: DataFrame, idCol: String, textCol: String,
      lm: DataFrame): DataFrame = {
    val occ = docs.select(col(idCol),
      explode(Shingles.wordNgramOccurrencesNative(col(textCol), 2)).as("bg"))
    val oov: Column = sum(when(col("n_pair").isNull, 1L).otherwise(0L))
    occ.join(lm, Seq("bg"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        oov.as("n_oov"),
        coalesce(sum(when(col("n_pair").isNotNull,
          expr("(1000000 * n_pair) div n_ctx"))), lit(0L)).as("prob_mass"),
        (oov.cast("double") / count(lit(1)).cast("double")).as("oov_rate"))
  }
}
