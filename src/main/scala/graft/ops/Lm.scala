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

  /** Persist `df` only when its plan is not already pinned.
    * `Dataset.storageLevel` resolves through the shared CacheManager by
    * PLAN, not object identity — so when a composed query (e.g. scoring
    * over a just-trained table, q102) re-derives the same frame, this
    * skips the second `.persist()` instead of logging the
    * "Asked to cache already cached data" warning that trains readers to
    * ignore warnings.
    */
  private def persistOnce(df: DataFrame): DataFrame =
    graft.core.CacheOnce.persistOnce(df)

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
    val pc = persistOnce(docs
      .select(explode(Shingles.wordNgramOccurrencesNative(col(textCol), 2)).as("bg"))
      .groupBy("bg")
      .agg(count(lit(1)).as("n_pair")))
    val cx = pc
      .groupBy(split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("n_pair")).as("n_ctx"))
    pc.join(cx, split(pc("bg"), " ").getItem(0) === cx("w1"))
      .where(col("n_pair") >= minCount)
      .select(pc("bg"), col("n_pair"), col("n_ctx"))
  }

  /** Kneser-Ney smoothed bigram table (absolute discounting, D = 3/4):
    * for every observed bigram,
    *
    *   P_kn(w2|w1) = (c - D)/c(w1) + D·N1+(w1·)/c(w1) · N1+(·w2)/N1+(··)
    *
    * where N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    * predecessors of w2 (the "how many contexts has w2 completed" novelty
    * count that makes KN the standard n-gram smoother), N1+(··) = total
    * distinct bigram types. Emitted as exact integer MILLIONTHS via one
    * common-denominator division:
    *
    *   p_mill = (10^6 · ((4c-3)·T + 3·N1w1·N2w2)) div (4·c(w1)·T)
    *
    * — all-integer, engine-portable (operands non-negative), no libm.
    * Smoothing statistics are computed over ALL observed bigrams; only the
    * OUTPUT is pruned to `minCount` (pruning before the stats would bias
    * every continuation count).
    *
    * Scale shape: one corpus explode + count (the only corpus-sized
    * shuffle); every other aggregate runs on the vocabulary-sized pair
    * table, and the three stat tables broadcast back. Overflow bound:
    * c(w1)·T must stay below ~2.3e12 for the 64-bit millionths product —
    * beyond that, promote the formula's operands to DECIMAL(38,0) on both
    * engine and oracle sides.
    */
  def kneserNeyTable(docs: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    // persisted: feeds all three stat aggs and the final join
    val pairs = persistOnce(docs
      .select(explode(Shingles.wordNgramOccurrencesNative(col(textCol), 2))
        .as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c"))
      .select(split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"), col("c")))
    val w1Stats = pairs.groupBy("w1")
      .agg(sum(col("c")).as("cw1"), count(lit(1)).as("n1w1"))
    val w2Stats = pairs.groupBy("w2").agg(count(lit(1)).as("n2w2"))
    val types = pairs.agg(count(lit(1)).as("t"))
    pairs
      .join(broadcast(w1Stats), "w1")
      .join(broadcast(w2Stats), "w2")
      .crossJoin(broadcast(types))
      .where(col("c") >= minCount)
      .select(col("w1"), col("w2"), col("c"),
        expr("(1000000 * ((4 * c - 3) * t + 3 * n1w1 * n2w2)) div " +
          "(4 * cw1 * t)").as("p_kn_mill"))
  }

  /** Interpolated trigram Kneser-Ney table (absolute discounting, D = 3/4,
    * backoff through the continuation-count bigram distribution) — the
    * standard corpus-fluency scorer, extending [[kneserNeyTable]] by one
    * order. For every observed trigram (w1,w2,w3):
    *
    *   P(w3|w1,w2) = (c - D)/c12 + D·n3/c12 · P2(w3|w2)
    *   P2(w3|w2)   = (m - D)/M  + D·nb/M  · p/T
    *
    * with every statistic derived from the TRIGRAM type/count tables (the
    * self-consistent convention that keeps engine and oracle identical):
    * c12 = Σ_w3 c (context mass), n3 = N1+(w1w2·) (distinct
    * continuations), m = N1+(·w2w3) (distinct predecessors of the bigram —
    * the continuation-novelty count), M = N1+(·w2·) (distinct (w1,w3)
    * around w2), nb = distinct w3 after w2 over trigram-derived bigram
    * TYPES, p = distinct w2 before w3 over the same, T = total such types.
    * Emitted as exact integer MILLIONTHS via one common-denominator
    * integral division:
    *
    *   p_mill = (10^6·(4·(4c-3)·M·T + 3·n3·((4m-3)·T + 3·nb·p)))
    *              div (16·c12·M·T)
    *
    * Intermediates are DECIMAL(38,0) (the widened-overflow promotion the
    * bigram table's scaladoc prescribes: the 64-bit bound c·M·T < ~5.7e11
    * that q104 lives under would not survive trigram-order statistics at
    * corpus scale; the oracle mirrors with HUGEINT). Operands are
    * non-negative, so integral division is floor division in both engines
    * and the only floating-point anywhere is none at all.
    *
    * Scale shape: one corpus explode + count (the only corpus-sized
    * shuffle); every statistic aggregates the vocabulary-bounded trigram
    * table and broadcasts back. Smoothing statistics run over ALL observed
    * trigrams; only the OUTPUT is pruned to `minCount` (pruning first
    * would bias every continuation count). The broadcast hints assume the
    * trigram TYPE table fits the broadcast budget — true for the bounded
    * vocabularies LM quality filters train on (the KenLM deployment
    * model); for an open-vocabulary web corpus drop the hints and AQE
    * plans the same joins as shuffles.
    */
  def kneserNeyTrigramTable(docs: DataFrame, textCol: String,
      minCount: Long): DataFrame = {
    // persisted: feeds the context/novelty aggs and the final join
    val tri = persistOnce(docs
      .select(explode(Shingles.wordNgramOccurrencesNative(col(textCol), 3))
        .as("tg"))
      .groupBy("tg").agg(count(lit(1)).as("c"))
      .select(split(col("tg"), " ").getItem(0).as("w1"),
        split(col("tg"), " ").getItem(1).as("w2"),
        split(col("tg"), " ").getItem(2).as("w3"), col("c")))
    val ctx = tri.groupBy("w1", "w2")
      .agg(sum(col("c")).as("c12"), count(lit(1)).as("n3"))
    // (w2,w3) is a KEY of mTbl, so mTbl's rows ARE the trigram-derived
    // bigram TYPES (w2,w3) — every lower-order statistic derives from it
    // instead of re-aggregating the (much larger) trigram table (r20,
    // guide §2.3 "aggregate before you shuffle" / §2.4 "share one
    // exchange"): mm = Σ_{w3} m (count of trigram types per w2 = sum of
    // per-(w2,w3) type counts, an exact integer identity), nb = row count
    // per w2, p = row count per w3, t = total row count. This replaces
    // two full re-aggregations of `tri` (mid, pairTypes-distinct) and the
    // pairTypes persist with aggregations over the bigram-type table, and
    // fuses mm+nb into ONE aggregation + ONE broadcast (both are keyed by
    // w2). Bit-identical output: every derived statistic is the same
    // exact integer.
    val mTbl = persistOnce(tri.groupBy("w2", "w3").agg(count(lit(1)).as("m")))
    val midNb = mTbl.groupBy("w2")
      .agg(sum(col("m")).as("mm"), count(lit(1)).as("nb"))
    val pTbl = mTbl.groupBy("w3").agg(count(lit(1)).as("p"))
    val types = mTbl.agg(count(lit(1)).as("t"))
    // every lower-order statistic attaches to the bigram-type table FIRST
    // (r21, guide §2.4/§3.1): the enrichment joins run over the
    // vocabulary-bounded mTbl (midNb/pTbl/types broadcast into it), and
    // the TRIGRAM-sized probe join then carries TWO broadcast relations
    // (ctx + the enriched bigram table) instead of five — three fewer
    // hash lookups per trigram row and three fewer broadcast relations
    // materialized against the corpus-sized side. Lossless inner joins:
    // every (w2, w3) of mTbl appears in midNb/pTbl by construction, so
    // the enriched row carries exactly the statistics the five-way join
    // attached — bit-identical output.
    val mEnriched = mTbl
      .join(broadcast(midNb), Seq("w2"))
      .join(broadcast(pTbl), Seq("w3"))
      .crossJoin(broadcast(types))
    tri
      .join(broadcast(ctx), Seq("w1", "w2"))
      .join(broadcast(mEnriched), Seq("w2", "w3"))
      .where(col("c") >= minCount)
      .select(col("w1"), col("w2"), col("w3"), col("c"),
        expr("(1000000 * (4 * (4 * cast(c as decimal(38,0)) - 3) * mm * t" +
          " + 3 * n3 * ((4 * cast(m as decimal(38,0)) - 3) * t" +
          " + 3 * cast(nb as decimal(38,0)) * p)))" +
          " div (16 * cast(c12 as decimal(38,0)) * mm * t)")
          .as("p_kn3_mill"))
  }

  /** Score documents against a trained trigram Kneser-Ney table
    * ([[kneserNeyTrigramTable]] schema: w1, w2, w3, c, p_kn3_mill) — the
    * corpus-fluency scorer at the order real quality filters use. Per
    * document, mirroring [[scoreDocuments]]'s contract one order up:
    *
    *   - `n_trigrams`: total trigram occurrences;
    *   - `n_oov`: occurrences absent from the table (unseen OR pruned by
    *     the table's `minCount` — pruning and scoring see the same
    *     vocabulary by construction);
    *   - `kn_mass`: Σ over in-table occurrences of `p_kn3_mill` — an
    *     exact long sum of integer millionths;
    *   - `oov_rate`: n_oov / n_trigrams, the one floating-point op.
    *
    * Documents with fewer than three tokens produce no trigrams and are
    * absent. Scale shape: the corpus-sized side is the one trigram
    * explode; the table side is vocabulary-bounded and joins on the
    * trigram string (AQE broadcasts it at runtime when it fits).
    */
  def scoreDocumentsTrigram(docs: DataFrame, idCol: String, textCol: String,
      table: DataFrame): DataFrame = {
    // single-space tokenization makes "w1 w2 w3" the exact occurrence
    // string, so the join key is one column, not three
    val kn = table.select(
      concat_ws(" ", col("w1"), col("w2"), col("w3")).as("tg"),
      col("p_kn3_mill"))
    val occ = docs.select(col(idCol),
      explode(Shingles.wordNgramOccurrencesNative(col(textCol), 3)).as("tg"))
    val oov: Column = sum(when(col("p_kn3_mill").isNull, 1L).otherwise(0L))
    occ.join(kn, Seq("tg"), "left")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_trigrams"),
        oov.as("n_oov"),
        coalesce(sum(col("p_kn3_mill")), lit(0L)).as("kn_mass"),
        (oov.cast("double") / count(lit(1)).cast("double")).as("oov_rate"))
  }

  /** Persist a trained LM table (any of [[bigramLm]] / [[kneserNeyTable]] /
    * [[kneserNeyTrigramTable]]) as plain parquet — the train-once /
    * score-many lifecycle real corpus pipelines run (the KenLM deployment
    * model: estimation is a batch job, scoring consumes the artifact).
    * Mirrors [[Similarity.saveIvfIndex]]: engine-neutral columnar rows any
    * reader (or the DuckDB oracle) can inspect, no serialized blobs.
    *
    * The table is vocabulary-bounded (not corpus-sized), so it lands as a
    * handful of files; scoring-side joins re-shuffle or broadcast it per
    * AQE, so no particular write layout is pinned.
    */
  def saveTable(table: DataFrame, path: String): Unit =
    table.write.mode("overwrite").parquet(path)

  /** Load a persisted LM table for scoring ([[scoreDocuments]] /
    * [[scoreDocumentsTrigram]]). Exactness survives the round-trip by
    * construction: every column is a string or an exact integer
    * (millionths), never a float.
    */
  def loadTable(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

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
