package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition profiling: how much of a document's character
  * mass sits in repeated words. Boilerplate, navigation chrome, and
  * generation loops all concentrate characters in few distinct words, which
  * token-level distinct ratios ([[TextAnalysis.repetitionRatio]]) can
  * under-report when the repeated words are long.
  *
  * Exactness contract: every metric is a ratio of exact integer character /
  * token counts with ONE final IEEE division — bit-identical in any engine
  * at any parallelism (no floating-point accumulation anywhere).
  *
  * Scale shape: one explode to (id, word), one grouped count keyed
  * (id, word) — map-side combine collapses each document's occurrences
  * before the shuffle, so the exchange moves per-document DISTINCT words —
  * then one per-document aggregation. No joins; text never shuffles.
  */
object Repetition {

  /** Per-document repetition profile over whitespace words:
    *
    *   - `n_words`: total word occurrences;
    *   - `dup_word_frac`: fraction of occurrences that are repeats of an
    *     earlier word — `(n_words - n_distinct) / n_words`;
    *   - `dup_char_frac`: fraction of word-character mass in words that
    *     occur more than once;
    *   - `top_char_frac`: fraction of word-character mass in the single
    *     most character-heavy word (count × length);
    *   - `flagged`: the composite gate at the given thresholds.
    *
    * Documents whose words carry zero characters (empty text) report 0.0
    * fractions and are never flagged.
    */
  def wordRepetitionProfile(docs: DataFrame, idCol: String, textCol: String,
      maxDupWordFrac: Double = 0.5, maxDupCharFrac: Double = 0.5,
      maxTopCharFrac: Double = 0.2): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(idCol, "w")
      .agg(count(lit(1)).as("c"))
      .withColumn("cm", col("c") * length(col("w")))
    val frac = (n: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =>
      when(d > 0L, n.cast("double") / d.cast("double")).otherwise(lit(0.0))
    counts.groupBy(idCol)
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("__distinct"),
        sum(col("cm")).as("__total_cm"),
        coalesce(sum(when(col("c") > 1L, col("cm"))), lit(0L)).as("__dup_cm"),
        max(col("cm")).as("__top_cm"))
      .select(col(idCol), col("n_words"),
        frac(col("n_words") - col("__distinct"), col("n_words"))
          .as("dup_word_frac"),
        frac(col("__dup_cm"), col("__total_cm")).as("dup_char_frac"),
        frac(col("__top_cm"), col("__total_cm")).as("top_char_frac"))
      .withColumn("flagged",
        col("dup_word_frac") > maxDupWordFrac ||
          col("dup_char_frac") > maxDupCharFrac ||
          col("top_char_frac") > maxTopCharFrac)
  }
}
