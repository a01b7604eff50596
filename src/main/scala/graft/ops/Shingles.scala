package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling (n-gram extraction) for near-duplicate detection.
  *
  * Pure `Column` functions over built-in higher-order expressions
  * (`transform`/`slice`/`array_join`) — no UDFs, fully codegen'd, no shuffle.
  * The distinct-shingle SET per document is the unit every similarity
  * operator downstream ([[NearDup]]) consumes.
  */
object Shingles {

  /** Native codegen'd shingles ([[graft.functions.WordShingles]], injected
    * as `graft_shingles` — requires a GraftExtensions session). Identical
    * values to [[wordShingles]]; this is what the hot paths use.
    */
  def wordShinglesNative(text: Column, n: Int): Column =
    call_function("graft_shingles", text, lit(n))

  /** Distinct word n-gram shingles of a single-space-tokenized text.
    * A document with fewer than `n` tokens yields an empty set (mirrors the
    * `range`-based oracle SQL; such documents simply pair with nothing).
    * Interpreted HOF reference formulation — see [[wordShinglesNative]] for
    * the hot-path form.
    */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(wordNgramOccurrences(text, n))

  /** Native codegen'd occurrence n-grams ([[graft.functions.TokenNgrams]],
    * injected as `graft_ngrams` — requires a GraftExtensions session).
    * Identical values to [[wordNgramOccurrences]]; this is what the hot
    * paths (LM counting/scoring) use.
    */
  def wordNgramOccurrencesNative(text: Column, n: Int): Column =
    call_function("graft_ngrams", text, lit(n))

  /** ALL word n-gram occurrences, duplicates preserved — the language-model
    * counting form ([[wordShingles]] deduplicates because similarity
    * operators consume SETS; frequency estimation must not).
    * Interpreted HOF reference formulation — see
    * [[wordNgramOccurrencesNative]] for the hot-path form.
    */
  def wordNgramOccurrences(text: Column, n: Int): Column = {
    require(n >= 1, "ngram size must be >= 1")
    val t = split(text, " ", -1)
    when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n),
        i => array_join(slice(t, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct character n-grams (for short strings / fuzzy keys). */
  def charNgrams(text: Column, n: Int): Column = {
    require(n >= 1, "ngram size must be >= 1")
    when(length(text) >= n,
      array_distinct(
        transform(sequence(lit(1), length(text) - (n - 1)),
          i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
}
