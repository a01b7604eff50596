package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language-ID heuristics, fingerprinting.
  *
  * Everything here is a pure `Column` function composed from built-in
  * Catalyst expressions — fully codegen'd, no UDFs, so the hot path stays
  * inside WholeStageCodegen and scales linearly with input splits (no
  * shuffle is introduced by any op in this object).
  */
object TextAnalysis {

  /** Whitespace tokens. Single-space split to stay byte-compatible with the
    * oracle's `string_split(text, ' ')`; see [[tokensWs]] for the
    * any-whitespace variant.
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  /** Any-whitespace tokenization (the engine-default for real corpora). */
  def tokensWs(text: Column): Column = split(text, "\\s+", -1)

  /** BPE-ish subword segmentation: splits on whitespace AND at
    * letter/digit/punctuation boundaries, the usual pre-tokenizer shape.
    */
  def tokensBpeish(text: Column): Column =
    split(text, "\\s+|(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])", -1)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Model-free dense document embedding ([[graft.functions.HashEmbed]],
    * injected as `graft_hash_embed`): the hashing trick over the DSIR
    * uni+bigram feature space composed with the sign random projection —
    * one fused pass over the text, exact integer output. Gives raw text a
    * vector column the ANN / cosine-dedup stack can run on with no
    * trained model anywhere in the pipeline.
    */
  def hashEmbed(text: Column, buckets: Int, outDim: Int, seed: Int): Column =
    call_function("graft_hash_embed", text, lit(buckets), lit(outDim), lit(seed))

  def charCount(text: Column): Column = length(text)

  /** Mean token length — exact int sum / exact int count, one IEEE division. */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0), (acc, x) => acc + length(x)).cast("double") /
      size(t).cast("double")
  }

  /** Fraction of characters that are not letters, digits, or whitespace.
    * Unicode classes (`\p{L}\p{N}`) so non-ASCII letters don't count as
    * punctuation; both Java regex (Spark) and RE2 (DuckDB oracle) support
    * them with identical semantics.
    */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[\\p{L}\\p{N}\\s]", "")).cast("double") /
      length(text).cast("double")

  /** Fraction of tokens found in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    size(filter(t, x => array_contains(stops, x))).cast("double") /
      size(t).cast("double")
  }

  /** Small per-language function-word lists for the language-ID heuristic.
    * Real deployments plug in larger lists; the operator shape (score per
    * language, argmax) is what matters at scale.
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour"))

  /** Stopword-hit ratio for one language. */
  def langScore(text: Column, lang: String): Column =
    stopwordRatio(text, langStopwords(lang))

  /** Heuristic language label: argmax of [[langScore]] over the known
    * languages, 'und' (undetermined) when no language scores above `minHit`.
    */
  def langId(text: Column, minHit: Double = 0.01): Column = {
    val scored = langStopwords.keys.toSeq.sorted
      .map(l => struct(langScore(text, l).as("s"), lit(l).as("l")))
    val best = array_max(array(scored: _*))
    when(best.getField("s") >= minHit, best.getField("l")).otherwise(lit("und"))
  }

  /** Composite quality score in [0,1]: penalizes extreme length, high
    * punctuation, low stopword mass — the usual pre-training heuristics
    * (cf. C4/Gopher-style rules). Exact double arithmetic: every operand
    * derives from ints, so the result is engine-reproducible bit-for-bit.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenOk = when(nTok >= 10 && nTok <= 100000, lit(1.0)).otherwise(lit(0.0))
    val punct = punctRatio(text)
    val punctOk = when(punct <= 0.2, lit(1.0) - punct).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text, stopwords) >= 0.005, lit(1.0))
      .otherwise(lit(0.5))
    (lenOk + punctOk + stopOk) / lit(3.0)
  }

  /** Gopher-style n-gram repetition signal: `1 - distinct/total` n-grams,
    * 0 for documents shorter than `n` tokens. Exact integer counts, one
    * IEEE division — engine-reproducible bit-for-bit. High values mean the
    * document repeats itself (boilerplate, generation loops).
    */
  def repetitionRatio(text: Column, n: Int): Column = {
    val total = size(tokens(text)) - (n - 1)
    val dist = size(Shingles.wordShinglesNative(text, n))
    when(total > lit(0),
      lit(1.0) - dist.cast("double") / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** C4-style line filter: keep only lines with at least `minTokens`
    * whitespace tokens that end in terminal punctuation; rejoin with
    * newlines. The standard boilerplate-line scrub (nav menus, footers,
    * list fragments).
    */
  def filterLines(text: Column, minTokens: Int): Column =
    array_join(
      filter(split(text, "\n", -1), l =>
        size(split(l, " ", -1)) >= minTokens && l.rlike("[.!?]$")),
      "\n")

  /** Web-corpus markup scrub: drop HTML/XML tags, decode the five basic
    * entities, collapse whitespace — the first pass of any web-scrape
    * cleaning recipe (full HTML parsing is a DOM library's job upstream;
    * at corpus scale the regex scrub is the map-only engine-side form).
    *
    * Order matters and is part of the contract: tags are stripped BEFORE
    * entity decoding (so `&lt;p&gt;` decodes to a literal "<p>" and is
    * kept as text, not re-interpreted as a tag), and `&amp;` decodes LAST
    * (so `&amp;lt;` yields "&lt;", the standard double-escape rule).
    * Whitespace collapses over the explicit { space \t \n \f \r } class —
    * Java's `\s` and RE2's disagree on vertical tab.
    */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "[\\t\\n\\f\\r ]+", " "))
  }

  /** Deterministic sampling bucket in [0, 100) from a numeric id — the
    * reproducible alternative to `rand()`-based sampling for corpus
    * mixing: the same row lands in the same bucket on every run, every
    * engine, every retry (a `rand()` sample is neither rerun-stable nor
    * task-retry-safe). Knuth-style multiplicative scatter; plain integer
    * arithmetic so any SQL engine reproduces it.
    */
  def sampleBucket(id: Column): Column =
    pmod(id.cast("long") * lit(1000003L), lit(100L))

  /** Weighted corpus mix: keep a row iff its [[sampleBucket]] falls under
    * the per-key percentage from `rates` (e.g. lang -> 80 meaning 80%).
    * Map-only; composes with any downstream op.
    */
  def mixFilter(id: Column, key: Column, rates: Map[String, Int],
      defaultRate: Int): Column = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(key === lit(k), lit(r)).otherwise(acc)
    }
    sampleBucket(id) < rate
  }

  /** PII-scrubbing patterns (corpus prep). Deliberately plain regexes — no
    * lookaround, no backreferences — so Java regex (Spark) and RE2 (the
    * DuckDB oracle) agree character-for-character.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^\\s]+"

  /** Redact emails and URLs to typed placeholder tokens — the standard
    * pre-training scrub. Map-only, codegen'd regexp_replace chain.
    */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      urlPattern, "<URL>")

  /** Canonical-form fingerprint: md5 of (lowercased, whitespace-collapsed,
    * trimmed) text. Exact-dup detection robust to case/whitespace formatting
    * — groupBy this column is a pure hash shuffle on a 32-char key.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")).cast("binary"))

  /** 64-bit content fingerprint (xxhash64 of the canonical form) — cheaper
    * join/shuffle key than the md5 hex string at 100 TB (8 bytes vs 32).
    * Engine-specific hash → verified by tests, not the SQL oracle.
    */
  def fingerprint64(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Per-character codepoint array of a text column (`split` on the empty
    * pattern yields one element per character; empties from pattern edges
    * are filtered out). Materialize this as its own projected column and
    * feed the attribute to [[kgramHashesFromCodes]] — see the evaluation
    * -cost note there.
    */
  def charCodes(text: Column): Column =
    transform(filter(split(text, ""), c => length(c) === 1),
      c => ascii(c).cast("long"))

  /** Rolling polynomial hash (base 31) of every k-gram of a MATERIALIZED
    * codepoint array column ([[charCodes]]) — exact int64, no modulus:
    * codepoints <= 0x10FFFF keep the value under 2^63 for k <= 9 (ASCII
    * corpora: k <= 11). Fewer than k codes hash to an empty array.
    *
    * Evaluation-cost note (higher-order functions are interpreted, with no
    * cross-invocation subexpression reuse): `codes` MUST be a projected
    * attribute, not the charCodes expression inline — each gram slices it,
    * and re-deriving the array per gram would cost O(n²) string work per
    * document. As an attribute the slice is a cheap 8-element copy and the
    * whole column is O(n·k) integer folds. The multiple references to
    * `codes` here are what stop CollapseProject from inlining a non-cheap
    * alias back in.
    */
  def kgramHashesFromCodes(codes: Column, k: Int): Column =
    when(size(codes) >= k,
      transform(sequence(lit(1), size(codes) - (k - 1)), i =>
        aggregate(slice(codes, i, lit(k)), lit(0L), (a, c) => a * 31L + c)))
      .otherwise(array().cast("array<long>"))

  /** One-shot convenience form over a text column: correct anywhere, but
    * for large corpora prefer the two-projection shape
    * `select(charCodes(text) as "codes")` → `kgramHashesFromCodes(col(
    * "codes"), k)` — this inline form re-derives the char array per gram.
    */
  def kgramHashes(text: Column, k: Int): Column =
    when(length(text) >= k,
      transform(sequence(lit(1), length(text) - (k - 1)), i =>
        aggregate(
          filter(split(text.substr(i, lit(k)), ""), c => length(c) === 1),
          lit(0L), (a, c) => a * 31L + ascii(c))))
      .otherwise(array().cast("array<long>"))

  /** Winnowing selection (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the MOSS
    * document-fingerprint sketch) over an ALREADY-MATERIALIZED k-gram hash
    * array column: min hash of every w-window, deduplicated and sorted.
    * Any substring of length >= w + k - 1 shared by two documents
    * contributes a shared fingerprint, so fingerprint overlap is a
    * near-copy detector costing one map-side projection plus whatever join
    * the caller builds on the (doc, fp) pairs.
    *
    * `hashes` MUST be a projected column (`.select(kgramHashes(...) as
    * "hs")` first), not the [[kgramHashes]] expression inline: it is read
    * once per window here, and re-evaluating the O(n·k) subtree per window
    * would be O(n²·k) per document. Two Projects stay separate exactly
    * because this expression references `hashes` more than once —
    * Catalyst's CollapseProject refuses to duplicate non-cheap aliases.
    * Fewer than w hashes yield an empty fingerprint set.
    */
  def winnowSelect(hashes: Column, w: Int): Column =
    when(size(hashes) >= w,
      array_sort(array_distinct(transform(
        sequence(lit(1), size(hashes) - (w - 1)),
        j => array_min(slice(hashes, j, lit(w)))))))
      .otherwise(array().cast("array<long>"))
}
