package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — the tokenizer-prep step of a
  * training-data pipeline, shaped for scale the way production BPE
  * trainers are: the CORPUS is touched exactly once (a token-frequency
  * aggregation); every merge iteration then runs over the distinct-token
  * VOCABULARY weighted by frequency. Vocabulary size is bounded (hundreds
  * of thousands of rows) regardless of whether the corpus is 1 GB or
  * 100 TB, so per-merge cost is corpus-size-independent.
  *
  * Classic word-internal BPE: symbols start as the token's characters;
  * each iteration counts adjacent symbol pairs (weighted by token
  * frequency), merges the most frequent pair everywhere (leftmost-greedy,
  * ties broken lexicographically for determinism), and repeats. The
  * vocabulary frame is `localCheckpoint`ed per iteration — the nested
  * merge expressions would otherwise stack one HOF per merge and planning
  * would degrade, the same lineage discipline as [[Components]].
  */
object Bpe {

  /** Distinct tokens with occurrence counts — the ONE corpus pass. */
  def tokenFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ", -1)).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy("tok")
      .agg(count(lit(1)).as("freq"))

  /** A token's initial symbol array: one element per Unicode CODE POINT —
    * `(?s).` matches exactly one code point, where `split(tok, "")` cuts
    * between UTF-16 units and would hand surrogate HALVES to the merge
    * loop on non-BMP text. Identical on BMP text, and the same unit
    * [[graft.functions.BpeCodec]] encodes with, so trained merges and the
    * encoder always agree on what a symbol is.
    */
  def symbols(tok: Column): Column =
    regexp_extract_all(tok, lit("(?s)."), lit(0))

  /** Adjacent symbol-pair counts over (syms: array<string>, freq: long),
    * weighted by token frequency. Output: (l, r, freq).
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("syms")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("freq"))

  /** Leftmost-greedy application of one merge (a, b) -> a+b to a symbol
    * array, as a single codegen-friendly fold: append each symbol unless
    * the accumulator ends with `a` and the current symbol is `b`, in which
    * case replace that tail with the merged symbol. Greedy-correct because
    * a merged symbol (`a+b`, length > |a|) can never equal `a`, so an
    * accumulator tail equal to `a` is always an unconsumed original.
    */
  def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
        element_at(acc, -1) === lit(a) && (x === lit(b)),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` merges over the corpus. Returns the ordered merge
    * table (rank, left, right, weighted pair frequency). Driver state per
    * iteration is ONE row (the argmax pair); the vocabulary stays
    * distributed and is checkpointed each round.
    */
  def trainMerges(docs: DataFrame, textCol: String,
      numMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = tokenFreqs(docs, textCol)
      .select(symbols(col("tok")).as("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("freq").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rank += 1
        merges += ((rank, l, r, f))
        vocab = vocab
          .select(applyMerge(col("syms"), l, r).as("syms"), col("freq"))
          .localCheckpoint()
      }
    }
    merges.result()
  }

  /** Segment a token column into BPE pieces with a trained merge table —
    * the ENCODING half of the tokenizer: [[trainMerges]] runs once, this
    * runs over every token of the corpus. Delegates to the native
    * codegen'd kernel ([[graft.functions.BpeEncode]], injected as
    * `graft_bpe`): the ranked merges ride the plan as the expression's
    * constant table (one parse at plan time, a hash probe per adjacent
    * pair at run time — per-token cost independent of table size), and
    * the per-row work stays inside whole-stage codegen. Map-only.
    */
  def encodePieces(tok: Column, merges: Seq[(String, String)]): Column =
    call_function("graft_bpe", tok,
      lit(graft.functions.BpeTable.format(merges)))

  /** Tokenize a corpus at scale: (idCol, pos, tok, pieces), one row per
    * token occurrence, `pos` its 0-based position in the document.
    *
    * The encode itself runs over the DISTINCT-token vocabulary, not the
    * corpus — the vocabulary is bounded (Heaps' law: sublinear in corpus
    * size) while occurrences are not, so at 100 TB the expensive merge
    * loop executes once per distinct token and the full-corpus work is an
    * equi-join of occurrences to their encoding on the token string.
    * Spark broadcasts the vocabulary side while it fits (AQE decides from
    * its measured size); past that it degrades to a hash join shuffling
    * (token, pieces) pairs — never document text.
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val occurrences = docs
      .select(col(idCol), posexplode(split(col(textCol), " ", -1)))
      .where(length(col("col")) > 0)
      .select(col(idCol), col("pos"), col("col").as("tok"))
    val vocab = occurrences.select("tok").distinct()
      .select(col("tok").as("__vtok"), // renamed: vocab descends from occurrences
        encodePieces(col("tok"), merges).as("pieces"))
    occurrences.join(vocab, col("tok") === col("__vtok"))
      .select(idCol, "pos", "tok", "pieces")
  }
}
