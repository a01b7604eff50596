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
      .select(split(col("tok"), "").as("syms"), col("freq"))
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
}
