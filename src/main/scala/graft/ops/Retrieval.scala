package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus: BM25 top-k — the lexical-search
  * operator a training-data pipeline runs for targeted corpus probes
  * (decontamination triage, eval-set leakage checks, "show me documents
  * about X" audits) where the embedding ANN family ([[Similarity]]) is the
  * semantic twin.
  *
  * Scale shape: the query term set is a plan literal, so the explode is
  * filtered MAP-SIDE — document text never shuffles; what moves is one
  * (doc_id, term, tf) row per matched term per document. Document
  * frequencies aggregate from that matched table (≤ |terms| rows) and
  * broadcast back; corpus totals (N docs, total tokens) ride along as a
  * broadcast single-row frame, never a driver collect. The final top-k is
  * orderBy+limit, which Spark plans as TakeOrderedAndProject — per-partition
  * heaps + a k-row driver merge, not a global sort.
  *
  * Determinism: Robertson's log-idf is replaced by its rational surrogate
  * idf = (2N - 2df + 1) / (2df + 1) — the same (N - df + 0.5)/(df + 0.5)
  * odds ratio WITHOUT the log (libm `ln` is engine-dependent at the ULP;
  * +,*,/ are IEEE exactly-rounded everywhere). Monotone in df like the
  * original, so single-term ranking is preserved; multi-term sums weight
  * rare terms more sharply than the log form — a documented, deterministic
  * variant, bit-reproducible across engines. Per-document contributions
  * sum in sorted-term order via an explicit left fold, so the double sum
  * is order-fixed at any parallelism.
  */
object Retrieval {

  /** Top-`k` documents by BM25 (rational-idf variant) for `queryTerms`.
    * Output: doc_id (as `idCol`), `score` (double), `n_terms` matched.
    * Ties break by ascending id, so the cut is deterministic.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")

    val base = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("t"))

    // corpus totals as a broadcast 1-row frame (in-plan, retry-safe)
    val totals = base.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(size(col("t"))).cast("double").as("n_toks"))

    val tf = base
      .select(col(idCol), size(col("t")).cast("double").as("dl"),
        explode(col("t")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))

    val df = tf.groupBy("term").agg(count(lit(1)).cast("double").as("df"))

    // mirror this arithmetic SHAPE exactly in any oracle: every +,*,/ is
    // IEEE exactly-rounded, so an identical tree gives identical bits
    val idf = (lit(2.0) * col("n_docs") - lit(2.0) * col("df") + lit(1.0)) /
      (lit(2.0) * col("df") + lit(1.0))
    val rel = col("dl") * col("n_docs") / col("n_toks")
    // fold k1+1 and 1-b IN-PLAN (not in Scala): Catalyst and the oracle
    // engine then constant-fold the same IEEE additions, so a k1 whose
    // sum lands on a rounding midpoint still agrees bit-for-bit
    val frac = ((lit(k1) + lit(1.0)) * col("tf")) /
      (col("tf") + lit(k1) * ((lit(1.0) - lit(b)) + lit(b) * rel))

    val contrib = tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(totals))
      .select(col(idCol), col("term"), (idf * frac).as("contrib"))

    contrib.groupBy(idCol)
      .agg(
        aggregate(
          transform(
            array_sort(collect_list(struct(col("term"), col("contrib")))),
            s => s.getField("contrib")),
          lit(0.0), (acc, x) => acc + x).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
