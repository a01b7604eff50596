package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering: inference of a hashed linear text
  * classifier (the fastText architecture of Joulin et al. 2016, "Bag of
  * Tricks for Efficient Text Classification" — public paper: bag of
  * hashed unigram+bigram features → linear layer → decision), the
  * classifier-filter stage every large pretraining corpus runs (GPT-3 /
  * CCNet-style quality models).
  *
  * The feature space is [[Dsir]]'s hashed unigram+bigram buckets (same
  * portable rolling hash, same fused native kernel), the model is a
  * bucket→weight table, and the decision is `Σ_occurrences w[bucket] > 0`
  * — the sigmoid is monotone, so the linear score IS the decision rule,
  * and keeping it in exact integer millionths keeps engine and oracle
  * bit-identical (libm-free, the repo's oracle discipline).
  *
  * Scale story: inference is MAP-ONLY — the weight table is a closed-form
  * function of the bucket id ([[weightMill]]), so scoring 100 TB is one
  * scan with zero shuffle, zero broadcast, zero driver state: each
  * document's score folds inside its own row. A trained table swaps in as
  * a `buckets`-row broadcast join without changing the shape (see
  * [[scoreWithTable]]).
  */
object Classifier {

  /** Deterministic pseudo-weight of a feature bucket, in integer
    * millionths, range [−1000, 1000]: `((b · 2654435761 + seed) mod 2^40)
    * mod 2001 − 1000`. `b < buckets ≤ 2^20` keeps the product < 2^52 —
    * inside 63 bits in both engines (DuckDB raises on overflow).
    */
  def weightMill(b: Column, seed: Long): Column =
    (b * lit(2654435761L) + lit(seed)) % lit(1L << 40) % lit(2001L) - lit(1000L)

  /** Per-document classifier scores of `df`: (idCol, n_feats, score_mill,
    * keep). `keep = score_mill > 0`. Entirely within-row: the native
    * bucket kernel emits the feature occurrences, the weight fold runs
    * over that array — no shuffle anywhere in the plan (PlanSpec-pinnable:
    * zero Exchange).
    */
  def scoreDocs(df: DataFrame, idCol: String, textCol: String,
      buckets: Int, seed: Long): DataFrame =
    df.select(col(idCol),
        Dsir.featureBucketsNative(col(textCol), buckets).as("__fb"))
      .select(col(idCol),
        size(col("__fb")).cast("long").as("n_feats"),
        aggregate(col("__fb"), lit(0L),
          (acc, b) => acc + weightMill(b, seed)).as("score_mill"))
      .withColumn("keep", col("score_mill") > 0)

  /** The same decision with an EXPLICIT weight table `(b, w_mill)` — the
    * seam a trained model loads through: one corpus explode, one
    * `buckets`-row broadcast join, one per-document sum with map-side
    * partials (the [[Dsir.importanceWeights]] scoring shape).
    *
    * NOTE the inner-join semantics: a document with zero features, or
    * whose buckets are ALL absent from the table, emits no output row at
    * all (it has no evidence to score). Callers gating on the score must
    * treat a missing row as score 0 — see
    * [[graft.pipelines.StreamingNearDupIngest.classifierGate]]'s
    * anti-join formulation.
    */
  def scoreWithTable(df: DataFrame, weights: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    df.select(col(idCol),
        explode(Dsir.featureBucketsNative(col(textCol), buckets)).as("b"))
      .join(broadcast(weights), Seq("b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"),
        sum(col("w_mill")).as("score_mill"))
      .withColumn("keep", col("score_mill") > 0)

  /** IN-ENGINE TRAINING: fit the hashed linear model's weight table from
    * LABELED documents by closed-form per-bucket ridge regression — the
    * diagonal approximation of the least-squares normal equations on the
    * hashed feature counts (features treated as uncorrelated, the
    * standard closed form when the design matrix's off-diagonal Gram
    * terms are dropped):
    *
    *   w[b] = Σ_d c_{b,d} · y_d  /  (λ + Σ_d c²_{b,d})
    *
    * with y ∈ {+1, −1} from `labelCol` (true = positive class) and
    * c_{b,d} the document's occurrence count of bucket b. A bucket seen
    * mostly in positive documents gets a positive weight, so
    * `Σ_occurrences w[b] > 0` is the fastText-style decision
    * [[scoreWithTable]] already implements — the trained table drops into
    * the existing inference/save/load seam unchanged.
    *
    * Exact integer millionths (the oracle discipline): the floor division
    * runs on the NON-NEGATIVE magnitude and re-applies the sign — Spark's
    * `div` truncates toward zero while DuckDB's `//` floors, and they
    * agree only for non-negative operands.
    *
    * Scale shape: one corpus explode, one groupBy on (doc, bucket) for
    * the counts (map-side partials), one `buckets`-bounded reduction —
    * model state is B rows regardless of corpus size, the same bounded-
    * state property as [[Dsir]]. No driver-side math, no iteration.
    *
    * @return (b, w_mill) — the [[scoreWithTable]]/[[saveModel]] shape
    */
  def trainDiagRidge(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int, lambda: Long = 1L): DataFrame = {
    require(lambda >= 0L, "lambda >= 0")
    labeled
      .select(col(idCol),
        when(col(labelCol), lit(1L)).otherwise(lit(-1L)).as("y"),
        explode(Dsir.featureBucketsNative(col(textCol), buckets)).as("b"))
      .groupBy(col(idCol), col("y"), col("b"))
      .agg(count(lit(1)).as("c"))
      .groupBy("b")
      .agg(sum(col("c") * col("y")).as("num"),
        (sum(col("c") * col("c")) + lit(lambda)).as("den"))
      .select(col("b"),
        expr("CASE WHEN num >= 0 THEN (1000000 * num) div den " +
          "ELSE -((1000000 * -num) div den) END").as("w_mill"))
  }

  /** The closed-form model as a table (for [[scoreWithTable]] round-trip
    * tests and as the save/load artifact shape).
    */
  def weightTable(spark: org.apache.spark.sql.SparkSession, buckets: Int,
      seed: Long): DataFrame = {
    import spark.implicits._
    (0 until buckets).map(_.toLong).toDF("b")
      .select(col("b"), weightMill(col("b"), seed).as("w_mill"))
  }

  /** Persist a weight table as plain engine-neutral parquet rows —
    * train-once/score-many, the [[Lm.saveTable]] lifecycle for the
    * classifier (a REAL trained model drops in through the same seam).
    */
  def saveModel(weights: DataFrame, path: String): Unit =
    weights.select("b", "w_mill").write.mode("overwrite").parquet(path)

  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(path)
}
