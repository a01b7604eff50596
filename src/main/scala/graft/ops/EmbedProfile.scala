package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-space corpus diagnostics: per-group centroids and the members
  * least cohesive with their own group — the curation view that surfaces
  * mislabeled / drifted / junk vectors before they poison contrastive or
  * clustering stages downstream ([[Similarity]] is the retrieval twin;
  * this is the quality twin).
  *
  * Exactness: a float centroid is a SUM, and double summation is
  * order-dependent — a naive `avg` differs run-to-run with partitioning.
  * Components are therefore floor-scaled to 2^20 integers first
  * (`floor(x * 2^20)` — floor, not cast: engines disagree on cast's
  * round-vs-truncate, floor is IEEE-exact everywhere), summed as longs
  * (associative, partitioning-independent), and divided once. Cosines then
  * fold left-to-right in dimension order, so every number this operator
  * emits is bit-identical at any parallelism. Scaled-sum magnitude is
  * bounded by n_group * 2^20 * max|x| — keep below 2^53 (≈ 8e15): ample
  * for unit-normalized embeddings at billions of rows per group.
  *
  * Scale shape: the component sum shuffles (label, dim) longs — dim * n
  * fixed-width rows, map-side combined, never gathered; centroids (groups
  * × dim doubles) broadcast back; the outlier rank is a per-group window.
  */
object EmbedProfile {

  private val Scale = 1048576.0 // 2^20

  /** Bottom-`k` least-cohesive vectors per `labelCol` group by cosine to
    * the group centroid. Output: id, label, `cos_centroid`, `rnk` (1 =
    * worst). Ties break by ascending id.
    */
  def groupOutliers(embs: DataFrame, idCol: String, labelCol: String,
      vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")

    // each HOF stage projected separately (interpreted-chain gotcha)
    val scaled = embs.select(col(idCol), col(labelCol),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(Scale)).cast("double")).as("v"))

    val sums = scaled
      .select(col(labelCol), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col(labelCol), col("dim"))
      .agg(sum(col("x").cast("long")).as("sm"), count(lit(1)).as("n"))

    val centroids = sums.groupBy(labelCol)
      .agg(transform(
        array_sort(collect_list(struct(col("dim"),
          (col("sm").cast("double") / col("n").cast("double")).as("c")))),
        s => s.getField("c")).as("c"))

    val dot = aggregate(zip_with(col("v"), col("c"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    def norm(v: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(v, x => x * x), lit(0.0), (acc, x) => acc + x))

    val byLabel = Window.partitionBy(labelCol)
      .orderBy(col("cos_centroid").asc, col(idCol).asc)
    scaled.join(broadcast(centroids), labelCol)
      .select(col(idCol), col(labelCol),
        (dot / (norm(col("v")) * norm(col("c")))).as("cos_centroid"))
      .withColumn("rnk", row_number().over(byLabel))
      .where(col("rnk") <= k)
      .select(col(idCol), col(labelCol), col("cos_centroid"),
        col("rnk").cast("int").as("rnk"))
  }
}
