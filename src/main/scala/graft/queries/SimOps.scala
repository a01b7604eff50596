package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{NearDup, Similarity}

/** Oracle-checked queries for the similarity-search / near-dup operator
  * family: ANN over the `embeddings` table, n-gram Jaccard and MinHash-LSH
  * near-dup over `documents`.
  *
  * q23/q25 are exact and DuckDB-verified. q26 is the LSH-accelerated pipeline
  * whose VERIFIED output equals the exact answer (candidates are checked
  * against true Jaccard), so it shares q25's oracle — the correctness gate
  * itself proves the LSH recall. q24/q27 are approximate/engine-hashed and
  * carry no SQL oracle (unit-tested instead).
  */
object SimOps {

  private val topK = 5
  private val nShingle = 3
  private val minJaccard = 0.8

  /** Brute-force exact cosine top-k (the correctness baseline): 20 query
    * vectors scored against the whole corpus, per-query window rank.
    */
  private def q23AnnCosine(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", topK)
  }

  /** Random-hyperplane LSH ANN — the bucketed scale path (no oracle: recall
    * is tunably < 1 by design; SimilaritySpec asserts high recall on
    * clustered data, the regime LSH exists for — on THIS corpus of uniform
    * random vectors no locality structure exists and recall is low, which is
    * the textbook curse-of-dimensionality behavior, not a defect).
    */
  private def q24AnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(
      emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", topK,
      numPlanes = 4)
  }

  /** Exact word-3-gram Jaccard near-dup pairs via inverted shingle index —
    * never an all-pairs crossJoin.
    */
  private def q25NgramJaccard(s: SparkSession, d: String): DataFrame =
    NearDup.ngramJaccardPairs(
      Tables.documents(s, d), "doc_id", "text", nShingle, minJaccard)

  /** MinHash(64 perms) + LSH(16 bands × 4 rows) near-dup, exact-verified:
    * must produce the identical pair set to q25 while shuffling signatures
    * instead of shingles.
    */
  private def q26MinhashLsh(s: SparkSession, d: String): DataFrame =
    NearDup.minhashLshPairs(
      Tables.documents(s, d), "doc_id", "text", nShingle, minJaccard)

  /** SimHash(64-bit) near-dup with pigeonhole chunk blocking (engine-hash
    * fingerprints — unit-tested, no SQL oracle). Threshold calibrated to the
    * corpus: the planted Jaccard>=0.9 pairs land at Hamming <= 10 (small
    * shingle sets make SimHash noisy); 11 chunks of ~6 bits still block
    * effectively at this cardinality, and the trade-off (higher threshold →
    * narrower chunks → weaker blocking) is SimHash's documented limitation.
    */
  private def q27Simhash(s: SparkSession, d: String): DataFrame =
    NearDup.simhashPairs(
      Tables.documents(s, d), "doc_id", "text", nShingle, maxHamming = 10)

  /** Embedding-cosine near-dup pairs, sign-bucket LSH blocked + exact
    * verified. The corpus is unioned with a ×2-scaled copy of itself
    * (vec_id + 1e6): power-of-two scaling is EXACT in IEEE float, so every
    * planted pair is bit-for-bit parallel to its source — identical sign
    * pattern on every hyperplane — making LSH recall exactly 1 and the
    * result set equal to the exact all-pairs answer (random uniform
    * vectors top out near cos 0.6, far below the 0.999 gate). That is what
    * lets an LSH-blocked pipeline share an exact DuckDB oracle.
    */
  private def q30CosineNearDup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val planted = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    Similarity.cosineNearDupPairs(
      emb.union(planted), "vec_id", "embedding", minCos = 0.999)
  }

  /** IVF ANN — the inverted-file scale path (no oracle for the same reason
    * as q24: recall < 1 by design on this unclustered corpus;
    * SimilaritySpec asserts recall on clustered data).
    */
  private def q32AnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(
      emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", topK,
      numCentroids = 16, nProbe = 4)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_ann_cosine" -> q23AnnCosine _,
    "q24_ann_lsh" -> q24AnnLsh _,
    "q25_ngram_jaccard" -> q25NgramJaccard _,
    "q26_minhash_lsh" -> q26MinhashLsh _,
    "q27_simhash" -> q27Simhash _,
    "q30_cosine_neardup" -> q30CosineNearDup _,
    "q32_ann_ivf" -> q32AnnIvf _)

  /** Cosine in DuckDB with the same left-to-right double fold Spark's
    * `aggregate` performs — bit-exact agreement verified by the gate.
    */
  private val cosSql =
    "list_sum(list_transform(range(1, len(qv) + 1), k -> qv[k] * cv[k])) / " +
      "(sqrt(list_sum(list_transform(qv, x -> x * x))) * " +
      "sqrt(list_sum(list_transform(cv, x -> x * x))))"

  private val jaccardSql =
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), " +
      "sh AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+2], ' ') " +
      "        for i in range(1, len(t) - 1)]) AS s FROM toks), " +
      "p AS (SELECT a.doc_id AS i, b.doc_id AS j, " +
      "  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / " +
      "  CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard " +
      "  FROM sh a JOIN sh b ON a.doc_id < b.doc_id) " +
      s"SELECT i, j, jaccard FROM p WHERE jaccard >= $minJaccard"

  val oracle: Map[String, String] = Map(
    "q23_ann_cosine" ->
      ("WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v " +
        "           FROM embeddings), " +
        "p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.v AS qv, c.v AS cv " +
        "      FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id <> q.vec_id), " +
        s"r AS (SELECT query_id, neighbor_id, $cosSql AS cos FROM p) " +
        "SELECT query_id, neighbor_id, cos, rank FROM (" +
        "  SELECT query_id, neighbor_id, cos, CAST(ROW_NUMBER() OVER (" +
        "    PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank FROM r) " +
        s"WHERE rank <= $topK"),
    "q25_ngram_jaccard" -> jaccardSql,
    "q26_minhash_lsh" -> jaccardSql,
    "q30_cosine_neardup" ->
      ("WITH u AS (SELECT vec_id, embedding FROM embeddings " +
        "UNION ALL SELECT vec_id + 1000000, " +
        "list_transform(embedding, x -> x * CAST(2 AS FLOAT)) FROM embeddings), " +
        "e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM u), " +
        "p AS (SELECT a.vec_id AS i, b.vec_id AS j, a.v AS qv, b.v AS cv " +
        "      FROM e a JOIN e b ON a.vec_id < b.vec_id), " +
        s"r AS (SELECT i, j, $cosSql AS cos FROM p) " +
        "SELECT i, j, cos FROM r WHERE cos >= 0.999"))
}
