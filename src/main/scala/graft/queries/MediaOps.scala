package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Dedup, Multimodal, Similarity}

/** Driver-visible query for the multimodal operator family: a deterministic
  * synthetic media table (binary payloads + typed metadata, built from the
  * `documents` testdata so every run sees identical bytes), batch feature
  * extraction via `mapPartitions` ([[Multimodal.byteHistogramFeatures]]),
  * and similarity search over the resulting embeddings through the bucketed
  * LSH ANN path.
  *
  * q34 is oracle-checked via a planted construction (the same family as
  * q24/q27/q30/q32): the corpus is extended with five byte-identical copies
  * of every query asset. Identical payload → identical float embedding →
  * the copies tie at the maximum cosine a query can achieve (`cos(q, q)`,
  * whatever double value the shared fold produces) and share the query's
  * exact LSH sign pattern, so recall is structurally 1 and the top-5 is
  * exactly the five smallest-id assets carrying the query's payload — a
  * byte-equality contract DuckDB recomputes WITHOUT reproducing the float
  * histogram arithmetic. The result therefore reports (query_id,
  * neighbor_id, rank) and omits the raw cosine (engine-side float; the
  * per-value feature math is covered by MultimodalSpec). Precondition
  * (verified on this corpus, same class of argument as q24's planted
  * cosine gap): no asset whose payload DIFFERS from a query's has an
  * exactly proportional byte histogram — normalization would make such an
  * embedding bit-equal and tie into the top-5 without being in the
  * oracle's byte-equality set.
  */
object MediaOps {

  /** Synthetic but production-shaped media table: one asset per document,
    * payload = the document's UTF-8 bytes, media type cycling over
    * image/audio/video, plausible dims.
    */
  private[graft] def mediaTable(s: SparkSession, d: String): Dataset[Multimodal.Media] = {
    import s.implicits._
    Tables.documents(s, d).select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("doc_id") % 16 + 4).cast("int").as("width"),
      (col("doc_id") % 8 + 4).cast("int").as("height"),
      lit(16000).as("sample_rate")).as[Multimodal.Media]
  }

  /** Decode → 64-bin byte-histogram embedding per asset → LSH-bucketed
    * cosine top-5 of the first 10 assets against the planted corpus (the
    * base assets plus five byte-identical copies of every query asset at
    * `media_id·10 + 1e6 + m`). See the object Scaladoc for why this makes
    * the approximate pipeline exactly oracle-checkable.
    */
  private def q34MediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = mediaTable(s, d)
    val planted = (1 to 5).foldLeft(base.toDF()) { (acc, m) =>
      acc.union(base.toDF().filter(col("media_id") < 10)
        .withColumn("media_id", col("media_id") * 10 + lit(1000000L + m)))
    }.as[Multimodal.Media]
    val feats = Multimodal.byteHistogramFeatures(planted).toDF()
    Similarity.lshTopK(
      feats.filter(col("media_id") < 10), feats, "media_id", "embedding",
      k = 5, numPlanes = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Video frame sampling through the real multimodal plumbing
    * ([[Multimodal.sampleFrames]]: explode-shaped mapPartitions over binary
    * payloads, every `stride`-th fixed-width frame), reduced to a per-asset
    * frame count. Counts are byte-arithmetic on payload lengths, so a SQL
    * oracle CAN verify this one exactly — the multimodal family's
    * hash-checked entry (features/codec output stays engine-side, q34).
    */
  private def q38FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Multimodal.sampleFrames(mediaTable(s, d), frameBytes = 256, stride = 2)
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"))
  }

  /** Exact asset dedup by payload digest: byte-identical media (planted
    * copies of the first 50 assets) collapse to the smallest-id survivor.
    * The shuffle key is the 32-char md5 of the payload, never the payload
    * itself — binary columns stay in the map stage, which is the entire
    * point of digest-based media dedup at 100 TB.
    */
  private def q64MediaDedup(s: SparkSession, d: String): DataFrame = {
    val base = mediaTable(s, d).toDF()
    val planted = base.union(
      base.filter(col("media_id") < 50)
        .withColumn("media_id", col("media_id") + lit(1000000L)))
    Dedup.keepFirst(
      planted.withColumn("__digest", md5(col("bytes"))),
      Seq("__digest"), Seq(col("media_id").asc))
      .select("media_id", "media_type")
  }

  /** Cross-asset shared-frame detection: sampled frame digests joined
    * across assets — the frame-granular near-dup view (q64 is
    * whole-payload; two videos sharing a scene surface here even when the
    * full payloads differ). Planted byte-identical copies (ids +1e6) make
    * the shared-frame pairs deterministic. The join is BLOCKED on the
    * 32-char frame digest: payload bytes never leave the map stage, and a
    * frame repeated across n assets costs n² pairs only within its own
    * digest group — the same hot-block caveat as every blocked self-join
    * in [[graft.ops.NearDup]].
    */
  private def q98SharedFrames(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = mediaTable(s, d)
    // planted copies stay columnar (q64's withColumn shape) — a typed
    // .map(_.copy(...)) would round-trip every payload through the encoder
    val corpus = base.union(
      base.toDF().filter(col("media_id") < 50)
        .withColumn("media_id", col("media_id") + lit(1000000L))
        .as[Multimodal.Media])
    val dg = Multimodal.sampleFrames(corpus, frameBytes = 256, stride = 2)
      .select(col("media_id"), md5(col("bytes")).as("digest"))
    // probe side digest aliased so the equality compares distinct
    // expression ids — the bare using-column form on two frames descending
    // from one plan logs a trivially-true-condition warning (same shape
    // NearDup aliased away)
    dg.select(col("media_id").as("i"), col("digest"))
      .join(dg.select(col("media_id").as("j"), col("digest").as("digestj")),
        col("digest") === col("digestj"))
      .where(col("i") < col("j"))
      .groupBy("i", "j")
      .agg(countDistinct(col("digest")).as("n_shared"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_media_features" -> q34MediaFeatures _,
    "q38_frame_sample" -> q38FrameSample _,
    "q64_media_dedup" -> q64MediaDedup _,
    "q98_shared_frames" -> q98SharedFrames _)

  /** q38: media payload = UTF-8 text bytes; videos are doc_id % 3 == 2
    * (see [[mediaTable]]); nFrames = octet_length / 256, sampled count =
    * ceil(nFrames / 2); zero-frame assets produce no row (explode of an
    * empty iterator).
    */
  /** q34: top-5 per query = the five smallest-id assets sharing the query's
    * exact payload bytes (see object Scaladoc). Spark breaks the cosine tie
    * by neighbor_id ascending; with every identical-payload candidate tied
    * at the maximum, rank order IS neighbor_id order.
    */
  val oracle: Map[String, String] = Map(
    "q34_media_features" ->
      ("WITH u AS (SELECT doc_id AS media_id, text FROM documents " +
        "UNION ALL SELECT d.doc_id * 10 + 1000000 + g.m, d.text " +
        "FROM documents d, (SELECT unnest(range(1, 6)) AS m) g WHERE d.doc_id < 10), " +
        "q AS (SELECT media_id, text FROM u WHERE media_id < 10), " +
        "p AS (SELECT q.media_id AS query_id, c.media_id AS neighbor_id " +
        "      FROM q JOIN u c ON c.text = q.text AND c.media_id <> q.media_id) " +
        "SELECT query_id, neighbor_id, rank FROM (" +
        "  SELECT query_id, neighbor_id, CAST(ROW_NUMBER() OVER (" +
        "    PARTITION BY query_id ORDER BY neighbor_id) AS INT) AS rank FROM p) " +
        "WHERE rank <= 5"),
    "q38_frame_sample" ->
      ("SELECT doc_id AS media_id, " +
        "CAST((octet_length(CAST(text AS BLOB)) // 256 + 1) // 2 AS BIGINT) AS n_frames " +
        "FROM documents WHERE doc_id % 3 = 2 AND octet_length(CAST(text AS BLOB)) >= 256"),
    // frame slices of the ASCII payload are char slices (verified: no doc
    // has octet_length <> length); sampled indices 0,2,.. < len//256
    "q98_shared_frames" ->
      ("WITH m AS (SELECT doc_id AS media_id, text FROM documents " +
        "  WHERE doc_id % 3 = 2 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents " +
        "  WHERE doc_id < 50 AND doc_id % 3 = 2), " +
        "f AS (SELECT media_id, unnest([md5(substr(text, k*256 + 1, 256)) " +
        "  for k in range(0, length(text) // 256) if k % 2 = 0]) AS digest " +
        "  FROM m), " +
        "p AS (SELECT a.media_id AS i, b.media_id AS j, " +
        "  COUNT(DISTINCT a.digest) AS n_shared " +
        "  FROM f a JOIN f b ON a.digest = b.digest AND a.media_id < b.media_id " +
        "  GROUP BY a.media_id, b.media_id) " +
        "SELECT i, j, n_shared FROM p"),
    // payload = UTF-8 of text, so byte equality == text equality; keep-first
    // = least media_id per payload group
    "q64_media_dedup" ->
      ("WITH u AS (SELECT doc_id AS media_id, text FROM documents " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 50) " +
        "SELECT media_id, ['image','audio','video'][(media_id % 3 + 1)::INT] " +
        "  AS media_type FROM (" +
        "  SELECT media_id, ROW_NUMBER() OVER (PARTITION BY text " +
        "    ORDER BY media_id) AS rn FROM u) WHERE rn = 1"))
}
