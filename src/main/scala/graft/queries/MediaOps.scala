package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Multimodal, Similarity}

/** Driver-visible query for the multimodal operator family: a deterministic
  * synthetic media table (binary payloads + typed metadata, built from the
  * `documents` testdata so every run sees identical bytes), batch feature
  * extraction via `mapPartitions` ([[Multimodal.byteHistogramFeatures]]),
  * and similarity search over the resulting embeddings through the bucketed
  * LSH ANN path.
  *
  * No SQL oracle: the per-partition codec seam (stub decode + float
  * histogram arithmetic) is not reproducible bit-exactly in SQL — the
  * family is value-tested in MultimodalSpec; here the driver records
  * rows+schema. The plan shape is the point: binary payloads stay in
  * map-only stages (decode/feature extraction never shuffles bytes), and
  * only the 64-float embeddings enter the ANN join.
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
    * cosine top-5 of the first 10 assets against the whole corpus.
    */
  private def q34MediaFeatures(s: SparkSession, d: String): DataFrame = {
    val feats = Multimodal.byteHistogramFeatures(mediaTable(s, d)).toDF()
    Similarity.lshTopK(
      feats.filter(col("media_id") < 10), feats, "media_id", "embedding",
      k = 5, numPlanes = 4)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_media_features" -> q34MediaFeatures _,
    "q38_frame_sample" -> q38FrameSample _)

  /** q38: media payload = UTF-8 text bytes; videos are doc_id % 3 == 2
    * (see [[mediaTable]]); nFrames = octet_length / 256, sampled count =
    * ceil(nFrames / 2); zero-frame assets produce no row (explode of an
    * empty iterator).
    */
  val oracle: Map[String, String] = Map(
    "q38_frame_sample" ->
      ("SELECT doc_id AS media_id, " +
        "CAST((octet_length(CAST(text AS BLOB)) // 256 + 1) // 2 AS BIGINT) AS n_frames " +
        "FROM documents WHERE doc_id % 3 = 2 AND octet_length(CAST(text AS BLOB)) >= 256"))
}
