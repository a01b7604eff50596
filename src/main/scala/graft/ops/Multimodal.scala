package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: media as opaque
  * `binary` columns with typed metadata, processed partition-at-a-time.
  *
  * The DECODERS here are deliberate deterministic stubs (this container has
  * no image/audio codecs); everything around them is the real production
  * shape: explicit schema, `binary` payloads flowing through Tungsten rows,
  * `mapPartitions` batch iteration (the JVM analogue of `mapInPandas` —
  * one initialization per partition, then per-record streaming, no
  * per-row UDF dispatch), and embeddings that feed straight into
  * [[Similarity]] ANN. Swapping `StubCodec` for a real JNI/Java codec
  * changes no plan shape.
  */
object Multimodal {

  /** One media asset: payload + typed metadata (media_type ∈ image/audio/
    * video; dims for images/video, sample rate for audio).
    */
  final case class Media(media_id: Long, media_type: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("bytes", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType)))

  /** Decoded frame/clip: per-asset feature payload. */
  final case class Decoded(media_id: Long, media_type: String,
      width: Int, height: Int, pixels: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, bytes: Array[Byte])

  final case class MediaFeature(media_id: Long, embedding: Array[Float])

  /** The codec seam. Stub semantics: "pixels" are the byte values scaled to
    * [0,1] — deterministic, shape-preserving, and cheap; a real deployment
    * implements these three calls over libjpeg/ffmpeg and nothing else
    * changes.
    */
  private[ops] object StubCodec {
    def decode(bytes: Array[Byte]): Array[Float] =
      bytes.map(b => (b & 0xff) / 255.0f)

    /** Nearest-neighbor "resize" of a w×h pixel plane to w2×h2. */
    def resize(pixels: Array[Float], w: Int, h: Int, w2: Int, h2: Int): Array[Float] = {
      val out = new Array[Float](w2 * h2)
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) {
          val sx = math.min(w - 1, x * w / w2)
          val sy = math.min(h - 1, y * h / h2)
          out(y * w2 + x) = pixels(math.min(pixels.length - 1, sy * w + sx))
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** Decode + resize every image/video asset to a fixed `targetW×targetH`
    * plane. Partition-parallel, no shuffle: each task decodes its split's
    * assets in a streaming loop.
    */
  def decodeAndResize(media: Dataset[Media], targetW: Int, targetH: Int): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (real codecs allocate contexts once)
      it.map { m =>
        val px = StubCodec.decode(m.bytes)
        val w = math.max(1, m.width)
        val h = math.max(1, m.height)
        Decoded(m.media_id, m.media_type, targetW, targetH,
          StubCodec.resize(px, w, h, targetW, targetH))
      }
    }
  }

  /** Sample every `stride`-th fixed-size frame out of video payloads —
    * explode-shaped (one asset → many frames) but still map-only.
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(col("media_type") === "video").flatMap { m =>
      val nFrames = m.bytes.length / frameBytes
      (0 until nFrames by stride).iterator.map { i =>
        Frame(m.media_id, i, m.bytes.slice(i * frameBytes, (i + 1) * frameBytes))
      }
    }
  }

  /** Fixed-width feature embedding per asset: a 64-bin byte histogram,
    * L2-normalized — a real (if crude) content feature, deterministic, and
    * directly consumable by [[Similarity.bruteForceTopK]]/[[Similarity.lshTopK]]
    * for cross-modal dedup/search.
    */
  def byteHistogramFeatures(media: Dataset[Media], bins: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val hist = new Array[Float](bins)
        var i = 0
        while (i < m.bytes.length) {
          hist(((m.bytes(i) & 0xff) * bins) / 256) += 1f
          i += 1
        }
        var norm = 0.0
        var j = 0
        while (j < bins) { norm += hist(j) * hist(j); j += 1 }
        val n = math.sqrt(norm).toFloat
        if (n > 0) { j = 0; while (j < bins) { hist(j) /= n; j += 1 } }
        MediaFeature(m.media_id, hist)
      }
    }
  }

  /** Media-table scan shape check: binary payloads must stay out of any
    * shuffle that doesn't need them — project metadata before wide ops.
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select("media_id", "media_type", "width", "height", "sample_rate")
}
