package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, Similarity}
import graft.ops.Multimodal.Media

/** Multimodal plumbing: binary payloads through typed Datasets,
  * partition-wise decode/resize/frame-sample (stub codec, real shapes),
  * features feeding the ANN operators.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def bytes(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed) % 256).toByte)

  private val media = Seq(
    Media(1L, "image", bytes(12, 1), 4, 3, 0),
    Media(2L, "image", bytes(64, 7), 8, 8, 0),
    Media(3L, "video", bytes(40, 3), 4, 2, 0),
    Media(4L, "audio", bytes(100, 9), 0, 0, 16000)
  ).toDS().repartition(3)

  test("decodeAndResize lands fixed-size planes for every asset") {
    val out = Multimodal.decodeAndResize(media, 2, 2).collect()
    assert(out.length == 4)
    assert(out.forall(_.pixels.length == 4))
    assert(out.forall(d => d.width == 2 && d.height == 2))
    assert(out.forall(_.pixels.forall(p => p >= 0f && p <= 1f)))
  }

  test("decode is deterministic across runs and partitionings") {
    val a = Multimodal.decodeAndResize(media, 2, 2).collect().map(d => (d.media_id, d.pixels.toSeq)).toMap
    val b = Multimodal.decodeAndResize(media.repartition(7), 2, 2).collect().map(d => (d.media_id, d.pixels.toSeq)).toMap
    assert(a == b)
  }

  test("sampleFrames slices only video payloads at the stride") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 2).collect()
    // asset 3: 40 bytes / 8 = 5 frames, stride 2 -> indices 0, 2, 4
    assert(frames.map(_.media_id).toSet == Set(3L))
    assert(frames.map(_.frame_idx).sorted.toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.bytes.length == 8))
  }

  test("byteHistogramFeatures are L2-normalized and drive ANN search") {
    val feats = Multimodal.byteHistogramFeatures(media)
    val collected = feats.collect()
    assert(collected.forall(_.embedding.length == 64))
    collected.foreach { f =>
      val norm = math.sqrt(f.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
    // composition with the similarity operators (media_id, embedding)
    val df = feats.toDF("vec_id", "embedding")
    val nn = Similarity.bruteForceTopK(df, df, "vec_id", "embedding", 2)
    assert(nn.groupBy("query_id").count().collect().forall(_.getLong(1) == 2))
  }

  test("metadataOnly projection prunes the binary payload from the scan") {
    val plan = Multimodal.metadataOnly(media.toDF()).queryExecution
      .optimizedPlan.toString()
    assert(!plan.contains("bytes"))
  }
}
