package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EmbedProfile

/** Centroid-cohesion outlier semantics: a planted anti-aligned vector is
  * the group's worst member, and results are partitioning-independent
  * (the scaled-integer centroid contract).
  */
class EmbedProfileSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // label 0: vectors near +e1, one planted at -e1; label 1: all near +e2
  private val rows = Seq(
    (1L, 0, Array(1.0f, 0.1f, 0.0f)),
    (2L, 0, Array(0.9f, -0.1f, 0.05f)),
    (3L, 0, Array(1.0f, 0.0f, -0.05f)),
    (4L, 0, Array(-1.0f, 0.02f, 0.0f)), // planted outlier
    (5L, 1, Array(0.0f, 1.0f, 0.1f)),
    (6L, 1, Array(0.1f, 0.9f, 0.0f)),
    (7L, 1, Array(-0.05f, 1.0f, 0.05f))
  ).toDF("vec_id", "label", "embedding")

  test("planted anti-aligned vector ranks worst in its group") {
    val out = EmbedProfile.groupOutliers(rows, "vec_id", "label",
      "embedding", k = 1).collect()
    assert(out.length == 2)
    val worst0 = out.find(_.getInt(1) == 0).get
    assert(worst0.getLong(0) == 4L)
    assert(worst0.getDouble(2) < 0.0) // anti-aligned: negative cosine
    assert(out.find(_.getInt(1) == 1).get.getDouble(2) > 0.8)
  }

  test("a singleton group's member IS its centroid (cosine ~ 1)") {
    val solo = Seq((9L, 7, Array(0.3f, -0.2f, 0.9f))).toDF(
      "vec_id", "label", "embedding")
    val out = EmbedProfile.groupOutliers(solo, "vec_id", "label",
      "embedding", k = 1).collect()
    assert(out.length == 1)
    // sqrt(s)*sqrt(s) re-rounds, so exactly-1.0 is not guaranteed — but
    // the self-cosine must be 1 to the last few ulps
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-12)
  }

  test("outlier ranks are independent of input partitioning") {
    val a = EmbedProfile.groupOutliers(rows, "vec_id", "label",
      "embedding", k = 3).collect().map(_.toSeq).toSet
    val b = EmbedProfile.groupOutliers(rows.repartition(5), "vec_id",
      "label", "embedding", k = 3).collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
