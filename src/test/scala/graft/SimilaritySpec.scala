package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Unit semantics for cosine similarity, brute-force top-k, and the LSH
  * bucketed ANN path (recall asserted on CLUSTERED data — the regime LSH is
  * for; on uniform random vectors no method beats a scan).
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("cosine: orthogonal -> 0, parallel -> 1, antiparallel -> -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 0f), Seq(2f, 0f), 1.0),
      (Seq(1f, 2f), Seq(-1f, -2f), -1.0)
    ).toDF("a", "b", "expect")
    val bad = df.filter(
      abs(Similarity.cosine(col("a"), col("b")) - col("expect")) > 1e-12)
    assert(bad.count() == 0)
  }

  test("native graft_dot is bit-identical to the higher-order fold") {
    val rnd = new Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(
      zip_with(transform(col("a"), x => x.cast("double")),
        transform(col("b"), x => x.cast("double")), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    // strict equality (===), not tolerance: the codegen'd loop must fold in
    // the exact same order and produce the exact same doubles
    val bad = df.filter(!(Similarity.dot(col("a"), col("b")) === hof))
    assert(bad.count() == 0)
  }

  test("graft_dot null semantics: null array, null element, length mismatch") {
    val df = Seq(
      (Some(Seq[Option[Float]](Some(1f), Some(2f))), Some(Seq[Option[Float]](Some(3f), Some(4f))), Some(11.0)),
      (None, Some(Seq[Option[Float]](Some(1f))), None),
      (Some(Seq[Option[Float]](Some(1f), None)), Some(Seq[Option[Float]](Some(1f), Some(1f))), None),
      (Some(Seq[Option[Float]](Some(1f))), Some(Seq[Option[Float]](Some(1f), Some(2f))), None)
    ).toDF("a", "b", "expect")
    val out = df.select(Similarity.dot(col("a"), col("b")).as("d"), col("expect"))
      .collect()
    out.foreach { r =>
      assert(Option(r.get(0)) == Option(r.get(1)), r.toString)
    }
  }

  test("graft_dot is registered for plain SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(2 AS FLOAT), CAST(3 AS FLOAT)))").head().getDouble(0)
    assert(r == 9.0)
  }

  test("bruteForceTopK ranks by descending cosine, k rows per query") {
    val corpus = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0f, 1f)),
      (3L, Seq(-1f, 0f)), (4L, Seq(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(
      corpus.filter(col("vec_id") === 0), corpus, "vec_id", "embedding", 3)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    assert(out.map(_._2).toSeq == Seq(1L, 4L, 2L))
    assert(out.map(_._4).toSeq == Seq(1, 2, 3))
    assert(out(0)._3 > out(1)._3 && out(1)._3 > out(2)._3)
  }

  /** Clustered fixture: 20 well-separated unit-ish centers, 25 points each
    * with small noise — true nearest neighbors share the cluster.
    */
  private def clustered(dim: Int = 32) = {
    val rnd = new Random(7)
    val centers = Seq.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      (c, ci) <- centers.zipWithIndex
      p <- 0 until 25
    } yield ((ci * 25 + p).toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    rows.toDF("vec_id", "embedding")
  }

  test("lshTopK achieves high recall on clustered data") {
    val corpus = clustered()
    val queries = corpus.filter(col("vec_id") % 25 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, corpus, "vec_id", "embedding", 5,
      numPlanes = 8)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("cosineNearDupPairs finds planted near-identical vectors") {
    val rnd = new Random(11)
    val base = Seq.tabulate(50)(i => (i.toLong, Array.fill(16)(rnd.nextGaussian()).map(_.toFloat).toSeq))
    // plant: vec 100 ~ vec 0, vec 101 ~ vec 1 (tiny perturbation)
    val planted = Seq(
      (100L, base(0)._2.map(x => x + 1e-4f)),
      (101L, base(1)._2.map(x => x - 1e-4f)))
    val df = (base ++ planted).toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.999)
      .select("i", "j").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 100L), (1L, 101L)))
  }

  test("ivfTopK achieves high recall on clustered data") {
    val corpus = clustered()
    val queries = corpus.filter(col("vec_id") % 25 === 0).limit(10)
    val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", 5,
      numCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall below 0.9")
  }

  test("kmeans sampled training keeps IVF recall on clustered data") {
    // 500 rows with trainPerCentroid = 2 -> sampleMod = 500/32 = 15: the
    // sampled path (mod > 1) is exercised, and the quantizer must still
    // separate 20 well-spread clusters well enough for nProbe=8 recall
    val corpus = clustered().persist()
    try {
      val cents = Similarity.kmeansCentroids(corpus, "embedding",
        numCentroids = 16, iters = 1, seed = 42L, idCol = "vec_id",
        trainPerCentroid = 2)
      assert(cents.size == 16 && cents.forall(_.size == 32))
      val queries = corpus.filter(col("vec_id") % 25 === 0).limit(10)
      val exact = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val approx = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", 5,
        numCentroids = 16, nProbe = 8, trainPerCentroid = 2)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = (exact & approx).size.toDouble / exact.size
      assert(recall >= 0.9, s"recall $recall below 0.9")
    } finally corpus.unpersist(blocking = false)
  }

  test("ivfTopK is deterministic across invocations") {
    val corpus = clustered()
    val queries = corpus.filter(col("vec_id") < 3)
    def run() = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(run() == run())
  }

  test("lshTopK never returns a neighbor equal to the query") {
    val corpus = clustered()
    val out = Similarity.lshTopK(corpus.limit(5), corpus, "vec_id", "embedding", 3)
    assert(out.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("semanticDedup keeps the lowest id of each planted group, all others") {
    val corpus = clustered()
    // ×2 and ×4 copies of vectors 0..9: groups of three exact parallels
    val copies = corpus.filter(col("vec_id") < 10)
      .select((col("vec_id") + 5000).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
      .union(corpus.filter(col("vec_id") < 10)
        .select((col("vec_id") + 6000).as("vec_id"),
          transform(col("embedding"), x => x * lit(4.0f)).as("embedding")))
    val all = corpus.union(copies)
    val index = Similarity.buildIvfIndex(all, "vec_id", "embedding",
      numCentroids = 8, lloydIters = 1)
    // 0.99999: tight enough that only the exactly-parallel plants qualify
    // (cluster mates sit near 0.9975 — at 0.999 some genuinely cross over,
    // and semanticDedup correctly drops them too)
    val kept = Similarity.semanticDedup(all, "vec_id", "embedding", index,
      minCos = 0.99999)
      .as[Long].collect().toSet
    val base = corpus.select("vec_id").as[Long].collect().toSet
    // every copy dropped (its source has the smaller id), every base kept
    assert(kept == base)
  }

  test("IVF index save/load round-trips and queries identically") {
    // the build-once/query-many lifecycle: a loaded index must reproduce
    // both the centroid table and the query results bit-for-bit
    val corpus = clustered()
    val queries = corpus.filter(col("vec_id") % 25 === 0).limit(10)
    val built = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 16, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.saveIvfIndex(built, spark, s"$dir/index")
    val loaded = Similarity.loadIvfIndex(spark, s"$dir/index")
    assert(loaded.centroids == built.centroids) // exact floats, not approx
    assert(loaded.buildScoreMill == built.buildScoreMill) // drift baseline rides along
    def results(ix: Similarity.IvfIndex) =
      Similarity.ivfTopKWithIndex(ix, queries, corpus, "vec_id", "embedding",
        k = 5, nProbe = 4)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(results(loaded) == results(built))
    // and the one-call form equals build+query with the same parameters
    val oneCall = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding", 5,
      numCentroids = 16, nProbe = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(oneCall == results(built))
  }

  test("incremental IVF add: appended batch searchable at full recall, gate quiet") {
    // the streaming-corpus lifecycle: build + persist the inverted file
    // once, then append an in-distribution batch WITHOUT touching the
    // index or the existing corpus — the planted copies must come back at
    // rank 1 through the assigned-file query path, and the drift gate must
    // not demand a rebuild
    val corpus = clustered()
    val built = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 16, lloydIters = 1)
    assert(built.buildScoreMill.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_inc").toString
    Similarity.saveAssignedCorpus(
      Similarity.assignCells(corpus, "vec_id", "embedding", built), s"$dir/inv")
    // batch: ×2-scaled copies of one vector PER CLUSTER (ids ≡ 0 mod 25)
    // at ids 10000+ — power-of-two scaling is IEEE-exact, so each copy is
    // bit-parallel to its source: same argmax cell, cosine exactly 1 to it
    // (the q32 construction). Spanning every cluster keeps the batch's
    // cluster composition equal to the build sample's, so its mean
    // assignment cosine sits at the baseline.
    val batch = corpus.filter(col("vec_id") % 25 === 0)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val drift = Similarity.appendBatch(built, batch, "vec_id", "embedding",
      s"$dir/inv")
    assert(!drift.needsRebuild,
      s"in-distribution batch tripped the gate: $drift")
    // scale-invariance of the statistic: the ×2 batch scores what its
    // sources score, not double it
    assert(drift.batchScoreMill.exists(_ <= 1000000L))
    val assigned = Similarity.loadAssignedCorpus(spark, s"$dir/inv")
    val queries = corpus.filter(col("vec_id") % 25 === 0)
    val res = Similarity.ivfTopKWithAssigned(built, queries, assigned,
      "vec_id", "embedding", k = 1, nProbe = 1)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(res == (0L until 20L).map(i => (i * 25L, i * 25L + 10000L)).toSet,
      s"planted copies not all at rank 1: $res")
  }

  test("incremental IVF add: out-of-distribution batch trips the rebuild gate") {
    val corpus = clustered()
    val built = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 16, lloydIters = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_drift").toString
    Similarity.saveAssignedCorpus(
      Similarity.assignCells(corpus, "vec_id", "embedding", built), s"$dir/inv")
    // fresh isotropic gaussians share no structure with the 20 training
    // clusters: mean cosine to the nearest centroid collapses (~0.3-0.5
    // in dim 32) vs the tight in-cluster build baseline (~0.99)
    val rnd = new Random(23)
    val alien = Seq.tabulate(100)(i =>
      ((20000 + i).toLong, Array.fill(32)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val drift = Similarity.appendBatch(built, alien, "vec_id", "embedding",
      s"$dir/inv")
    assert(drift.needsRebuild, s"drifted batch passed the gate: $drift")
    assert(drift.batchScoreMill.get < drift.buildScoreMill.get)
    // an EMPTY batch carries no drift evidence: the gate must stay quiet
    // rather than read "no rows" as maximal drift
    val empty = Similarity.driftCheck(built, alien.limit(0), "embedding")
    assert(!empty.needsRebuild && empty.batchScoreMill.isEmpty)
  }
}
