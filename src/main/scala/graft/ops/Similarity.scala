package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector similarity over embedding columns (`array<float>`): exact cosine,
  * brute-force top-k (the correctness baseline), and a random-hyperplane LSH
  * bucketed variant (the scale path).
  *
  * All arithmetic runs in double precision with a deterministic
  * left-to-right fold, so results are reproducible run-to-run and
  * engine-to-engine. The fold itself is the native codegen'd
  * [[graft.functions.DotProduct]] expression — Spark evaluates higher-order
  * `zip_with`/`aggregate` lambdas interpreted, and the dot product sits
  * inside every pair-scoring join in this module (the measured hot path).
  */
object Similarity {

  /** Dot product of two equal-length float/double array columns (double).
    * Same value, bit-for-bit, as the higher-order
    * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _ + _)` fold over
    * double-cast elements — see [[graft.functions.DotProduct]], injected
    * as `graft_dot` by [[graft.functions.GraftExtensions]].
    */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1], composed from [[dot]]/[[l2Norm]].
    * Prefer this form when norms can be precomputed BELOW a candidate
    * join (see [[bruteForceTopK]]); prefer [[cosineSim]] when each pair
    * is scored exactly once.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Fused one-pass cosine ([[graft.functions.CosineSim]], injected as
    * `graft_cosine`): dot product and both norms in a single loop,
    * bit-for-bit equal to [[cosine]] on every defined input (zero-norm
    * vectors yield null instead of an ANSI divide-by-zero error).
    *
    * This is also the DECLARATIVE SIMILARITY-JOIN marker: with
    * `spark.graft.similarityJoin.enabled=true`, an inner join whose
    * condition compares this expression against a literal threshold —
    * `l.join(r, cosineSim($"a", $"b") >= lit(0.999) && ...)` — is planned
    * by [[graft.plans.SimilarityJoinStrategy]] into the sign-bucket LSH
    * physical operator instead of a nested-loop scan.
    */
  def cosineSim(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** [[cosineSim]] with the PER-JOIN approximation opt-in embedded in the
    * plan (`graft_cosine_approx`): a threshold join over this expression
    * is planned into the LSH physical shape with no session conf — the
    * opt-in travels with the query and cannot leak approximation onto any
    * other join in the session. Scalar evaluation is identical to
    * [[cosineSim]].
    */
  def cosineSimApprox(a: Column, b: Column): Column =
    call_function("graft_cosine_approx", a, b)

  /** Sign random projection to `outDim` integer-millionth components
    * ([[graft.functions.RandomProject]], injected as `graft_rproject`):
    * the JL dimensionality-reduction map pass that shrinks every
    * downstream pair-scoring join's bytes before ANN. Exact integer
    * output — reproducible engine-to-engine with no float-sum-order
    * caveat.
    */
  def randomProject(vec: Column, outDim: Int, seed: Int): Column =
    call_function("graft_rproject", vec, lit(outDim), lit(seed))

  /** Brute-force exact cosine top-k: every query row scored against every
    * corpus row (`queries × corpus` — the intentional quadratic baseline),
    * then a per-query window keeps the k best.
    *
    * Scale shape: the crossJoin broadcasts the smaller side when it fits
    * (queries usually do); the window partitions BY QUERY so ranking never
    * globally sorts. Use [[lshTopK]] when the corpus×queries product is too
    * large to scan.
    *
    * Output: (query_id, neighbor_id, cos, rank), rank 1..k by descending
    * cosine, ties broken by neighbor id for determinism.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // Norms are materialized per INPUT row, below the join: higher-order
    // array folds evaluate interpreted, so recomputing l2Norm per candidate
    // pair would triple the pair-scoring cost (dot + two norms). The values
    // are bit-identical either way — same expression, same input.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic random hyperplanes: `numPlanes` unit-free normal vectors
    * of dimension `dim`, fixed seed — the same planes on every run and every
    * executor (they're literals in the plan).
    */
  private[graft] def hyperplanes(dim: Int, numPlanes: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(numPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id of a vector under the given hyperplanes: bit p is
    * 1 iff `v · plane_p > 0`. Vectors at small angles share buckets with high
    * probability (P[bit differs] = angle/π per plane).
    */
  private def bucketId(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(vec, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed approximate cosine top-k — the 100 TB path.
    *
    * Corpus and queries are hashed to `2^numPlanes` sign-buckets; each query
    * is scored ONLY against corpus rows in the same bucket (join on the
    * bucket id — a hash shuffle on an 8-byte key), optionally plus all
    * buckets within Hamming distance 1 (`multiProbe`, raising recall at
    * `numPlanes`× candidate cost). Recall is tunable via `numPlanes`
    * (fewer planes → bigger buckets → higher recall, more compute).
    *
    * Same output contract as [[bruteForceTopK]]; ranks are per-query over
    * the probed candidates only.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numPlanes: Int = 8, seed: Long = 42L,
      multiProbe: Boolean = true): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 62, "1 <= numPlanes <= 62")
    val dim = corpus.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(dim, numPlanes, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"), bucketId(col(vecCol), planes).as("bucket"))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"), bucketId(col(vecCol), planes).as("b0"))
    val probes =
      if (!multiProbe) array(col("b0"))
      else array(col("b0") +: (0 until numPlanes).map(p =>
        col("b0").bitwiseXOR(lit(1L << p))): _*)
    val q = qBase.select(col("query_id"), col("qv"), col("qn"),
      explode(probes).as("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** K-means centroid refinement for the IVF index build: seeded-hash
    * initialization, then `iters` Lloyd iterations — assign every corpus
    * vector to its best cell (map-only, centroids are plan literals), then
    * recompute per-cell elementwise means with ONE aggregation per
    * iteration (posexplode → groupBy(cell, dim) → decimal mean).
    *
    * Means are computed in DECIMAL, not double: decimal sums are exact and
    * therefore independent of aggregation order, so the refined centroids —
    * and everything downstream — are bit-reproducible run-to-run (a double
    * sum would make the index build nondeterministic). Empty cells keep
    * their previous centroid. Each iteration is one job over the TRAINING
    * SAMPLE; the collected state is only `numCentroids × dim` values.
    *
    * Training runs on a deterministic hash-sample of ~`trainPerCentroid ×
    * numCentroids` vectors, not the full corpus — the standard IVF build
    * (quantizer quality saturates at a few hundred points per centroid,
    * while a full-corpus Lloyd pass at 100 TB costs a corpus scan PER
    * ITERATION). The sample is hash-of-id modular, so it is the same set
    * on every run and every retry; when the corpus is at most the target
    * size the modulus is 1 and training sees everything (small-SF behavior
    * is unchanged). Downstream cell ASSIGNMENT always covers the full
    * corpus — sampling affects only where the centroids land.
    */
  /** The deterministic hash-modular training sample shared by the Lloyd
    * refinement and the build-time drift baseline: same set on every run,
    * every retry, and both call sites (the baseline must be measured on
    * exactly the population the centroids were fit to).
    */
  private def trainSample(corpus: DataFrame, idCol: String, seed: Long,
      target: Long): DataFrame = {
    val n = corpus.count() // cheap: corpus is persisted by the caller
    val sampleMod = math.max(1L, n / target)
    if (sampleMod == 1L) corpus
    else corpus.filter(
      pmod(xxhash64(col(idCol), lit(seed + 1)), lit(sampleMod)) === 0)
  }

  private[graft] def kmeansCentroids(corpus: DataFrame, vecCol: String,
      numCentroids: Int, iters: Int, seed: Long, idCol: String,
      trainPerCentroid: Int = 256): Seq[Seq[Float]] = {
    val (train, pinned) = pinIfUnpinned(trainSample(corpus, idCol, seed,
      numCentroids.toLong * trainPerCentroid))
    try kmeansFromTrain(train, vecCol, numCentroids, iters, seed, idCol)
    finally if (pinned) { train.unpersist(blocking = false); () }
  }

  /** See [[graft.core.CacheOnce.pinIfUnpinned]]. */
  private def pinIfUnpinned(df: DataFrame): (DataFrame, Boolean) =
    graft.core.CacheOnce.pinIfUnpinned(df)

  /** Lloyd refinement over an ALREADY-SAMPLED training frame — split out
    * so [[buildIvfIndex]] samples once and feeds both the refinement and
    * the drift baseline (sampling twice costs a redundant count() job).
    */
  private def kmeansFromTrain(train: DataFrame, vecCol: String,
      numCentroids: Int, iters: Int, seed: Long, idCol: String): Seq[Seq[Float]] = {
    var cents: Seq[Seq[Float]] = train
      .select(col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(numCentroids)
      .collect()
      .map(_.getSeq[Float](0).toSeq)
      .toSeq
    for (_ <- 1 to iters) {
      val assigned = train.select(col(vecCol),
        bestCellFor(col(vecCol), cents).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg((sum(col("x").cast(DecimalType(28, 10))) / count(lit(1)))
          .cast("float").as("m"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getFloat(2))
        .toMap
      cents = cents.zipWithIndex.map { case (old, ci) =>
        if (means.contains((ci, 0))) old.indices.map(d => means((ci, d))) else old
      }
    }
    cents
  }

  /** (score, cell) structs for every centroid; array_max/array_sort over
    * these pick cells by score with larger-index tie-break. Score is
    * dot/|centroid| — same ranking as cosine for a fixed input vector, with
    * centroid norms folded to literals.
    *
    * RETAINED AS THE REFERENCE SEMANTICS ONLY (r20): the production paths
    * below use the native [[graft.functions.IvfRef]] kernels
    * (`graft_ivf_cell`/`graft_ivf_probes`/`graft_ivf_score`), which are
    * differentially pinned bit-equal to this composition in
    * IvfKernelsSpec. The struct-literal tree costs ~1k Literal nodes per
    * call site — measured 2-3 s of driver-side planning per ANN query and
    * 2.2 MiB task binaries at sf0.1 (guide §1/§4), which is why it no
    * longer appears in any query plan.
    */
  private[graft] def cellScoresFor(vec: Column, cents: Seq[Seq[Float]]): Column =
    array(cents.zipWithIndex.map { case (cv, ci) =>
      val cvCol = array(cv.map(lit): _*)
      val cn = math.sqrt(cv.map(x => x.toDouble * x).sum)
      struct((dot(vec, cvCol) / lit(cn)).as("score"), lit(ci).as("cell"))
    }: _*)

  /** The flattened centroid-table literal the IVF kernels fold into their
    * plan-constant [[graft.functions.IvfRef]].
    */
  private def centsFlat(cents: Seq[Seq[Float]]): (Column, Int) = {
    val dim = cents.head.length
    require(cents.forall(_.length == dim), "ragged centroid table")
    (lit(cents.flatten.toArray), dim)
  }

  /** Native argmax cell — bit-equal to
    * `array_max(cellScoresFor(vec, cents)).getField("cell")`.
    */
  private[graft] def bestCellFor(vec: Column, cents: Seq[Seq[Float]]): Column = {
    val (flat, dim) = centsFlat(cents)
    call_function("graft_ivf_cell", vec, flat, lit(dim))
  }

  /** Native best score — bit-equal to
    * `array_max(cellScoresFor(vec, cents)).getField("score")`.
    */
  private[graft] def bestScoreFor(vec: Column, cents: Seq[Seq[Float]]): Column = {
    val (flat, dim) = centsFlat(cents)
    call_function("graft_ivf_score", vec, flat, lit(dim))
  }

  /** A trained IVF quantizer: the centroid table, plus the build-time
    * assignment-quality statistic the incremental-add drift gate compares
    * against. Small by construction (numCentroids × dim floats) — it
    * travels as plan literals, never as data.
    *
    * `buildScoreMill` is the mean best-cell assignment score of the
    * training sample in integer MILLIONTHS (decimal-summed, so the value
    * is deterministic and engine-portable). `None` on indexes saved before
    * the statistic existed — drift gating then reports `needsRebuild =
    * false` with no baseline rather than inventing one.
    */
  final case class IvfIndex(centroids: Seq[Seq[Float]],
      buildScoreMill: Option[Long] = None) {
    require(centroids.nonEmpty, "empty centroid table")
    def numCentroids: Int = centroids.size
  }

  /** Train an IVF index: `numCentroids` seeded-hash-initialized centroids
    * refined with [[kmeansCentroids]] Lloyd iterations over a bounded
    * deterministic training sample. Eager (one count + init job, one
    * assignment-aggregation job per iteration); per-iteration driver state
    * is numCentroids × dim values. The corpus is persisted for the build's
    * duration so the iterations read cached blocks, and released after.
    */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 16, seed: Long = 42L, lloydIters: Int = 1,
      trainPerCentroid: Int = 256): IvfIndex = {
    // pinIfUnpinned, not persist(): a caller that pinned the corpus for
    // its own downstream stages (q117 shares it with the quantization
    // passes) must not have its cache dropped by the build's cleanup
    val (mat, pinnedCorpus) = pinIfUnpinned(corpus)
    try {
      // the train sample is PINNED too: it is centroid-bounded (~4k rows),
      // and init, every Lloyd assignment agg, and the drift baseline each
      // re-execute it — cached, those are scans of a few thousand rows
      // instead of repeated filter passes over the whole corpus cache
      val (train, pinned) = pinIfUnpinned(trainSample(mat, idCol, seed,
        numCentroids.toLong * trainPerCentroid))
      try {
        val cents = kmeansFromTrain(train, vecCol, numCentroids, lloydIters,
          seed, idCol)
        // drift baseline on the SAME sample the centroids were fit to —
        // one agg over the CACHED sample at build time buys every future
        // appendBatch its rebuild gate. Deliberately NOT folded into the
        // final Lloyd aggregation: that agg scores the PREVIOUS iterate's
        // centroids (its output IS the final set), so folding would
        // baseline the wrong quantizer (see q32's cost note)
        IvfIndex(cents, meanAssignScoreMill(train, vecCol, cents))
      } finally if (pinned) { train.unpersist(blocking = false); () }
    } finally if (pinnedCorpus) { mat.unpersist(blocking = false); () }
  }

  /** Mean COSINE to the nearest centroid over `df`, in integer millionths:
    * floor(1e6 · Σ bestCos / n) with a DECIMAL sum, so the statistic is
    * exact, aggregation-order-independent, and comparable across sessions.
    * Cosine — not the raw dot/|centroid| cell-ranking score — because the
    * drift gate must be scale-invariant: a batch of larger-magnitude
    * vectors is not "closer" to the quantizer. Zero-norm vectors (cosine
    * undefined) are excluded. `None` when no row survives (empty batch /
    * all zero-norm) — "no data" must stay distinguishable from "mean
    * score 0", or the drift gate would read an empty batch as maximal
    * drift. One map + one grand agg; driver state is one row.
    */
  private def meanAssignScoreMill(df: DataFrame, vecCol: String,
      cents: Seq[Seq[Float]]): Option[Long] = {
    val r = df
      .select((bestScoreFor(col(vecCol), cents)
        / l2Norm(col(vecCol))).cast(DecimalType(28, 10)).as("s"))
      .where(col("s").isNotNull)
      .agg((sum(col("s")) * lit(1000000L) / count(lit(1)))
        .cast("long").as("m"))
      .first()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** Persist a trained index as parquet rows (cell, dim, value) — build
    * ONCE per corpus version, then every query session [[loadIvfIndex]]s
    * in O(index size) instead of re-running Lloyd over the corpus. Plain
    * rows, not a serialized blob: any engine (or the DuckDB oracle) can
    * inspect the centroids.
    */
  def saveIvfIndex(index: IvfIndex, spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    import spark.implicits._
    index.centroids.zipWithIndex
      .flatMap { case (cv, ci) => cv.zipWithIndex.map { case (v, d) => (ci, d, v) } }
      .toDF("cell", "dim", "value")
      .repartition(1) // the table is numCentroids × dim rows — one file
      .write.mode("overwrite").parquet(path)
    // drift baseline rides in an underscore-prefixed child dir: parquet
    // readers treat _-names as hidden, so `read.parquet(path)` (and the
    // DuckDB oracle) still see exactly the (cell, dim, value) table
    index.buildScoreMill.foreach { s =>
      Seq(s).toDF("build_score_mill").repartition(1)
        .write.mode("overwrite").parquet(s"$path/_drift")
    }
  }

  def loadIvfIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): IvfIndex = {
    // the centroid table and the drift baseline are independent reads of
    // sibling artifacts — run them concurrently (guide §2.6; the
    // lifecycle queries' cost is sequential small-job latency)
    val (rows, score) = graft.core.Par.par2(
      spark.read.parquet(path)
        .select("cell", "dim", "value")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getFloat(2))),
      // the baseline is OPTIONAL: a missing, empty, or partially-written
      // `_drift` dir (e.g. save interrupted between the two writes) must
      // degrade to None, never fail the index load. Its PART FILES are
      // read by explicit visible path — an underscore-prefixed ROOT
      // makes DataSource log `WARN All paths were ignored` on stderr
      // (sbt renders it `[error]`) even though the read succeeds
      try {
        val dp = new org.apache.hadoop.fs.Path(s"$path/_drift")
        val fs = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(dp)) None
        else {
          val parts = fs.listStatus(dp).collect {
            case st if st.isFile && st.getPath.getName.endsWith(".parquet") =>
              st.getPath.toString
          }
          if (parts.isEmpty) None
          else spark.read.parquet(parts.toIndexedSeq: _*)
            .select("build_score_mill").collect().headOption.map(_.getLong(0))
        }
      } catch { case scala.util.control.NonFatal(_) => None })
    val cents = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cvs) =>
      cvs.sortBy(_._2).map(_._3).toSeq
    }
    IvfIndex(cents, score)
  }

  /** Query-time IVF search with a pre-trained index: each corpus vector
    * belongs to its nearest centroid's cell; each query probes its
    * `nProbe` nearest cells. Candidates come from a hash join on the
    * 4-byte cell id — shuffle volume is (cell, id, vec),
    * `nProbe/numCentroids` of the corpus per query on average. Recall
    * rises with `nProbe` at proportional candidate cost
    * (`nProbe = numCentroids` degenerates to exact brute force).
    *
    * Same output contract as [[bruteForceTopK]].
    */
  def ivfTopKWithIndex(index: IvfIndex, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4): DataFrame =
    ivfTopKWithAssigned(index, queries,
      assignCells(corpus, idCol, vecCol, index), idCol, vecCol, k, nProbe)

  /** Map-only nearest-centroid assignment: (idCol, vecCol, nrm, cell) —
    * the inverted-file row format every IVF consumer shares. Centroids are
    * plan literals, so this is a pure parallel scan: the shape that lets a
    * 100 TB corpus be assigned once, persisted partitioned by cell, and
    * appended to batch-by-batch instead of re-assigned per session.
    */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
      index: IvfIndex): DataFrame =
    df.select(col(idCol), col(vecCol), l2Norm(col(vecCol)).as("nrm"),
      bestCellFor(col(vecCol), index.centroids).as("cell"))

  /** The query-side probe list: the `nProbe` best cells for a vector, best
    * first — shared by the float inverted file ([[ivfTopKWithAssigned]])
    * and the quantized one ([[Quantize.ivfSq8TopK]]).
    */
  private[graft] def probeCells(vec: Column, index: IvfIndex,
      nProbe: Int): Column = {
    val (flat, dim) = centsFlat(index.centroids)
    call_function("graft_ivf_probes", vec, flat, lit(dim), lit(nProbe))
  }

  /** The reference composition [[probeCells]] replaced (r20) — kept for
    * the differential pin in IvfKernelsSpec only.
    */
  private[graft] def probeCellsReference(vec: Column, cents: Seq[Seq[Float]],
      nProbe: Int): Column =
    transform(
      slice(reverse(array_sort(cellScoresFor(vec, cents))), 1, nProbe),
      s => s.getField("cell"))

  /** Query-time IVF search over a PRE-ASSIGNED inverted file
    * ([[assignCells]] rows — e.g. [[loadAssignedCorpus]]): only the query
    * side computes cell scores; the corpus side is read as-is, which is
    * the point of persisting the assignment. Same output contract as
    * [[bruteForceTopK]].
    */
  def ivfTopKWithAssigned(index: IvfIndex, queries: DataFrame,
      assigned: DataFrame, idCol: String, vecCol: String, k: Int,
      nProbe: Int = 4): DataFrame = {
    require(nProbe >= 1 && nProbe <= index.numCentroids,
      "1 <= nProbe <= numCentroids")
    val c = assigned.select(col("cell"), col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"), col("nrm").as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"),
      explode(probeCells(col(vecCol), index, nProbe)).as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Materialize an assigned corpus as the on-disk inverted file:
    * parquet partitioned BY CELL, so a query session (or compaction) that
    * touches `nProbe` cells reads `nProbe` directories, not the corpus.
    */
  def saveAssignedCorpus(assigned: DataFrame, path: String): Unit =
    // size-gated cell clustering before the partitioned write (r20,
    // guide §6 small files — the [[ProductQuantize.saveEncoded]]
    // rationale and gate, see [[graft.core.Layout.clusterIfLarge]])
    graft.core.Layout.clusterIfLarge(assigned, col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  def loadAssignedCorpus(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(path)

  /** Outcome of an incremental add: the batch's mean assignment score vs
    * the index's build-time baseline. `needsRebuild` fires when the batch
    * scores below `(1 - relTolerance) ×` baseline — the new data sits
    * materially farther from every centroid than the training data did,
    * i.e. the corpus distribution has drifted out from under the
    * quantizer and recall is degrading. Absent a baseline (legacy index)
    * OR a batch score (empty / all-zero-norm batch carries no drift
    * evidence), the gate reports false rather than guessing.
    */
  final case class IvfDrift(buildScoreMill: Option[Long],
      batchScoreMill: Option[Long], needsRebuild: Boolean)

  /** Incremental IVF add — the streaming-corpus path that pairs with
    * [[graft.ops.Dedup.incrementalByFingerprint]]: assign ONLY the new
    * batch to the nearest existing centroids (map-only over the batch),
    * append the rows to the persisted inverted file at `path`, and return
    * the drift gate. The index itself is untouched — centroids stay valid
    * until the gate says otherwise, at which point the caller re-runs
    * [[buildIvfIndex]] + [[saveAssignedCorpus]] over the full corpus.
    *
    * Scale shape: cost is one scan of the BATCH (scored twice: the drift
    * agg and the write — persisted in between), zero scans of the
    * existing corpus, zero shuffles (partitioned append is map-side).
    */
  def appendBatch(index: IvfIndex, batch: DataFrame, idCol: String,
      vecCol: String, path: String, relTolerance: Double = 0.05): IvfDrift = {
    val assigned = assignCells(batch, idCol, vecCol, index).persist()
    try {
      val drift = driftCheck(index, assigned, vecCol, relTolerance)
      assigned.write.mode("append").partitionBy("cell").parquet(path)
      drift
    } finally assigned.unpersist(blocking = false)
  }

  /** The drift gate alone: the batch's mean assignment cosine vs the
    * index's build baseline (see [[IvfDrift]]). Public so callers that
    * own their write path — e.g. [[graft.pipelines.StreamingIvfIngest]],
    * whose per-batch overwrite is replay-idempotent where a bare append
    * is not — can still gate on the same statistic.
    */
  def driftCheck(index: IvfIndex, batch: DataFrame, vecCol: String,
      relTolerance: Double = 0.05): IvfDrift = {
    require(relTolerance >= 0 && relTolerance < 1, "0 <= relTolerance < 1")
    val batchScore = meanAssignScoreMill(
      batch.select(col(vecCol)), vecCol, index.centroids)
    val rebuild = (for (b <- index.buildScoreMill; s <- batchScore)
      yield s.toDouble < (1.0 - relTolerance) * b.toDouble).getOrElse(false)
    IvfDrift(index.buildScoreMill, batchScore, rebuild)
  }

  /** IVF (inverted-file) approximate cosine top-k — the other canonical ANN
    * scale path next to [[lshTopK]]: [[buildIvfIndex]] + [[ivfTopKWithIndex]]
    * in one call. Long-lived deployments build/save the index once and run
    * the query side alone.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int = 16, nProbe: Int = 4,
      seed: Long = 42L, lloydIters: Int = 1,
      trainPerCentroid: Int = 256): DataFrame = {
    require(nProbe >= 1 && nProbe <= numCentroids, "1 <= nProbe <= numCentroids")
    val index = buildIvfIndex(corpus, idCol, vecCol, numCentroids, seed,
      lloydIters, trainPerCentroid)
    ivfTopKWithIndex(index, queries, corpus, idCol, vecCol, k, nProbe)
  }

  /** SemDeDup-style semantic deduplication: assign every vector to its
    * nearest-centroid cell (map-only — the [[IvfIndex]] centroids are plan
    * literals), exact-verify cosine within each cell, and drop every vector
    * that has an in-cell neighbor with cosine >= `minCos` and a SMALLER id
    * (deterministic survivor = the lowest id of any near-dup group).
    * Returns the surviving ids.
    *
    * The cluster scoping is the paper's scale lever: candidate pairs are
    * quadratic only within a cell (~n/numCentroids rows), never across the
    * corpus, and the join key is the 4-byte cell id. The trained index
    * comes from [[buildIvfIndex]]/[[loadIvfIndex]], so long-lived corpora
    * pay Lloyd once. Naming precondition: `idCol`/`vecCol` must not be
    * named `nrm`, `cell`, `i`, or `j` (internal working columns).
    * Semantics caveat shared with every clustered dedup:
    * a near-dup pair that straddles a cell boundary is not examined —
    * raise numCentroids' training quality or lower minCos conservatively
    * when that matters; exactly-parallel duplicates always share a cell.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      index: IvfIndex, minCos: Double): DataFrame = {
    // persisted: the self-join's two branches would otherwise both
    // re-evaluate the numCentroids-dot cell assignment per row
    val assigned = assignCells(df, idCol, vecCol, index).persist()
    val lhs = assigned.select(col("cell"), col(idCol).as("i"),
      col(vecCol).as("vi"), col("nrm").as("ni"))
    val rhs = assigned.select(col("cell").as("__cell_r"), col(idCol).as("j"),
      col(vecCol).as("vj"), col("nrm").as("nj"))
    // reserved name: a caller whose idCol is literally "j" must not hit an
    // ambiguous-reference error in the anti-join below
    val dropped = lhs
      .join(rhs, col("cell") === col("__cell_r") && col("i") < col("j"))
      .filter(dot(col("vi"), col("vj")) / (col("ni") * col("nj")) >= minCos)
      .select(col("j").as("__dropped_id")).distinct()
    assigned.join(dropped, col(idCol) === col("__dropped_id"), "left_anti")
      .select(col(idCol))
  }

  /** An [[IvfIndex]] whose centroids are DESIGNATED corpus vectors (the
    * rows with the given ids, in ascending id order → cell 0..n-1) rather
    * than Lloyd-trained means. Two uses: a zero-training-cost coarse
    * quantizer for quick profiling, and — because the centroid table is
    * then a pure function of named corpus rows — an index an EXTERNAL
    * engine can reproduce exactly (the recall-profile oracle re-derives
    * the same cells in SQL; a Lloyd-trained table is not portable).
    */
  def indexFromVectors(corpus: DataFrame, idCol: String, vecCol: String,
      ids: Seq[Long]): IvfIndex = {
    require(ids.nonEmpty, "indexFromVectors needs at least one id")
    val rows = corpus
      .filter(col(idCol).isin(ids: _*))
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .collect()
    require(rows.length == ids.distinct.length,
      s"centroid ids resolved ${rows.length} of ${ids.distinct.length} rows")
    IvfIndex(rows.map(_.getSeq[Float](1).toSeq).toSeq)
  }

  /** The recall@k operating curve of the float IVF search against the
    * exact answer on the SAME (non-planted) corpus — the tuning table a
    * deployment reads before committing an index config: one row per
    * probed-cell count, `total_hits` = Σ over queries of
    * |IVF top-k ∩ exact top-k|, `recall_millionths` the floor-divided
    * integer recall. Per-query hit counts are provably monotone
    * nondecreasing in nProbe (probing more cells grows the candidate
    * SUPERSET, and only true-top-k members can outrank a true-top-k
    * member under the shared (cos desc, id asc) order), so the curve
    * rises to exactly 1.0 at nProbe = numCentroids.
    *
    * Scale shape: the corpus is assigned ONCE (cached inverted file — at
    * deployment scale the [[saveAssignedCorpus]] artifact) and each probe
    * level reuses it; the exact side is one bounded
    * queries×corpus scoring pass shared by every level. Everything after
    * is integer counting.
    */
  def recallProfile(index: IvfIndex, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nProbes: Seq[Int]): DataFrame = {
    require(nProbes.nonEmpty && nProbes.forall(np =>
      np >= 1 && np <= index.numCentroids), "1 <= nProbe <= numCentroids")
    val spark = corpus.sparkSession
    import spark.implicits._
    // both frames feed every probe level: pin them (ContextCleaner-owned)
    val q = graft.core.CacheOnce.persistOnce(queries)
    val assigned = graft.core.CacheOnce.persistOnce(
      assignCells(corpus, idCol, vecCol, index))
    val exact = graft.core.CacheOnce.persistOnce(
      bruteForceTopK(q, corpus, idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id")))
    val nq = q.select(col(idCol)).distinct().count()
    // fail fast instead of a silent divide-by-zero NULL recall downstream
    // (an empty queries frame is a misconfigured filter, not a profile)
    require(nq > 0, "recallProfile needs at least one query row")
    val ann = nProbes.map(np =>
      ivfTopKWithAssigned(index, q, assigned, idCol, vecCol, k, np)
        .select(lit(np).as("n_probe"), col("query_id"), col("neighbor_id")))
      .reduce(_ union _)
    val hits = ann.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("n_probe"))
      .agg(count(lit(1)).as("__hits"))
    // a probe level with ZERO hits must still report its row
    nProbes.toDF("n_probe")
      .join(hits, Seq("n_probe"), "left")
      .select(col("n_probe"), lit(nq.toInt).as("n_queries"),
        lit(k).as("k"),
        coalesce(col("__hits"), lit(0L)).as("total_hits"))
      .withColumn("recall_millionths",
        expr(s"total_hits * 1000000 div ${k.toLong * nq}"))
  }

  /** Embedding near-dup pairs: all (i < j) with cosine >= `minCos`, via the
    * same sign-bucket blocking (near-identical vectors agree on every sign
    * bit with probability ≈ 1 - numPlanes·angle/π). Exact-verified, so no
    * false positives; recall governed by `numPlanes`/`multiProbe` as in
    * [[lshTopK]].
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double, numPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = df.select(size(col(vecCol))).first().getInt(0)
    val planes = hyperplanes(dim, numPlanes, seed)
    val hashed = df.select(col(idCol), col(vecCol),
      l2Norm(col(vecCol)).as("nrm"), bucketId(col(vecCol), planes).as("b0"))
    // probe own bucket + Hamming-1 neighbors on one side only (covers all
    // pairs differing in <= 1 sign bit exactly once after the i<j filter)
    val left = hashed.select(col(idCol).as("i"), col(vecCol).as("vi"),
      col("nrm").as("ni"),
      explode(array(col("b0") +: (0 until numPlanes).map(p =>
        col("b0").bitwiseXOR(lit(1L << p))): _*)).as("bucket"))
    val right = hashed.select(col(idCol).as("j"), col(vecCol).as("vj"),
      col("nrm").as("nj"), col("b0").as("bucket"))
    left.join(right, Seq("bucket"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        (dot(col("vi"), col("vj")) / (col("ni") * col("nj"))).as("cos"))
      .distinct()
      .filter(col("cos") >= minCos)
  }
}
