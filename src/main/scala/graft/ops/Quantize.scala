package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization — the index-compression step that
  * makes a 100 TB float corpus ANN-searchable: per-dimension affine codes
  * `c_i = clamp(round((x_i − mn_i) · 255 / (mx_i − mn_i)))` shrink a 64-d
  * float32 vector 4× (and the pair-scoring join's shuffled bytes with it),
  * while integer code dot products preserve neighbor ranking to within
  * quantization error (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search" — the scalar-quantization baseline of §II).
  *
  * Engine-portable by construction (the repo's oracle discipline): the
  * only float arithmetic is the 3-op affine map `(x − mn) · 255 / (mx −
  * mn) + 0.5` evaluated in double with a fixed association — identical
  * IEEE results in any engine — then `floor` (floor is floor everywhere;
  * CAST rounds in DuckDB but truncates in Spark, so never CAST a
  * fraction). Codes are exact small integers, code dot products are exact
  * integer sums (≤ dim · 255² « 2^53), so the quantized top-k is
  * hash-comparable across engines with no tolerance band.
  *
  * Scale shape: the stats pass is one corpus scan aggregated to `dim`
  * rows (map-side partial min/max, a tree-reduce — the collect is dim
  * rows, never data); quantization is a map pass; scoring joins shuffle
  * 1-byte-per-dim codes instead of 4-byte floats.
  */
object Quantize {

  /** Per-dimension (mn, mx) over the corpus, as driver-side arrays
    * (`dim` rows — bounded by the embedding width, not the corpus).
    */
  def dimStats(corpus: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val rows = corpus
      .select(posexplode(col(vecCol)).as(Seq("i", "x")))
      .groupBy("i")
      .agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("i")
      .collect()
    // min/max are exact element selections; read through Number so both
    // array<float> and array<double> corpora work (the sibling vector
    // APIs — RandomProject, CosineSim, DotProduct — accept both element
    // types). float→double widening is exact, so the oracle's
    // CAST(MIN(x) AS DOUBLE) sees identical values either way.
    (rows.map(_.getAs[Number]("mn").doubleValue()).toSeq,
      rows.map(_.getAs[Number]("mx").doubleValue()).toSeq)
  }

  /** The quantized-code column: `array<float>` of integer values 0..255
    * (float-typed so the native codegen'd [[Similarity.dot]] kernel scores
    * code pairs — every value ≤ 255 is exact in float, every pair dot
    * ≤ dim·255² is an exact integer in double).
    *
    * Native `graft_sq8` kernel (r20, guide §4): the stats fold into one
    * plan-constant [[graft.functions.SqRef]] instead of two dim-element
    * literal arrays re-indexed per element by an INTERPRETED `transform`
    * lambda; bit-identical element-for-element (IvfKernelsSpec pins it
    * against [[codesReference]] differentially).
    */
  def codes(vec: Column, mn: Seq[Double], mx: Seq[Double]): Column =
    call_function("graft_sq8", vec, lit(mn.toArray), lit(mx.toArray))

  /** The reference HOF composition [[codes]] replaced (r20) — kept for
    * the differential pin in IvfKernelsSpec only.
    */
  private[graft] def codesReference(vec: Column, mn: Seq[Double],
      mx: Seq[Double]): Column = {
    val mnA = array(mn.map(lit): _*)
    val mxA = array(mx.map(lit): _*)
    transform(vec, (x, i) => {
      val lo = element_at(mnA, i + 1)
      val hi = element_at(mxA, i + 1)
      when(hi > lo,
        greatest(lit(0L), least(lit(255L),
          floor((x.cast("double") - lo) * lit(255.0) / (hi - lo) + lit(0.5)))))
        .otherwise(lit(0L))
        .cast("float")
    })
  }

  /** The quantized inverted file (FAISS's IVF-SQ8 layout): nearest-centroid
    * cell from the RAW vector (assignment quality untouched by
    * quantization), int8 codes in place of the floats, and the code's
    * self-dot (`cn2`) precomputed so query-time L2 needs ONE pair dot.
    * Rows: (idCol, cell, code, cn2) — the 4×-smaller corpus a 100 TB
    * deployment persists partitioned by cell.
    */
  def assignCellsSq8(df: DataFrame, idCol: String, vecCol: String,
      index: Similarity.IvfIndex, mn: Seq[Double], mx: Seq[Double]): DataFrame =
    Similarity.assignCells(df, idCol, vecCol, index)
      .select(col(idCol), col("cell"), codes(col(vecCol), mn, mx).as("code"))
      .withColumn("cn2",
        Similarity.dot(col("code"), col("code")).cast("long"))

  /** IVF search over the quantized inverted file: probe the query's
    * `nProbe` best cells, score candidates by EXACT INTEGER squared-L2 in
    * code space — `qdist = q·q − 2·q·c + c·c`, every term an exact
    * integer ≤ dim·255² so the expansion is error-free and
    * hash-comparable. Output (query_id, neighbor_id, qdist, rank), rank
    * 1..k by ASCENDING distance, ties by neighbor id.
    *
    * An exact duplicate of a query quantizes to identical codes (distance
    * 0, the provable minimum) and assigns to the query's own argmax cell,
    * so planted-copy recall is structurally 1 — the q117 oracle contract.
    */
  def ivfSq8TopK(index: Similarity.IvfIndex, queries: DataFrame,
      assignedSq8: DataFrame, idCol: String, vecCol: String,
      mn: Seq[Double], mx: Seq[Double], k: Int, nProbe: Int = 4): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("qdist").asc, col("neighbor_id").asc)
    sq8Candidates(index, queries, assignedSq8, idCol, vecCol, mn, mx, nProbe)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** [[ivfSq8TopK]] ranked by the EXACT bounded-heap aggregate
    * (`graft_topk_rows`) instead of a window — the billion-query shape:
    * the window formulation sorts every candidate of a query through one
    * task and ships them all into the Exchange, while the aggregation
    * ships a k-entry buffer per query with map-side partials pruning
    * candidates before the shuffle. Row-identical to [[ivfSq8TopK]]
    * (min-k is exact and breaks ties by neighbor id exactly like the
    * window's ORDER BY — q127 is graded against q117's oracle to prove
    * it); requires a GraftExtensions session.
    */
  def ivfSq8TopKAgg(index: Similarity.IvfIndex, queries: DataFrame,
      assignedSq8: DataFrame, idCol: String, vecCol: String,
      mn: Seq[Double], mx: Seq[Double], k: Int, nProbe: Int = 4): DataFrame =
    sq8Candidates(index, queries, assignedSq8, idCol, vecCol, mn, mx, nProbe)
      .groupBy("query_id")
      .agg(call_function("graft_topk_rows",
        col("qdist"), col("neighbor_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        col("col.key").as("qdist"), (col("pos") + 1).cast("int").as("rank"))

  /** Shared candidate generation of the SQ8 probed search:
    * (query_id, neighbor_id, qdist) over the `nProbe` probed cells.
    */
  private def sq8Candidates(index: Similarity.IvfIndex, queries: DataFrame,
      assignedSq8: DataFrame, idCol: String, vecCol: String,
      mn: Seq[Double], mx: Seq[Double], nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= index.numCentroids,
      "1 <= nProbe <= numCentroids")
    val q = queries.select(col(idCol).as("query_id"),
        codes(col(vecCol), mn, mx).as("qc"),
        explode(Similarity.probeCells(col(vecCol), index, nProbe)).as("cell"))
      .withColumn("qn2", Similarity.dot(col("qc"), col("qc")).cast("long"))
    val c = assignedSq8.select(col("cell"), col(idCol).as("neighbor_id"),
      col("code").as("cc"), col("cn2"))
    q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (col("qn2") - lit(2L) * Similarity.dot(col("qc"), col("cc")).cast("long")
          + col("cn2")).as("qdist"))
  }

  /** Quantized-domain exact top-k: every query scored against every corpus
    * row by integer code dot product (the intentional quadratic baseline in
    * the compressed domain — compose with [[Similarity.lshTopK]]-style
    * bucketing for the sub-quadratic path). Output (query_id, neighbor_id,
    * qdot BIGINT, rank), rank 1..k by descending dot, ties by neighbor id.
    */
  def quantizedTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val (mn, mx) = dimStats(corpus, vecCol)
    val q = queries.select(col(idCol).as("query_id"),
      codes(col(vecCol), mn, mx).as("qc"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      codes(col(vecCol), mn, mx).as("cc"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qdot").desc, col("neighbor_id").asc)
    q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.dot(col("qc"), col("cc")).cast("long").as("qdot"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
