package graft.plans

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, Predicate, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{ArrayType, FloatType}

import graft.ops.Similarity

/** Physical similarity join: inner join on `cosine(leftVec, rightVec) >= t`
  * (or `> t` when `strict`), executed as the sign-bucket LSH shape instead
  * of the nested-loop scan Spark would otherwise plan for a non-equi
  * condition — the whole-operator rung of the extension ladder
  * (expression → optimizer rule → typed aggregate → DSv2 source → planner
  * strategy), planned by [[SimilarityJoinStrategy]].
  *
  * Shape (the same blocking as
  * [[graft.ops.Similarity.cosineNearDupPairs]], proven by the shared
  * oracle): every row hashes to a `numPlanes`-bit sign bucket under the
  * deterministic hyperplanes; the LEFT side additionally probes all
  * Hamming-1 buckets. A candidate pair lands in EXACTLY one shared bucket
  * when its sign patterns differ in ≤ 1 bit (own bucket if 0 bits, the
  * single flipped probe if 1), and in none otherwise — so no distinct
  * pass is needed, and the output is duplicate-free by construction.
  * Survivors are exact-verified with the fused one-pass cosine
  * (bit-identical to [[graft.functions.CosineSim]]), then filtered by the
  * `residual` non-similarity conjuncts of the original join condition.
  *
  * Scale shape: one hash shuffle per side on an 8-byte bucket key — the
  * left pays a ×(numPlanes+1) row multiplier for its probes, the exact
  * cost [[graft.ops.Similarity.cosineNearDupPairs]] pays in its explode.
  * Candidate scoring is quadratic only WITHIN a bucket; `numPlanes` is
  * the lever (more planes → smaller buckets → less compute, lower recall
  * for pairs below exact duplication). Both bucket groups are
  * materialized in memory per key (cogroup), so extremely skewed buckets
  * bound memory by the bucket, not the partition — size `numPlanes` so
  * 2^numPlanes ≫ the duplicate-cluster count.
  *
  * SEMANTICS CONTRACT: this is an APPROXIMATE join — recall < 1 for
  * qualifying pairs whose sign patterns differ in ≥ 2 bits (near-dup
  * thresholds like 0.999 make that probability negligible; moderate
  * thresholds do not). That is why the strategy only fires behind an
  * explicit conf — see [[SimilarityJoinStrategy]].
  */
case class CosineJoinExec(
    leftVec: Expression,
    rightVec: Expression,
    threshold: Double,
    strict: Boolean,
    residual: Option[Expression],
    numPlanes: Int,
    seed: Long,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(numPlanes >= 1 && numPlanes <= 62, "1 <= numPlanes <= 62")

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "candidatePairs" -> SQLMetrics.createMetric(sparkContext, "candidate pairs scored"))

  override def simpleStringWithNodeId(): String =
    s"CosineJoin(cos ${if (strict) ">" else ">="} $threshold, planes=$numPlanes)"

  /** Evaluate a bound vector expression to a dense double array, or null if
    * the value, any element, is null (a null can never satisfy the
    * comparison, so such rows are dropped before the shuffle).
    */
  private def extract(bound: Expression, fromFloat: Boolean, row: InternalRow): Array[Double] = {
    val v = bound.eval(row)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Double](n)
    var k = 0
    while (k < n) {
      if (arr.isNullAt(k)) return null
      out(k) = if (fromFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
      k += 1
    }
    out
  }

  /** Sign-bit bucket under the shared deterministic hyperplanes — the same
    * fold, comparison, and bit layout as `Similarity.bucketId`'s column
    * form (bit p set iff `v · plane_p > 0`, strict).
    */
  private def bucketOf(vec: Array[Double], planes: Array[Array[Double]]): Long = {
    var b = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var s = 0.0
      var k = 0
      while (k < vec.length) {
        s += vec(k) * pl(k)
        k += 1
      }
      if (s > 0) b |= 1L << p
      p += 1
    }
    b
  }

  /** Hyperplanes are a pure function of (dim, numPlanes, seed), so each
    * task derives them from the first vector it sees instead of the driver
    * running a dim-probe job at planning time; a cached copy is reused
    * while the dimension stays constant (the only defined case — a
    * cross-dimension pair has null cosine and can never join).
    */
  private def keyed(child: SparkPlan, vecExpr: Expression, probe: Boolean): RDD[(Long, UnsafeRow)] = {
    val out = child.output
    val fromFloat = vecExpr.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val np = numPlanes
    val sd = seed
    child.execute().mapPartitions({ iter =>
      val bound = BindReferences.bindReference(vecExpr, out)
      val toUnsafe = UnsafeProjection.create(out, out)
      var planes: Array[Array[Double]] = null
      iter.flatMap { row =>
        val vec = extract(bound, fromFloat, row)
        if (vec == null) Iterator.empty
        else {
          if (planes == null || planes(0).length != vec.length)
            planes = Similarity.hyperplanes(vec.length, np, sd).toArray
          val b0 = bucketOf(vec, planes)
          val copy = (row match {
            case u: UnsafeRow => u
            case other => toUnsafe(other)
          }).copy()
          if (!probe) Iterator.single((b0, copy))
          else Iterator.single((b0, copy)) ++
            (0 until np).iterator.map(p => (b0 ^ (1L << p), copy))
        }
      }
    }, preservesPartitioning = false)
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val lFloat = leftVec.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rFloat = rightVec.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val lVecExpr = leftVec
    val rVecExpr = rightVec
    val t = threshold
    val strictCmp = strict
    val residualCond = residual
    val outputRows = longMetric("numOutputRows")
    val candidates = longMetric("candidatePairs")
    val part = new HashPartitioner(conf.numShufflePartitions)

    keyed(left, leftVec, probe = true)
      .cogroup(keyed(right, rightVec, probe = false), part)
      .mapPartitionsWithIndex { (index, iter) =>
        val lBound = BindReferences.bindReference(lVecExpr, leftOut)
        val rBound = BindReferences.bindReference(rVecExpr, rightOut)
        val joined = new JoinedRow
        val outProj = UnsafeProjection.create(allOut, allOut)
        val resPred = residualCond.map { c =>
          val p = Predicate.create(c, allOut)
          p.initialize(index)
          p
        }
        iter.flatMap { case (_, (ls, rs)) =>
          if (ls.isEmpty || rs.isEmpty) Iterator.empty
          else {
            // The smaller right group is staged with its vectors and
            // sqrt-norms decoded once; each left row then decodes once and
            // pays one dot per candidate — the amortization the
            // precomputed-norm DataFrame form gets from its projections.
            val rRows = rs.toArray
            val rVecs = rRows.map(extract(rBound, rFloat, _))
            val rNorms = rVecs.map { v =>
              if (v == null) 0.0
              else {
                var nb = 0.0
                var k = 0
                while (k < v.length) { nb += v(k) * v(k); k += 1 }
                math.sqrt(nb)
              }
            }
            ls.iterator.flatMap { lrow =>
              val lv = extract(lBound, lFloat, lrow)
              if (lv == null) Iterator.empty
              else {
                var na = 0.0
                var k = 0
                while (k < lv.length) { na += lv(k) * lv(k); k += 1 }
                val sqrtNa = math.sqrt(na)
                rRows.indices.iterator.flatMap { i =>
                  val rv = rVecs(i)
                  if (rv == null || rv.length != lv.length) Iterator.empty
                  else {
                    candidates.add(1)
                    var dot = 0.0
                    var j = 0
                    while (j < lv.length) { dot += lv(j) * rv(j); j += 1 }
                    val den = sqrtNa * rNorms(i)
                    if (den == 0.0) Iterator.empty
                    else {
                      val cos = dot / den
                      val pass = if (strictCmp) cos > t else cos >= t
                      if (!pass) Iterator.empty
                      else {
                        joined(lrow, rRows(i))
                        if (resPred.forall(_.eval(joined))) {
                          outputRows.add(1)
                          Iterator.single(outProj(joined))
                        } else Iterator.empty
                      }
                    }
                  }
                }
              }
            }
          }
        }
      }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): CosineJoinExec =
    copy(left = newLeft, right = newRight)
}
