package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Model-free document embedding by the hashing trick (Weinberger et al.
  * 2009, "Feature Hashing for Large Scale Multitask Learning" — public
  * paper) composed with sign random projection: every hashed
  * unigram+bigram occurrence ([[DsirBuckets]]' feature space) contributes
  * `s(bucket, j) ∈ {+1, −1}` to output component `j`, i.e. the dense
  * `outDim`-vector is the ±1 projection of the document's sparse
  * bag-of-hashed-ngrams. Identical texts embed identically; texts sharing
  * features land close in cosine — which is exactly what the ANN / dedup
  * stack needs to run on RAW TEXT with no trained model anywhere.
  *
  * Fused one pass: the rolling bucket hash ([[DsirBucketsKernel]]'s
  * recipe) and the sign accumulation advance together over the text — no
  * n-gram string, no bucket array, no feature vector is ever
  * materialized; the allocations are the output and (for small bucket
  * tables only) a lazily-filled sign-row memo. All-integer output
  * (counts of +1s minus −1s), so both engines agree bit-for-bit.
  *
  * The sign is [[RandomProjectKernel.sign]]'s two-round portable mix with
  * the bucket id as the row index — bucket < 2^20 keeps the mix's first
  * multiply far inside 63 bits (the oracle-side BIGINT constraint).
  */
case class HashEmbed(child: Expression, buckets: Int, outDim: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "graft_hash_embed"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_hash_embed requires a string argument, got ${child.dataType.catalogString}")
    else if (buckets < 1 || buckets > (1 << 20))
      TypeCheckResult.TypeCheckFailure(
        "graft_hash_embed: 1 <= buckets <= 2^20")
    else if (outDim < 1 || seed < 0)
      TypeCheckResult.TypeCheckFailure(
        "graft_hash_embed: outDim must be >= 1 and seed >= 0")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    HashEmbedKernel.compute(
      input.asInstanceOf[UTF8String], buckets, outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashEmbedKernel.compute($c, $buckets, $outDim, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

/** The embedding kernel (static so generated code can call it). */
object HashEmbedKernel {

  private val Mask = (1L << 40) - 1

  /** Memoize sign rows only while the table stays small: above this the
    * per-row cache array would cost more to allocate and zero than the
    * sign mix it saves (a document touches far fewer buckets than a
    * 2^20-bucket table has — an 8 MB zeroed array per row for a handful
    * of hits).
    */
  private val MemoMaxBuckets = 1 << 13

  /** Accumulate one feature bucket's sign row into the output. Sign rows
    * for a bounded bucket table repeat heavily across a document, so they
    * are memoized per (bucket) in `cache` when the table is small (for
    * the 512-bucket query shape that's a 4 KB lazily-filled array); a
    * null cache means "compute the mix directly".
    */
  private def addBucket(b: Int, out: Array[Long], cache: Array[Array[Long]],
      outDim: Int, seed: Long): Unit = {
    if (cache == null) {
      var j = 0
      while (j < outDim) {
        out(j) += RandomProjectKernel.sign(b, j, seed); j += 1
      }
      return
    }
    var row = cache(b)
    if (row == null) {
      row = new Array[Long](outDim)
      var j = 0
      while (j < outDim) {
        row(j) = RandomProjectKernel.sign(b, j, seed); j += 1
      }
      cache(b) = row
    }
    var j = 0
    while (j < outDim) { out(j) += row(j); j += 1 }
  }

  def compute(text: UTF8String, buckets: Int, outDim: Int,
      seed: Long): ArrayData = {
    val s = text.toString
    val out = new Array[Long](outDim)
    val cache =
      if (buckets <= MemoMaxBuckets) new Array[Array[Long]](buckets) else null
    // DsirBucketsKernel's fused walk: the current token's hash and the
    // previous-token-start hash advance together; every token boundary
    // lands one unigram bucket and (after the first token) one bigram
    var t = 0L
    var b = 0L
    var hasPrev = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') {
        addBucket((t % buckets).toInt, out, cache, outDim, seed)
        if (hasPrev) addBucket((b % buckets).toInt, out, cache, outDim, seed)
        b = (t * 31 + ' ') & Mask
        hasPrev = true
        t = 0L
      } else {
        t = (t * 31 + cp) & Mask
        if (hasPrev) b = (b * 31 + cp) & Mask
      }
      i += Character.charCount(cp)
    }
    addBucket((t % buckets).toInt, out, cache, outDim, seed)
    if (hasPrev) addBucket((b % buckets).toInt, out, cache, outDim, seed)
    new GenericArrayData(out)
  }
}
