package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused hashed-ngram feature bucketing for DSIR-style importance
  * weighting ([[graft.ops.Dsir]]): every unigram AND bigram occurrence's
  * portable rolling-hash bucket, in one pass over the text, emitted as
  * `array<bigint>` in [[graft.ops.Dsir.featureBuckets]]' order (all
  * unigrams, then all bigrams).
  *
  * Value-identical to the reference HOF formulation (DsirSpec pins it):
  * per feature string, fold `(a·31 + codepoint) mod 2^40` over its code
  * points, then mod `buckets`. The fusion never materializes an n-gram
  * string: the current token's hash state and the "previous token start
  * onward" hash state advance together, each token boundary emits one
  * unigram and (after the first token) one bigram. The mod is a mask
  * (power-of-two modulus, non-negative operands), so the whole kernel is
  * a branchy add-multiply per character — no allocation until the output
  * array.
  */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {

  override def prettyName: String = "graft_dsir_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_dsir_buckets requires a string argument, got ${child.dataType.catalogString}")
    else if (buckets < 1)
      TypeCheckResult.TypeCheckFailure("graft_dsir_buckets: buckets must be >= 1")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    DsirBucketsKernel.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DsirBucketsKernel.compute($c, $buckets);")

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

/** The bucketing kernel (static so generated code can call it). */
object DsirBucketsKernel {

  /** 2^40 − 1: the fold's modulus as a mask. Keeps `a·31 + c` far inside
    * 63 bits (the oracle-side BIGINT constraint — DuckDB raises on
    * overflow) while `%` == `&` because every operand is non-negative.
    */
  private val Mask = (1L << 40) - 1

  def compute(text: UTF8String, buckets: Int): ArrayData = {
    val s = text.toString
    // n tokens = separators + 1 unigrams, n-1 bigrams (when n >= 2)
    var nTok = 1
    var j = 0
    while (j < s.length) { if (s.charAt(j) == ' ') nTok += 1; j += 1 }
    val out = new Array[Long](nTok + (nTok - 1))
    var uni = 0          // next unigram slot
    var big = nTok       // next bigram slot
    var t = 0L           // rolling hash of the current token
    var b = 0L           // rolling hash from the PREVIOUS token's start
    var hasPrev = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp == ' ') {
        out(uni) = t % buckets; uni += 1
        if (hasPrev) { out(big) = b % buckets; big += 1 }
        // the bigram state restarts as hash("<token> "): continue the
        // finished token's own hash through the separator
        b = (t * 31 + ' ') & Mask
        hasPrev = true
        t = 0L
      } else {
        t = (t * 31 + cp) & Mask
        if (hasPrev) b = (b * 31 + cp) & Mask
      }
      i += Character.charCount(cp)
    }
    out(uni) = t % buckets
    if (hasPrev) out(big) = b % buckets
    new GenericArrayData(out)
  }
}
