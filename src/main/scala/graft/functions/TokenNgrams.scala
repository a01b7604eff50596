package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram OCCURRENCES of a single-space-tokenized text,
  * duplicates preserved in position order — the frequency-counting form
  * ([[WordShingles]] is the distinct-set form similarity operators use;
  * language-model counting must keep every occurrence).
  *
  * Value-identical to the higher-order reference
  * [[graft.ops.Shingles.wordNgramOccurrences]] (`transform(sequence)` →
  * `array_join(slice)`), by the same identity [[TokenWindowHashes]] rests
  * on: splitting on every 0x20 makes each n-token window an exact BYTE
  * SUBSTRING of the original text, so every gram is emitted as a
  * zero-copy slice over one shared byte array — no per-gram token arrays,
  * joins, or builders — inside whole-stage codegen. Texts with fewer than
  * `n` tokens yield an empty array.
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram size must be >= 1, got $n")

  override def prettyName: String = "graft_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NgramKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NgramKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

/** The occurrence-ngram kernel (static so generated code can call it). */
object NgramKernel {

  private val empty = new GenericArrayData(Array.empty[AnyRef])

  def compute(text: UTF8String, n: Int): ArrayData = {
    // one materialized byte array shared by every emitted slice
    val bytes = text.getBytes
    val len = bytes.length
    var nTok = 1
    var i = 0
    while (i < len) {
      if (bytes(i) == 0x20) nTok += 1
      i += 1
    }
    if (nTok < n) return empty
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val m = nTok - n + 1
    val out = new Array[AnyRef](m)
    var p = 0
    while (p < m) {
      val s = starts(p)
      val e = if (p + n < nTok) starts(p + n) - 1 else len
      out(p) = UTF8String.fromBytes(bytes, s, e - s)
      p += 1
    }
    new GenericArrayData(out)
  }
}
