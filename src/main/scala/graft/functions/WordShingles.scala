package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word n-gram shingles of a single-space-tokenized text.
  *
  * Value-identical to the higher-order reference formulation
  * [[graft.ops.Shingles.wordShingles]] (`split` → `transform(sequence)` →
  * `array_join(slice)` → `array_distinct`): same single-space split with
  * trailing empties kept, same join (empty tokens contribute empty
  * segments), and the same first-occurrence dedup order as
  * `array_distinct`. Texts with fewer than `n` tokens yield an empty set.
  *
  * The HOF chain evaluates interpreted — a lambda dispatch per token per
  * gram plus an O(gram²) distinct; this kernel is one pass with a hash-set
  * dedup, called from generated code so shingling stays inside whole-stage
  * codegen. It sits under every inverted-index build (NearDup postings)
  * and the vocabulary query.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleKernel.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** The shingling kernel (static so generated code can call it). */
object ShingleKernel {

  private val empty = new GenericArrayData(Array.empty[AnyRef])

  def compute(text: UTF8String, n: Int): ArrayData = {
    // String.split(" ", -1) == Spark's split(text, " ", -1): single-space
    // regex, trailing empties kept
    val tokens = text.toString.split(" ", -1)
    if (tokens.length < n) return empty
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= tokens.length) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}
