package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing document fingerprint (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 — the MOSS sketch): base-31 rolling hash of every `k`-gram of
  * the text, minimum per `w`-window, deduplicated and sorted ascending.
  *
  * Value-identical to the three-projection higher-order formulation in
  * [[graft.ops.TextAnalysis]] (`charCodes` → `kgramHashesFromCodes` →
  * `winnowSelect`), which remains the executable semantic reference:
  *  - the k-gram fold `a*31 + c` over Unicode CODE POINTS (what `split` +
  *    `ascii` yields — a surrogate pair is one element, not two) and the
  *    rolling update `(h - c₀·31^(k-1))·31 + c_k` compute the same
  *    polynomial in exact (mod 2⁶⁴) integer arithmetic, so every hash is
  *    bit-identical, non-BMP text included;
  *  - window minima, distinct, and ascending sort match `array_min` /
  *    `array_distinct` / `array_sort`.
  *
  * The difference is cost: the HOF chain is evaluated interpreted — one
  * lambda dispatch per character, per gram, and per window, across three
  * stacked projections — where this expression runs one fused O(n) pass
  * (rolling hash + monotonic-deque sliding minimum) inside whole-stage
  * codegen. Texts shorter than `k + w - 1` characters yield an empty set,
  * like the HOF chain.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def prettyName: String = "graft_winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    WinnowHash.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowHash.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** The fused fingerprint kernel (static so generated code can call it). */
object WinnowHash {

  private val empty = new GenericArrayData(Array.emptyLongArray)

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    // materialize CODE POINTS first (one element per Unicode code point —
    // the unit charCodes' split+ascii produces; iterating UTF-16 code
    // units would double-count supplementary characters and diverge from
    // the HOF reference on non-BMP text)
    val cps = new Array[Int](s.length) // upper bound: one cp per char
    var n = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(n) = cp
      n += 1
      ci += Character.charCount(cp)
    }
    if (n < k) return empty
    val m = n - k + 1
    if (m < w) return empty
    // rolling base-31 hash of every k-gram — identical (mod 2^64) to the
    // left fold a*31 + c over the gram's code points
    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = h * 31L + cps(i).toLong; i += 1 }
    hashes(0) = h
    var pow = 1L
    i = 0
    while (i < k - 1) { pow *= 31L; i += 1 }
    var j = 1
    while (j < m) {
      h = (h - cps(j - 1).toLong * pow) * 31L + cps(j + k - 1).toLong
      hashes(j) = h
      j += 1
    }
    // sliding-window minimum via monotonic deque: O(m) total
    val nOut = m - w + 1
    val mins = new Array[Long](nOut)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    var x = 0
    while (x < m) {
      if (head < tail && deque(head) <= x - w) head += 1
      while (head < tail && hashes(deque(tail - 1)) >= hashes(x)) tail -= 1
      deque(tail) = x
      tail += 1
      if (x >= w - 1) mins(x - w + 1) = hashes(deque(head))
      x += 1
    }
    val out = mins.distinct
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
