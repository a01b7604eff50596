package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd fused cosine similarity of two float/double array
  * columns: ONE pass over the pair computes the dot product and both
  * squared norms, then `dot / (sqrt(na) * sqrt(nb))`.
  *
  * Bit-for-bit equal to the composed form
  * `graft_dot(a, b) / (sqrt(graft_dot(a, a)) * sqrt(graft_dot(b, b)))`
  * on every defined input: each of the three accumulators performs the
  * identical left-to-right double fold the three separate [[DotProduct]]
  * evaluations would, interleaving changes nothing about any single
  * accumulator's addition sequence, and the final sqrt/multiply/divide is
  * the same operation chain (verified element-wise in
  * SimilarityJoinSpec). Symmetric in its arguments to the bit
  * (`x*y == y*x` in IEEE), which is what lets the planner swap join sides
  * freely.
  *
  * When to use which: this expression wins when each (a, b) pair is
  * scored ONCE (a scalar over already-paired rows, or a declarative join
  * condition — see [[graft.plans.SimilarityJoinStrategy]]); the
  * precomputed-norm form in [[graft.ops.Similarity]] wins inside
  * candidate joins where one row is scored against many candidates and
  * the norms amortize below the join.
  *
  * Null semantics mirror the composed chain: null array, mismatched
  * lengths, or any null element → null. The ONE deliberate divergence:
  * a zero denominator (either vector all-zero) returns NULL — a zero
  * vector has no defined angle — where the composed `Divide` would
  * return null only in legacy mode and raise DIVIDE_BY_ZERO under ANSI.
  * For a similarity predicate, `null >= t` → filtered is the semantics
  * every caller wants.
  */
/** @param approxHint plan-embedded per-join opt-in: `true` (the
  *   `graft_cosine_approx` form) tells [[graft.plans
  *   .SimilarityJoinStrategy]] to plan a threshold join over THIS
  *   expression approximately, with no session conf — the opt-in travels
  *   with the query text and cannot leak onto other joins. Evaluation is
  *   identical either way.
  */
case class CosineSim(left: Expression, right: Expression,
    approxHint: Boolean = false)
    extends BinaryExpression {

  private def isNumericArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumericArray(left.dataType) && isNumericArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires array<float>/array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def prettyName: String = "graft_cosine"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      val xv = if (lf) x.getFloat(k).toDouble else x.getDouble(k)
      val yv = if (rf) y.getFloat(k).toDouble else y.getDouble(k)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      k += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) null else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val den = ctx.freshName("den")
      val bad = ctx.freshName("bad")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val xg = if (isFloat(left)) s"(double) $a.getFloat($k)" else s"$a.getDouble($k)"
      val yg = if (isFloat(right)) s"(double) $b.getFloat($k)" else s"$b.getDouble($k)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $k = 0; $k < $n; $k++) {
         |    if ($a.isNullAt($k) || $b.isNullAt($k)) { $bad = true; break; }
         |    final double $xv = $xg;
         |    final double $yv = $yg;
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($bad || $den == 0.0) ${ev.isNull} = true; else ${ev.value} = $dot / $den;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
