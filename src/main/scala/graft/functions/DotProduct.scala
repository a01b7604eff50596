package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product of two float/double array columns.
  *
  * Semantically identical to the built-in higher-order formulation
  * `aggregate(zip_with(a, b, (x, y) => double(x) * double(y)), 0.0, _ + _)`
  * — the SAME left-to-right double fold, so results are bit-for-bit equal
  * (the DuckDB oracle for the ANN queries verifies this end-to-end every
  * run). The difference is execution: Spark evaluates higher-order
  * functions interpreted, one lambda dispatch per element, outside
  * whole-stage codegen; this expression compiles to a tight primitive Java
  * loop inside the generated stage — the preference order SURVEY §7.3
  * prescribes (native `Expression` with `doGenCode` over HOFs over UDFs).
  *
  * Null semantics mirror the HOF chain: null array → null; arrays of
  * different lengths → null (zip_with pads with nulls, which poison the
  * sum); any null element → null.
  */
case class DotProduct(left: Expression, right: Expression)
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
        s"graft_dot requires array<float>/array<double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def prettyName: String = "graft_dot"
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
    var sum = 0.0
    var k = 0
    while (k < n) {
      if (x.isNullAt(k) || y.isNullAt(k)) return null
      val xv = if (lf) x.getFloat(k).toDouble else x.getDouble(k)
      val yv = if (rf) y.getFloat(k).toDouble else y.getDouble(k)
      sum += xv * yv
      k += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      val xv = if (isFloat(left)) s"(double) $a.getFloat($k)" else s"$a.getDouble($k)"
      val yv = if (isFloat(right)) s"(double) $b.getFloat($k)" else s"$b.getDouble($k)"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  boolean $bad = false;
         |  for (int $k = 0; $k < $n; $k++) {
         |    if ($a.isNullAt($k) || $b.isNullAt($k)) { $bad = true; break; }
         |    $sum += $xv * $yv;
         |  }
         |  if ($bad) ${ev.isNull} = true; else ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
