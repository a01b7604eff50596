package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Size, StringSplit, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native token count of a single-space-tokenized text: spaces + 1 — the
  * value `size(split(text, " ", -1))` computes, WITHOUT materializing the
  * token array (split allocates one UTF8String per token just so Size can
  * read the array length and drop it; this is one byte scan, no
  * allocation). `split(" ")` on any string — including "" — yields at
  * least one element, so the count is spaces+1 unconditionally, and
  * `size(null)` is null under non-legacy semantics, matched by the
  * null-intolerant UnaryExpression contract.
  *
  * Installed two ways: callable directly, and substituted automatically by
  * [[TokenCountRewrite]] wherever the HOF pattern appears in a plan.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_tokcount"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tokcount requires a string argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    TokenCountKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenCountKernel.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

/** The counting kernel (static so generated code can call it). */
object TokenCountKernel {
  def compute(text: UTF8String): Int = {
    val len = text.numBytes()
    var n = 1
    var i = 0
    while (i < len) {
      // 0x20 never occurs inside a UTF-8 multi-byte sequence
      if (text.getByte(i) == 0x20) n += 1
      i += 1
    }
    n
  }
}

/** Optimizer rule (injected via `SparkSessionExtensions
  * .injectOptimizerRule` — the Rule[LogicalPlan] rung of the extension
  * ladder): rewrite `size(split(s, " ", -1))` to [[TokenCount]] everywhere
  * in the plan. Value-identical (see [[TokenCount]]); every token-count
  * call site in the engine — quality gates, packing, quantile inputs —
  * gets the allocation-free form without being edited. Only the exact
  * single-space, no-limit, non-legacy-null shape is rewritten: any other
  * pattern keeps built-in semantics.
  */
class TokenCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str,
          Literal(sep: UTF8String, StringType),
          Literal(-1, IntegerType)), false)
          if sep.toString == " " && str.dataType == StringType =>
        TokenCount(str)
    }
}
