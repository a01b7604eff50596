package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign random projection (Johnson–Lindenstrauss with a ±1 matrix,
  * Achlioptas 2003 "Database-friendly random projections" — public
  * paper): `out[j] = Σ_i s(i,j) · mill(x_i)` where `s(i,j) ∈ {+1, −1}`
  * is drawn from a deterministic portable mix of `(i, j, seed)` and
  * `mill(x) = floor(x·10^6 + 0.5)` is the input component in integer
  * MILLIONTHS. The whole kernel is integer arithmetic after the one
  * float→millionths rounding, so the projected vector is EXACTLY
  * reproducible in any engine — no float-summation-order ambiguity
  * (`Σ ±x_i` in doubles would need a pinned fold order; an integer sum
  * is order-free).
  *
  * Scale story: dimensionality reduction is the standard pre-ANN step at
  * 100 TB — a 64-d float corpus projected to 8-d costs one map pass and
  * shrinks every downstream pair-scoring join's bytes ~8×, while JL
  * guarantees pairwise geometry is approximately preserved. The sign
  * matrix is never materialized: `s(i,j)` is recomputed from the mix in
  * registers (dim·outDim multiplies per row, no allocation until the
  * output array).
  *
  * The sign mix must be NONLINEAR in (i, j): the parity of any linear
  * form factorizes as `s_i XOR s_j`, a rank-1 sign matrix that collapses
  * the projection. Mix: `h0 = (i·1048573 + j·8191 + seed) mod 2^40`,
  * then TWO square-and-add rounds `h ← ((h mod 2^20)² + h) mod 2^40`
  * (the truncated square keeps every intermediate < 2^40 — both engines
  * stay far inside 63-bit overflow, the repo's oracle discipline; one
  * round leaves bit bias ≈ 13%, two bring it under 2%), sign from bit 20
  * of the result. ProjectQuantizeSpec pins sign balance and column
  * decorrelation empirically.
  */
case class RandomProject(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {

  override def prettyName: String = "graft_rproject"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) if outDim >= 1 && seed >= 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType | DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "graft_rproject: outDim must be >= 1 and seed >= 0")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_rproject requires array<float>/array<double>, got ${other.catalogString}")
  }

  private val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    RandomProjectKernel.compute(
      input.asInstanceOf[ArrayData], elemIsFloat, outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RandomProjectKernel.compute($c, $elemIsFloat, $outDim, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
}

/** The projection kernel (static so generated code can call it). */
object RandomProjectKernel {

  private val Mod40 = 1L << 40
  private val Mod20 = 1L << 20

  /** +1 or −1 from the portable (i, j, seed) mix — the exact integer
    * recipe the DuckDB oracle replays (see DocOps q114's oracle SQL).
    */
  def sign(i: Int, j: Int, seed: Long): Long = {
    val h0 = (i.toLong * 1048573L + j.toLong * 8191L + seed) % Mod40
    val h1 = h0 % Mod20
    val h2 = (h1 * h1 + h0) % Mod40
    val h3 = h2 % Mod20
    val h4 = (h3 * h3 + h2) % Mod40
    if (((h4 >> 20) & 1L) == 0L) 1L else -1L
  }

  def compute(vec: ArrayData, elemIsFloat: Boolean, outDim: Int,
      seed: Long): ArrayData = {
    val n = vec.numElements()
    // One float→integer rounding per input component, shared by all
    // outDim accumulators. floor(x·1e6 + 0.5) = round-half-up — floor is
    // floor in both engines (DuckDB CAST rounds; never CAST a fraction).
    val mill = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      mill(i) = math.floor(x * 1000000.0 + 0.5).toLong
      i += 1
    }
    val out = new Array[Long](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0L
      i = 0
      while (i < n) {
        acc += sign(i, j, seed) * mill(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}
