package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Constant product-quantization codebook state shared by the PQ kernels:
  * `m` subspaces × `k` centroids × `subDim` dims, flattened as
  * `((s·k + j)·subDim + d)`, with the per-centroid squared norms
  * precomputed once at plan time. Rides the plan as a codegen reference
  * object (the [[BloomRef]]/[[BpeEncode]] pattern) — the naive
  * literal-tree formulation of the same math (m·k separate dot
  * subexpressions) costs ~10 s of planning+Janino per query, which is
  * why these are native kernels and not column compositions.
  */
final class PqRef(val m: Int, val k: Int, val flat: Array[Double],
    val coarse: Array[Double] = Array.empty)
    extends Serializable {
  require(m > 0 && k > 0 && flat.length % (m * k) == 0,
    s"codebook length ${flat.length} not divisible by m*k=${m * k}")
  val subDim: Int = flat.length / (m * k)
  val dim: Int = m * subDim
  require(coarse.isEmpty || coarse.length % dim == 0,
    s"coarse centroid table length ${coarse.length} not divisible by dim=$dim")

  /** Number of coarse cells when residual-mode state is present. */
  val cells: Int = if (coarse.isEmpty) 0 else coarse.length / dim

  // content equality (the [[BloomRef]] convention) so plan-level
  // dedup/canonicalization sees two same-codebook kernels as equal
  override def equals(other: Any): Boolean = other match {
    case o: PqRef => m == o.m && k == o.k &&
      java.util.Arrays.equals(flat, o.flat) &&
      java.util.Arrays.equals(coarse, o.coarse)
    case _ => false
  }
  override def hashCode(): Int =
    ((31 * m + k) * 31 + java.util.Arrays.hashCode(flat)) * 31 +
      java.util.Arrays.hashCode(coarse)

  /** Σ c² per flattened centroid (s·k + j). */
  val cc: Array[Double] = {
    val out = new Array[Double](m * k)
    var c = 0
    while (c < out.length) {
      var acc = 0.0
      var d = 0
      while (d < subDim) { acc += flat(c * subDim + d) * flat(c * subDim + d); d += 1 }
      out(c) = acc
      c += 1
    }
    out
  }

  /** Subspace dot of the (possibly RESIDUALIZED) vector with centroid
    * `c`: `cell < 0` reads the raw component, `cell >= 0` subtracts the
    * coarse centroid first — FAISS's `by_residual` encoding, fused so the
    * residual vector is never materialized.
    */
  private def dotSub(vec: ArrayData, isFloat: Boolean, s: Int, c: Int,
      cell: Int): Double = {
    var acc = 0.0
    var d = 0
    val base = c * subDim
    val off = s * subDim
    val cBase = if (cell < 0) 0 else cell * dim + off
    while (d < subDim) {
      var x = if (isFloat) vec.getFloat(off + d).toDouble else vec.getDouble(off + d)
      if (cell >= 0) x -= coarse(cBase + d)
      acc += x * flat(base + d)
      d += 1
    }
    acc
  }

  private def validCell(cell: Int): Boolean = cell >= 0 && cell < cells

  private def anyNull(vec: ArrayData): Boolean = {
    var i = 0
    while (i < vec.numElements()) {
      if (vec.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Per-subspace L2-nearest centroid indices (tie → larger index, the
    * `array_max`-over-structs convention), or null on length mismatch /
    * null element / out-of-range cell. `cell >= 0` encodes the RESIDUAL
    * against that coarse centroid (FAISS's `by_residual` mode, fused —
    * the residual vector is never materialized); `cell < 0` encodes the
    * raw vector.
    */
  def encode(vec: ArrayData, isFloat: Boolean, cell: Int = -1): ArrayData = {
    if (vec.numElements() != dim || anyNull(vec)) return null
    if (cell >= 0 && !validCell(cell)) return null
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        val c = s * k + j
        val score = dotSub(vec, isFloat, s, c, cell) - cc(c) / 2.0
        if (score >= bestScore) { bestScore = score; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The ADC distance table for a query vector. Raw mode (`cell < 0`):
    * SHIFTED entries `c·c − 2·q_s·c` — the true per-subspace squared
    * distance minus the candidate-independent `q_s·q_s`; every candidate
    * of a query scores against this ONE table, so the per-query constant
    * shift preserves order and ties at `k` fewer multiplies per entry.
    * Residual mode (`cell >= 0`): UNSHIFTED entries
    * `r_s·r_s + c·c − 2·r_s·c` = the true per-subspace squared distance of
    * the residual `r = q − coarse[cell]` — the `r_s·r_s` term is
    * CELL-DEPENDENT (Σ_s r_s·r_s = ‖q − coarse[cell]‖², FAISS
    * `by_residual`'s coarse-distance term), so dropping it would bias
    * cross-cell ranking at `nProbe > 1` toward candidates in farther
    * cells; including it makes scores from different probed cells
    * directly comparable (each totals to the true ADC distance).
    * Null on mismatch / out-of-range cell.
    */
  def dtab(vec: ArrayData, isFloat: Boolean, cell: Int = -1): ArrayData = {
    if (vec.numElements() != dim || anyNull(vec)) return null
    if (cell >= 0 && !validCell(cell)) return null
    val out = new Array[Any](m * k)
    var s = 0
    while (s < m) {
      // residual mode: the per-subspace residual self-term r_s·r_s
      var rr = 0.0
      if (cell >= 0) {
        val off = s * subDim
        val cBase = cell * dim + off
        var d = 0
        while (d < subDim) {
          val x = (if (isFloat) vec.getFloat(off + d).toDouble
                   else vec.getDouble(off + d)) - coarse(cBase + d)
          rr += x * x
          d += 1
        }
      }
      var j = 0
      while (j < k) {
        val c = s * k + j
        out(c) = rr + cc(c) - 2.0 * dotSub(vec, isFloat, s, c, cell)
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

}

private[functions] object PqKernels {
  def vectorOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** `graft_pq_encode(vec, books, m, k)` → array<int>: the m-nibble PQ code
  * (books/m/k must be literals — folded into the constant [[PqRef]]).
  */
case class PqEncode(child: Expression, ref: PqRef)
    extends UnaryExpression {

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.vectorOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode requires array<float>/array<double>, got ${child.dataType.catalogString}")

  private def flt: Boolean = PqKernels.isFloat(child)

  override def nullSafeEval(input: Any): Any =
    ref.encode(input.asInstanceOf[ArrayData], flt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("pqRef", ref, classOf[PqRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $r.encode($c, $flt, -1);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** `graft_pq_dtab(vec, books, m, k)` → array<double>: the query's shifted
  * ADC distance table (m·k entries), computed once per query row.
  */
case class PqDistTable(child: Expression, ref: PqRef)
    extends UnaryExpression {

  override def prettyName: String = "graft_pq_dtab"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.vectorOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_dtab requires array<float>/array<double>, got ${child.dataType.catalogString}")

  private def flt: Boolean = PqKernels.isFloat(child)

  override def nullSafeEval(input: Any): Any =
    ref.dtab(input.asInstanceOf[ArrayData], flt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("pqRef", ref, classOf[PqRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $r.dtab($c, $flt, -1);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
}

/** `graft_pq_encode_res(vec, cell, coarse, books, m, k)` → array<int>:
  * the RESIDUAL PQ code — the vector minus its coarse cell's centroid,
  * encoded (FAISS `by_residual=true`, the default IVFPQ fidelity mode:
  * residuals are smaller and better centered than raw vectors, so the
  * same codebook budget quantizes them tighter). The residual is fused
  * into the kernel's dot loop, never materialized.
  */
case class PqEncodeRes(left: Expression, right: Expression, ref: PqRef)
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_encode_res"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.vectorOk(left.dataType) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_encode_res requires (array<float>/array<double>, int), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def flt: Boolean = PqKernels.isFloat(left)

  override def nullSafeEval(a: Any, b: Any): Any =
    ref.encode(a.asInstanceOf[ArrayData], flt, b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("pqRef", ref, classOf[PqRef].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = $r.encode($a, $flt, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeRes =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_dtab_res(vec, cell, coarse, books, m, k)` → array<double>:
  * the query's shifted ADC table against ONE probed cell's residual frame
  * — computed per (query, probed cell) pair, the residual-mode query cost
  * (nProbe tables per query instead of one).
  */
case class PqDistTableRes(left: Expression, right: Expression, ref: PqRef)
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_dtab_res"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.vectorOk(left.dataType) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_dtab_res requires (array<float>/array<double>, int), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def flt: Boolean = PqKernels.isFloat(left)

  override def nullSafeEval(a: Any, b: Any): Any =
    ref.dtab(a.asInstanceOf[ArrayData], flt, b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("pqRef", ref, classOf[PqRef].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = $r.dtab($a, $flt, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDistTableRes =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_adc(dtab, code, m, k)` → double: the candidate's shifted ADC
  * distance — m table lookups inside whole-stage codegen, the hot path of
  * the IVF-PQ candidate scoring join.
  */
case class PqAdc(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires (array<double>, array<int>), got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val dtab = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    if (code.numElements() != m || dtab.numElements() != m * k) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      if (code.isNullAt(s)) return null
      val j = code.getInt(s)
      if (j < 0 || j >= k) return null
      acc += dtab.getDouble(s * k + j)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      s"""
         |double $acc = 0.0;
         |boolean $bad = $b.numElements() != $m || $a.numElements() != ${m * k};
         |if (!$bad) {
         |  for (int $s = 0; $s < $m; $s++) {
         |    if ($b.isNullAt($s)) { $bad = true; break; }
         |    final int $j = $b.getInt($s);
         |    if ($j < 0 || $j >= $k) { $bad = true; break; }
         |    $acc += $a.getDouble($s * $k + $j);
         |  }
         |}
         |if ($bad) ${ev.isNull} = true; else ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** Constant orthogonal-rotation state for OPQ (Ge et al., "Optimized
  * Product Quantization", CVPR 2013): `mat` is R, dim×dim row-major,
  * trained to minimize PQ reconstruction error in the ROTATED space.
  * Rides the plan as one codegen reference object like [[PqRef]] — the
  * literal-tree formulation (dim² multiply subexpressions) would pay
  * seconds of planning+Janino per query.
  */
final class RotRef(val dim: Int, val mat: Array[Double]) extends Serializable {
  require(dim > 0 && mat.length == dim * dim,
    s"rotation length ${mat.length} != dim²=${dim * dim}")

  // content equality (the [[BloomRef]] convention): two occurrences of
  // the same rotation must compare equal or Catalyst's subexpression
  // elimination / canonicalization treats them as distinct expressions
  // and pays the dim² kernel once per occurrence
  override def equals(other: Any): Boolean = other match {
    case o: RotRef => dim == o.dim && java.util.Arrays.equals(mat, o.mat)
    case _ => false
  }
  override def hashCode(): Int =
    31 * dim + java.util.Arrays.hashCode(mat)

  /** y = R·x, emitted at the INPUT's element type (float stays float, so
    * a rotated embedding column drops into every downstream vector
    * operator unchanged). Null on length mismatch / null element.
    */
  def rotate(vec: ArrayData, isFloat: Boolean): ArrayData = {
    if (vec.numElements() != dim) return null
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      i += 1
    }
    val out = new Array[Any](dim)
    i = 0
    while (i < dim) {
      var acc = 0.0
      val base = i * dim
      var j = 0
      while (j < dim) {
        val x = if (isFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
        acc += mat(base + j) * x
        j += 1
      }
      out(i) = if (isFloat) acc.toFloat else acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_opq_rotate(vec, mat, dim)` → array of the input's element type:
  * the OPQ-rotated vector (mat/dim must be literals — folded into the
  * constant [[RotRef]]). Orthogonality makes every distance downstream
  * invariant, so the rotation composes in FRONT of the coarse index and
  * the PQ codebooks (the FAISS `OPQ` VectorTransform position).
  */
case class OpqRotate(child: Expression, ref: RotRef)
    extends UnaryExpression {

  override def prettyName: String = "graft_opq_rotate"
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (PqKernels.vectorOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_opq_rotate requires array<float>/array<double>, got ${child.dataType.catalogString}")

  private def flt: Boolean = PqKernels.isFloat(child)

  override def nullSafeEval(input: Any): Any =
    ref.rotate(input.asInstanceOf[ArrayData], flt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("rotRef", ref, classOf[RotRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $r.rotate($c, $flt);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): OpqRotate =
    copy(child = newChild)
}
