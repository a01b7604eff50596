package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Constant coarse-quantizer state shared by the IVF routing kernels:
  * `cells × dim` float centroids (flattened `ci·dim + d`) with the
  * per-centroid L2 norms precomputed once at plan time — the
  * [[PqRef]]/[[RotRef]] pattern applied to the cell-scoring step.
  *
  * Why native (r20 optimization round, guide §1/§4): the previous
  * formulation built `cells` struct literals of `dim` element literals
  * each per call site (array_max/array_sort over
  * `struct(graft_dot(vec, [64 lits]) / norm, cell)` — ~1k Literal nodes
  * PER probe/assign site, several sites per ANN query). Measured at
  * sf0.1 that cost 2-3 s of driver-side analysis/optimization per query
  * invocation and 2.2 MiB task binaries per stage; the kernel folds the
  * table into ONE plan-constant reference object.
  *
  * Exactness contract (differentially tested in IvfKernelsSpec): every
  * output is bit-identical to the replaced expression composition —
  * same left-to-right [[DotProduct]] fold, same plan-time
  * `sqrt(Σ c·c)` norm, same IEEE division, and the same Spark ordering
  * (`SQLOrderingUtil.compareDoubles`: `-0.0 == 0.0`, NaN greatest,
  * null score first) with ties broken toward the LARGER cell (the
  * array_max / descending array_sort convention). A null/malformed
  * vector yields a null score in every struct, so the argmax cell
  * degenerates to `cells-1` and the probe list to `cells-1, cells-2, …`
  * — preserved here, including the NON-null cell output for a null
  * input vector.
  *
  * One deliberate divergence, unreachable from every registered query: a
  * ZERO-NORM centroid makes the composition's `dot / lit(0.0)` throw
  * DIVIDE_BY_ZERO under ANSI mode (the session default) for every row —
  * i.e. the whole query fails. The kernel instead keeps the IEEE
  * (non-ANSI) semantics the composition has with ANSI off: score
  * ±Infinity/NaN, ordered by Spark's double ordering. Lloyd centroids of
  * any non-degenerate corpus have positive norm, so the case never
  * arises outside an adversarial test; IvfKernelsSpec pins the kernel
  * against the non-ANSI reference for it.
  */
final class IvfRef(val dim: Int, val flat: Array[Float]) extends Serializable {
  require(dim > 0 && flat.length % dim == 0 && flat.length > 0,
    s"centroid table length ${flat.length} not a positive multiple of dim=$dim")
  val cells: Int = flat.length / dim

  /** Plan-time norms — replicates `math.sqrt(cv.map(x => x.toDouble * x).sum)`
    * (left-to-right double fold over the float centroid values).
    */
  val norms: Array[Double] = Array.tabulate(cells) { ci =>
    var acc = 0.0
    var d = 0
    while (d < dim) {
      val x = flat(ci * dim + d).toDouble
      acc += x * x
      d += 1
    }
    math.sqrt(acc)
  }

  // content equality (the [[BloomRef]] convention) so plan-level
  // canonicalization sees two same-table kernels as equal
  override def equals(other: Any): Boolean = other match {
    case o: IvfRef => dim == o.dim && java.util.Arrays.equals(flat, o.flat)
    case _ => false
  }
  override def hashCode(): Int = 31 * dim + java.util.Arrays.hashCode(flat)

  /** Spark's double ordering (SQLOrderingUtil.compareDoubles): primitive
    * `==` first (so `-0.0 == 0.0`), then `java.lang.Double.compare`
    * (NaN greatest).
    */
  private def cmp(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** Whether every cell's dot is defined for this vector ([[DotProduct]]
    * null semantics: null array, length mismatch, or any null element
    * nulls the dot — identically for every centroid).
    */
  private def vecOk(vec: ArrayData): Boolean = {
    if (vec == null || vec.numElements() != dim) return false
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Cell scores for a VALID vector. A zero-norm centroid's score is NULL
    * under Spark's legacy Divide (divisor 0 → null even for doubles) —
    * encoded in the parallel validity mask `scoreOk`; under ANSI the
    * composition would instead fail the query (see the class doc).
    */
  private def scoresOf(vec: ArrayData, isFloat: Boolean): Array[Double] = {
    val out = new Array[Double](cells)
    var ci = 0
    while (ci < cells) {
      if (norms(ci) != 0.0) {
        var acc = 0.0
        val base = ci * dim
        var d = 0
        while (d < dim) {
          val x = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
          acc += x * flat(base + d).toDouble
          d += 1
        }
        out(ci) = acc / norms(ci)
      }
      ci += 1
    }
    out
  }

  /** Struct comparison of (score, cell) pairs by index, with null scores
    * first (Spark struct ordering) — `ok(x)` = the score is non-null.
    */
  private def cmpCells(a: Int, b: Int, s: Array[Double],
      okA: Boolean, okB: Boolean): Int = {
    val c =
      if (okA && okB) cmp(s(a), s(b))
      else if (okA == okB) 0
      else if (okA) 1
      else -1
    if (c != 0) c else Integer.compare(a, b)
  }

  /** argmax cell by (score, cell) under Spark struct ordering — ties (and
    * null scores: invalid vector, zero-norm centroid) resolve toward the
    * larger cell. NEVER null (mirrors
    * `array_max(structs).getField("cell")` over a non-empty array of
    * non-null structs).
    */
  def bestCell(vec: ArrayData, isFloat: Boolean): Int = {
    val ok = vecOk(vec)
    if (!ok && cells == 1) return 0
    val s = if (ok) scoresOf(vec, isFloat) else new Array[Double](cells)
    var best = 0
    var ci = 1
    while (ci < cells) {
      if (cmpCells(ci, best, s, ok && norms(ci) != 0.0,
          ok && norms(best) != 0.0) > 0) best = ci
      ci += 1
    }
    best
  }

  /** The argmax struct's score — null when the vector is null/malformed
    * or the argmax cell's norm is zero (mirrors
    * `array_max(structs).getField("score")`).
    */
  def bestScore(vec: ArrayData, isFloat: Boolean): Any = {
    // one validity scan + one scoring pass shared with the argmax (the
    // via-bestCell form re-ran both): a null/malformed vector scores
    // null regardless of the argmax cell, and when the vector is ok the
    // argmax over the shared scores is bestCell's own comparison
    val ok = vecOk(vec)
    if (!ok) return null
    val s = scoresOf(vec, isFloat)
    var best = 0
    var ci = 1
    while (ci < cells) {
      if (cmpCells(ci, best, s, norms(ci) != 0.0, norms(best) != 0.0) > 0)
        best = ci
      ci += 1
    }
    if (norms(best) == 0.0) null else java.lang.Double.valueOf(s(best))
  }

  /** The `nProbe` best cells, best first — descending (score, cell), the
    * `slice(reverse(array_sort(structs)), 1, n)` order; null scores
    * (invalid vector, zero-norm centroids) sort last among themselves by
    * descending cell. NEVER null.
    */
  def probes(vec: ArrayData, isFloat: Boolean, nProbe: Int): ArrayData = {
    val n = math.min(math.max(nProbe, 0), cells)
    val ok = vecOk(vec)
    val s = if (ok) scoresOf(vec, isFloat) else new Array[Double](cells)
    val ord = new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int =
        // descending: swap operands
        cmpCells(b.intValue(), a.intValue(), s,
          ok && norms(b.intValue()) != 0.0, ok && norms(a.intValue()) != 0.0)
    }
    val boxed = Array.tabulate(cells)(Integer.valueOf(_))
    java.util.Arrays.sort(boxed, ord)
    new GenericArrayData(boxed.take(n).map(i => i.intValue(): Any))
  }
}

private[functions] object IvfKernels {
  def vectorOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** `graft_ivf_cell(vec, cents, dim)` → int: the vector's argmax coarse
  * cell (cents/dim must be literals — folded into the constant
  * [[IvfRef]]). NOT null-propagating: a null/malformed vector scores
  * null against every centroid and the argmax struct degenerates to the
  * largest cell — the exact `array_max` composition semantics.
  */
case class IvfCell(child: Expression, ref: IvfRef) extends UnaryExpression {

  override def prettyName: String = "graft_ivf_cell"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (IvfKernels.vectorOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_cell requires array<float>/array<double>, got ${child.dataType.catalogString}")

  private def flt: Boolean = IvfKernels.isFloat(child)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    ref.bestCell(if (v == null) null else v.asInstanceOf[ArrayData], flt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ivfRef", ref, classOf[IvfRef].getName)
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val code =
      code"""
         |${c.code}
         |int ${ev.value} = $r.bestCell(${c.isNull} ? null : ${c.value}, $flt);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfCell =
    copy(child = newChild)
}

/** `graft_ivf_score(vec, cents, dim)` → double: the argmax cell's
  * dot/|centroid| score; null on a null/malformed vector (the
  * `array_max(...).getField("score")` composition semantics).
  */
case class IvfBestScore(child: Expression, ref: IvfRef) extends UnaryExpression {

  override def prettyName: String = "graft_ivf_score"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (IvfKernels.vectorOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_score requires array<float>/array<double>, got ${child.dataType.catalogString}")

  private def flt: Boolean = IvfKernels.isFloat(child)

  override def nullSafeEval(input: Any): Any =
    ref.bestScore(input.asInstanceOf[ArrayData], flt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ivfRef", ref, classOf[IvfRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("score")
      s"""
         |Object $s = $r.bestScore($c, $flt);
         |if ($s == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Double) $s).doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IvfBestScore =
    copy(child = newChild)
}

/** `graft_ivf_probes(vec, cents, dim, nProbe)` → array<int>: the vector's
  * `nProbe` best cells, best first (the descending-(score, cell) order of
  * `slice(reverse(array_sort(...)), 1, n)`). NOT null-propagating: a
  * null/malformed vector degenerates to `cells-1, cells-2, …` exactly
  * like the struct composition.
  */
case class IvfProbes(child: Expression, nProbe: Int, ref: IvfRef)
    extends UnaryExpression {

  override def prettyName: String = "graft_ivf_probes"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (IvfKernels.vectorOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ivf_probes requires array<float>/array<double>, got ${child.dataType.catalogString}")

  private def flt: Boolean = IvfKernels.isFloat(child)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    ref.probes(if (v == null) null else v.asInstanceOf[ArrayData], flt, nProbe)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("ivfRef", ref, classOf[IvfRef].getName)
    val c = child.genCode(ctx)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val javaType = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .javaType(dataType)
    val code =
      code"""
         |${c.code}
         |$javaType ${ev.value} = $r.probes(${c.isNull} ? null : ${c.value}, $flt, $nProbe);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbes =
    copy(child = newChild)
}

/** Constant coarse-centroid table for the residual kernel (`cell·dim + d`
  * double layout — the [[PqRef]] coarse convention).
  */
final class CoarseRef(val dim: Int, val coarse: Array[Double])
    extends Serializable {
  require(dim > 0 && coarse.length % dim == 0,
    s"coarse table length ${coarse.length} not a multiple of dim=$dim")
  val cells: Int = coarse.length / dim

  override def equals(other: Any): Boolean = other match {
    case o: CoarseRef => dim == o.dim && java.util.Arrays.equals(coarse, o.coarse)
    case _ => false
  }
  override def hashCode(): Int = 31 * dim + java.util.Arrays.hashCode(coarse)

  /** The residual `vec − coarse[cell]` at float precision — replicates
    * `transform(vec, (x, i) => x.cast(double) − element_at(coarseLit,
    * cell·dim + i + 1)).cast(array<float>)` element-for-element: null
    * elements stay null, each defined element is
    * `(x.toDouble − c).toFloat`. Null on a null vector. Elements past
    * the coarse table (wrong-length vector / out-of-range cell) become
    * null — unreachable from the assignment path, where `cell` is always
    * a valid argmax cell and vectors are length-checked upstream.
    */
  def residual(vec: ArrayData, isFloat: Boolean, cell: Int): ArrayData = {
    if (vec == null) return null
    val n = vec.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val idx = cell.toLong * dim + i
      if (vec.isNullAt(i) || cell < 0 || idx >= coarse.length) out(i) = null
      else {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        out(i) = (x - coarse(idx.toInt)).toFloat
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_pq_residual(vec, cell, coarse, dim)` → array<float>: the
  * float-precision residual against the coarse cell's centroid — the
  * residual-TRAINING projection ([[CoarseRef.residual]]), replacing the
  * interpreted `transform`/`element_at` chain that dominated q128's
  * training-sample materialization (guide §4: no interpreted HOFs on the
  * hot path).
  *
  * Pinned edge-case divergence (unreachable from every call site): a
  * NULL `cell` null-propagates through BinaryExpression to a NULL ARRAY,
  * whereas the replaced `transform(vec, x -> x - coarse[cell·dim + i])`
  * composition yields an array of NULL ELEMENTS (the lambda's
  * `element_at(lit, null)` nulls per element). Unreachable because the
  * only producer of `cell` is `graft_ivf_cell` ([[IvfCell]]), which is
  * non-nullable by contract — kept as the cheaper propagation rather
  * than manufacturing an all-null-element array nothing can observe.
  */
case class PqResidualVec(left: Expression, right: Expression, ref: CoarseRef)
    extends BinaryExpression {

  override def prettyName: String = "graft_pq_residual"
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (IvfKernels.vectorOk(left.dataType) && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pq_residual requires (array<float>/array<double>, int), got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  private def flt: Boolean = IvfKernels.isFloat(left)

  override def nullSafeEval(a: Any, b: Any): Any =
    ref.residual(a.asInstanceOf[ArrayData], flt, b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("coarseRef", ref, classOf[CoarseRef].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |${ev.value} = $r.residual($a, $flt, $b);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualVec =
    copy(left = newLeft, right = newRight)
}

/** Constant per-dimension affine-quantization bounds for the SQ8 kernel. */
final class SqRef(val mn: Array[Double], val mx: Array[Double])
    extends Serializable {
  require(mn.length == mx.length && mn.nonEmpty,
    s"mn/mx length mismatch: ${mn.length} vs ${mx.length}")
  val dim: Int = mn.length

  override def equals(other: Any): Boolean = other match {
    case o: SqRef => java.util.Arrays.equals(mn, o.mn) &&
      java.util.Arrays.equals(mx, o.mx)
    case _ => false
  }
  override def hashCode(): Int =
    31 * java.util.Arrays.hashCode(mn) + java.util.Arrays.hashCode(mx)

  /** The int8 affine code array at float type — replicates
    * [[graft.ops.Quantize.codes]]' transform element-for-element:
    * per element `i`, `hi > lo` gates the 3-op affine map
    * `floor((x − lo)·255/(hi − lo) + 0.5)` (double, fixed association,
    * floor-to-long exactly like Spark's FLOOR: `Math.floor` then
    * `.toLong`, so NaN → 0) clamped to [0, 255], else 0. A NULL element
    * becomes 255 when `hi > lo` (Spark's `least`/`greatest` SKIP nulls:
    * `greatest(0, least(255, null)) = 255` — differentially pinned) and
    * 0 otherwise; elements past the stats arrays become 0 (the non-ANSI
    * `when(null, …).otherwise(0)` reading — unreachable in practice:
    * stats are computed over the same corpus). Null on a null vector.
    */
  def codes(vec: ArrayData, isFloat: Boolean): ArrayData = {
    if (vec == null) return null
    val n = vec.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val v: Long =
        if (i >= dim) 0L
        else if (mx(i) > mn(i)) {
          if (vec.isNullAt(i)) 255L // least/greatest skip the null floor
          else {
            val lo = mn(i)
            val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
            val f = Math.floor((x - lo) * 255.0 / (mx(i) - lo) + 0.5).toLong
            Math.max(0L, Math.min(255L, f))
          }
        } else 0L
      out(i) = v.toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_sq8(vec, mn, mx)` → array<float>: the per-dimension affine int8
  * code column ([[SqRef.codes]]) — replaces the interpreted
  * `transform`/`element_at` chain of the SQ8 quantization path (q116/
  * q117/q122/q127) with one codegen'd kernel and two plan-constant
  * arrays.
  */
case class Sq8Codes(child: Expression, ref: SqRef) extends UnaryExpression {

  override def prettyName: String = "graft_sq8"
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (IvfKernels.vectorOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sq8 requires array<float>/array<double>, got ${child.dataType.catalogString}")

  private def flt: Boolean = IvfKernels.isFloat(child)

  override def nullSafeEval(input: Any): Any =
    ref.codes(input.asInstanceOf[ArrayData], flt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("sqRef", ref, classOf[SqRef].getName)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $r.codes($c, $flt);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8Codes =
    copy(child = newChild)
}
