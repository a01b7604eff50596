package graft.ingest.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reader-side evaluation of pushed v1 [[Filter]]s — the `$match` half of
  * the document source's pushdown (SURVEY.md §2 T2; reference behavior:
  * `$match: {dateCreated: {$gt: …}}` runs server-side,
  * `/root/reference/dags/includes/loanapplication_table.py:27-31`).
  *
  * A filter is ACCEPTED (fully evaluated here, nothing residual) only when
  * every referenced column resolves — through any depth of structs — to a
  * field of a supported atomic type and every literal converts to that
  * type's internal form; everything else stays a Spark-side residual.
  * Nested references arrive as DOTTED attribute names (Spark's v1
  * translation under nested-predicate pushdown, `a.b.c`); the reference's
  * own documents are nested (`user_table.py:31-34`
  * `personalInformation.firstName`) and a `$match` on a dotted path is
  * idiomatic MQL, so nested paths are first-class here, not residual.
  * None of this engine's document schemas contain literal dots or
  * backticks in field names, so a plain dot split IS the path (an
  * attribute carrying a backtick is left residual rather than guessed
  * at). Accepted predicates run per parsed row BEFORE the row ships —
  * rows failing the predicate never leave the scan, exactly like
  * documents `$match` drops server-side.
  *
  * SQL three-valued logic: each comparison with a NULL operand is UNKNOWN
  * (`None`) — and a null ANYWHERE along a nested path makes the leaf
  * NULL, exactly as Catalyst's `GetStructField` null-propagates —
  * `And`/`Or` follow Kleene semantics, and a row is kept only on a
  * definite `true`, matching what the equivalent post-scan `FilterExec`
  * would do.
  */
object FilterEval {

  /** Can this filter be fully evaluated against the given schema? */
  def supported(f: Filter, schema: StructType): Boolean = f match {
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
    case Not(c) => supported(c, schema)
    case AlwaysTrue() | AlwaysFalse() => true
    case EqualTo(a, v) => comparable(a, v, schema)
    case EqualNullSafe(a, v) =>
      // `a <=> null` is IsNull — resolvable column suffices; otherwise
      // the literal must convert like EqualTo's
      if (v == null) resolve(a, schema).isDefined
      else comparable(a, v, schema)
    case GreaterThan(a, v) => comparable(a, v, schema)
    case GreaterThanOrEqual(a, v) => comparable(a, v, schema)
    case LessThan(a, v) => comparable(a, v, schema)
    case LessThanOrEqual(a, v) => comparable(a, v, schema)
    case In(a, vs) => vs.nonEmpty && vs.forall(v => comparable(a, v, schema))
    case IsNull(a) => resolve(a, schema).isDefined
    case IsNotNull(a) => resolve(a, schema).isDefined
    case StringStartsWith(a, _) => stringCol(a, schema)
    case StringEndsWith(a, _) => stringCol(a, schema)
    case StringContains(a, _) => stringCol(a, schema)
    case _ => false
  }

  /** Definite-true filter pass over an internal row laid out as `schema`.
    * Call only with filters [[supported]] against this schema.
    *
    * Per-call convenience form of [[compile]] — a READER must compile
    * once instead (this form re-resolves indices and re-converts literals
    * per row, exactly the invariant work pushdown exists to avoid).
    */
  def keep(filters: Array[Filter], schema: StructType, row: InternalRow): Boolean = {
    var i = 0
    while (i < filters.length) {
      if (!eval(filters(i), schema, row).contains(true)) return false
      i += 1
    }
    true
  }

  /** Three-valued predicate result: 1 = true, 0 = false, -1 = unknown. */
  private type Pred = InternalRow => Byte

  /** Compile [[supported]] filters ONCE per reader into a closure tree:
    * field indices resolved, every literal converted to its internal
    * form, string patterns materialized as [[UTF8String]] — the per-row
    * hot path then does zero conversion and zero allocation (three-valued
    * logic runs on bytes, not Options). Value-identical to [[keep]]
    * (FilterEvalSpec pins it on the full predicate matrix).
    */
  def compile(filters: Array[Filter], schema: StructType): InternalRow => Boolean = {
    val preds: Array[Pred] = filters.map(compileOne(_, schema))
    row => {
      var ok = true
      var i = 0
      while (ok && i < preds.length) {
        if (preds(i)(row) != 1) ok = false
        i += 1
      }
      ok
    }
  }

  private def compileOne(f: Filter, schema: StructType): Pred = f match {
    case And(l, r) =>
      val cl = compileOne(l, schema); val cr = compileOne(r, schema)
      row => {
        val a = cl(row)
        if (a == 0) 0
        else { val b = cr(row); if (b == 0) 0 else if (a == 1 && b == 1) 1 else -1 }
      }
    case Or(l, r) =>
      val cl = compileOne(l, schema); val cr = compileOne(r, schema)
      row => {
        val a = cl(row)
        if (a == 1) 1
        else { val b = cr(row); if (b == 1) 1 else if (a == 0 && b == 0) 0 else -1 }
      }
    case Not(c) =>
      // Kleene negation: UNKNOWN stays UNKNOWN
      val cc = compileOne(c, schema)
      row => { val t = cc(row); if (t == -1) -1 else (1 - t).toByte }
    case AlwaysTrue() => _ => 1
    case AlwaysFalse() => _ => 0
    case IsNull(a) =>
      val g = getter(a, schema)
      row => if (g(row) == null) 1 else 0
    case IsNotNull(a) =>
      val g = getter(a, schema)
      row => if (g(row) == null) 0 else 1
    case EqualNullSafe(a, v) =>
      // never UNKNOWN: null <=> null is TRUE, null <=> value is FALSE
      val g = getter(a, schema)
      if (v == null) { row => if (g(row) == null) 1 else 0 }
      else {
        val dt = resolve(a, schema).get.leaf.dataType
        val y = toInternal(v, dt).get
        row => {
          val x = g(row)
          if (x == null) 0
          else if (compareInternal(dt, x, y) == 0) 1 else 0
        }
      }
    case EqualTo(a, v) => cmpPred(a, v, schema)(_ == 0)
    case GreaterThan(a, v) => cmpPred(a, v, schema)(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpPred(a, v, schema)(_ >= 0)
    case LessThan(a, v) => cmpPred(a, v, schema)(_ < 0)
    case LessThanOrEqual(a, v) => cmpPred(a, v, schema)(_ <= 0)
    case In(a, vs) =>
      val g = getter(a, schema)
      val dt = resolve(a, schema).get.leaf.dataType
      val internals = vs.map(v => toInternal(v, dt).get)
      row => {
        val x = g(row)
        if (x == null) -1
        else if (internals.exists(y => compareInternal(dt, x, y) == 0)) 1 else 0
      }
    case StringStartsWith(a, pre) =>
      strPred(a, schema, UTF8String.fromString(pre))(_.startsWith(_))
    case StringEndsWith(a, suf) =>
      strPred(a, schema, UTF8String.fromString(suf))(_.endsWith(_))
    case StringContains(a, sub) =>
      strPred(a, schema, UTF8String.fromString(sub))(_.contains(_))
    case other =>
      throw new IllegalStateException(s"unsupported pushed filter $other")
  }

  private def cmpPred(attr: String, value: Any, schema: StructType)(
      test: Int => Boolean): Pred = {
    val g = getter(attr, schema)
    val dt = resolve(attr, schema).get.leaf.dataType
    val y = toInternal(value, dt).get
    row => {
      val x = g(row)
      if (x == null) -1
      else if (test(compareInternal(dt, x, y))) 1 else 0
    }
  }

  private def strPred(attr: String, schema: StructType, pat: UTF8String)(
      test: (UTF8String, UTF8String) => Boolean): Pred = {
    val g = getter(attr, schema)
    row => {
      val x = g(row)
      if (x == null) -1
      else if (test(x.asInstanceOf[UTF8String], pat)) 1 else 0
    }
  }

  private def eval(f: Filter, schema: StructType, row: InternalRow): Option[Boolean] = f match {
    case And(l, r) => (eval(l, schema, row), eval(r, schema, row)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(l, r) => (eval(l, schema, row), eval(r, schema, row)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case Not(c) => eval(c, schema, row).map(!_)
    case AlwaysTrue() => Some(true)
    case AlwaysFalse() => Some(false)
    case IsNull(a) => Some(get(a, schema, row) == null)
    case IsNotNull(a) => Some(get(a, schema, row) != null)
    case EqualNullSafe(a, v) =>
      val x = get(a, schema, row)
      if (v == null) Some(x == null)
      else if (x == null) Some(false)
      else {
        val dt = dtype(a, schema)
        Some(compareInternal(dt, x, toInternal(v, dt).get) == 0)
      }
    case EqualTo(a, v) => cmp(a, v, schema, row).map(_ == 0)
    case GreaterThan(a, v) => cmp(a, v, schema, row).map(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(a, v, schema, row).map(_ >= 0)
    case LessThan(a, v) => cmp(a, v, schema, row).map(_ < 0)
    case LessThanOrEqual(a, v) => cmp(a, v, schema, row).map(_ <= 0)
    case In(a, vs) =>
      val x = get(a, schema, row)
      if (x == null) None
      else {
        val dt = dtype(a, schema)
        Some(vs.exists(v => compareInternal(dt, x, toInternal(v, dt).get) == 0))
      }
    case StringStartsWith(a, pre) =>
      str(a, schema, row).map(_.startsWith(UTF8String.fromString(pre)))
    case StringEndsWith(a, suf) =>
      str(a, schema, row).map(_.endsWith(UTF8String.fromString(suf)))
    case StringContains(a, sub) =>
      str(a, schema, row).map(_.contains(UTF8String.fromString(sub)))
    case other =>
      throw new IllegalStateException(s"unsupported pushed filter $other")
  }

  /** One resolved attribute path: the compiled per-step accessors and
    * the leaf field (name = the last segment's field name, type = the
    * type the full path lands on). Dotted segments are struct steps —
    * Spark's v1 rendering of a nested reference under nested-predicate
    * pushdown; a segment may additionally carry FIXED ORDINAL array
    * steps (`items[0].qty` — the engine's rendering of array-element
    * access, produced by [[ArrayMatchPushdown]], never by Spark's own
    * translation). Each ordinal step has `GetArrayItem(failOnError =
    * false)` semantics: null array, out-of-bounds index, or null element
    * all yield null, which the surrounding three-valued logic treats as
    * UNKNOWN exactly like a null struct level.
    */
  private[v2] final case class FieldPath(ops: Array[Any => Any],
      leaf: StructField)

  /** Split one path segment into its field name and trailing fixed
    * ordinals: `items[0][2]` → ("items", [0, 2]). None when malformed
    * (empty name, unclosed/empty/non-numeric bracket, or trailing
    * garbage). A name-only segment has no brackets by construction —
    * this engine's document schemas never contain '[' in field names
    * (like dots and backticks, such a name stays residual).
    */
  private[v2] def parseSegment(seg: String): Option[(String, Array[Int])] = {
    val b = seg.indexOf('[')
    if (b < 0) return Some((seg, Array.empty))
    if (b == 0) return None
    val name = seg.substring(0, b)
    var rest = seg.substring(b)
    val ords = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (rest.nonEmpty) {
      if (rest.charAt(0) != '[') return None
      val e = rest.indexOf(']')
      if (e <= 1) return None
      val digits = rest.substring(1, e)
      if (digits.length > 9 || !digits.forall(_.isDigit)) return None
      ords += digits.toInt
      rest = rest.substring(e + 1)
    }
    Some((name, ords.toArray))
  }

  /** Resolve a v1 attribute against `schema`, walking structs along the
    * dot path and array element types along ordinal steps; None when any
    * segment is missing or malformed, a struct step lands on a
    * non-struct, an ordinal step lands on a non-array, or the name
    * carries a backtick (a quoted segment — this engine's schemas never
    * need one, so it stays residual rather than risking a mis-split).
    */
  private[v2] def resolve(attr: String, schema: StructType): Option[FieldPath] = {
    if (attr.contains("`")) return None
    val parts = attr.split("\\.", -1)
    if (parts.exists(_.isEmpty)) return None
    val ops = scala.collection.mutable.ArrayBuffer.empty[Any => Any]
    var dt: DataType = schema
    var leafName: String = null
    var i = 0
    while (i < parts.length) {
      val (name, ords) = parseSegment(parts(i)) match {
        case Some(p) => p
        case None => return None
      }
      leafName = name
      val st = dt match {
        case s: StructType => s
        case _ => return None
      }
      val j = st.fieldNames.indexOf(name)
      if (j < 0) return None
      var cur: DataType = st.fields(j).dataType
      ops += fieldOp(j, cur)
      var o = 0
      while (o < ords.length) {
        cur match {
          case ArrayType(et, _) =>
            ops += elementOp(ords(o), et)
            cur = et
          case _ => return None
        }
        o += 1
      }
      dt = cur
      i += 1
    }
    Some(FieldPath(ops.toArray, StructField(leafName, dt, nullable = true)))
  }

  /** Fetch field `idx` of the current struct, null-propagating. */
  private def fieldOp(idx: Int, dt: DataType): Any => Any = { c =>
    val r = c.asInstanceOf[InternalRow]
    if (r.isNullAt(idx)) null else r.get(idx, dt)
  }

  /** Fixed array element: `GetArrayItem(failOnError = false)` semantics —
    * null on out-of-bounds or a null element (negative ordinals can't
    * parse, so only the upper bound needs checking).
    */
  private def elementOp(ord: Int, et: DataType): Any => Any = { c =>
    val a = c.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (ord >= a.numElements() || a.isNullAt(ord)) null else a.get(ord, et)
  }

  /** Public-to-the-readers form of [[getter]]: the aggregate reader and
    * the top-N heap ordering compile their (possibly dotted) pushed
    * column references through the same machinery as the filters.
    */
  private[v2] def compiledGetter(attr: String,
      schema: StructType): InternalRow => Any = getter(attr, schema)

  /** Compiled leaf accessor: runs the resolved step chain, null as soon
    * as any step yields null (Catalyst `GetStructField`/`GetArrayItem`
    * null-propagation). The per-row path does zero allocation and zero
    * name lookup — indices, widths, and element types are all baked into
    * the compiled ops.
    */
  private def getter(attr: String, schema: StructType): InternalRow => Any = {
    val ops = resolve(attr, schema).get.ops
    if (ops.length == 1) { val op = ops(0); row => op(row) }
    else { row =>
      var cur: Any = row
      var i = 0
      while (cur != null && i < ops.length) { cur = ops(i)(cur); i += 1 }
      cur
    }
  }

  private def dtype(attr: String, schema: StructType): DataType =
    resolve(attr, schema).get.leaf.dataType

  private def comparable(attr: String, value: Any, schema: StructType): Boolean =
    resolve(attr, schema).exists(p =>
      value != null && toInternal(value, p.leaf.dataType).isDefined)

  private def stringCol(attr: String, schema: StructType): Boolean =
    resolve(attr, schema).exists(_.leaf.dataType == StringType)

  private def get(attr: String, schema: StructType, row: InternalRow): Any =
    getter(attr, schema)(row)

  private def str(attr: String, schema: StructType, row: InternalRow): Option[UTF8String] =
    Option(get(attr, schema, row).asInstanceOf[UTF8String])

  private def cmp(attr: String, value: Any, schema: StructType,
      row: InternalRow): Option[Int] = {
    val x = get(attr, schema, row)
    if (x == null) None
    else {
      val dt = dtype(attr, schema)
      Some(compareInternal(dt, x, toInternal(value, dt).get))
    }
  }

  /** External filter literal → Catalyst internal value, or None if the
    * (type, literal) pair is outside the supported matrix. Timestamp
    * literals arrive as `java.sql.Timestamp` or `java.time.Instant`
    * depending on `spark.sql.datetime.java8API.enabled`; dates likewise.
    */
  private[v2] def toInternal(value: Any, dt: DataType): Option[Any] = (dt, value) match {
    case (StringType, s: String) => Some(UTF8String.fromString(s))
    case (BooleanType, b: java.lang.Boolean) => Some(b.booleanValue())
    case (IntegerType, n: Number) if n.longValue() == n.intValue().toLong =>
      Some(n.intValue())
    case (LongType, n: Number) if !isFractional(n) => Some(n.longValue())
    case (FloatType, n: Number) => Some(n.floatValue())
    case (DoubleType, n: Number) => Some(n.doubleValue())
    case (d: DecimalType, n: java.math.BigDecimal) =>
      val dec = Decimal(n)
      if (dec.changePrecision(d.precision, d.scale)) Some(dec) else None
    case (d: DecimalType, n: BigDecimal) => toInternal(n.bigDecimal, d)
    case (TimestampType, t: java.sql.Timestamp) =>
      Some(Math.addExact(Math.multiplyExact(t.getTime / 1000L, 1000000L),
        t.getNanos / 1000L))
    case (TimestampType, i: java.time.Instant) =>
      Some(Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L))
    case (DateType, d: java.sql.Date) => Some(d.toLocalDate.toEpochDay.toInt)
    case (DateType, d: java.time.LocalDate) => Some(d.toEpochDay.toInt)
    case _ => None
  }

  private def isFractional(n: Number): Boolean = n match {
    case _: java.lang.Double | _: java.lang.Float => true
    case b: java.math.BigDecimal => b.scale > 0
    case _ => false
  }

  private[graft] def compareInternal(dt: DataType, x: Any, y: Any): Int = dt match {
    case StringType => x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String])
    case BooleanType => java.lang.Boolean.compare(
      x.asInstanceOf[Boolean], y.asInstanceOf[Boolean])
    case IntegerType | DateType => Integer.compare(
      x.asInstanceOf[Int], y.asInstanceOf[Int])
    case LongType | TimestampType => java.lang.Long.compare(
      x.asInstanceOf[Long], y.asInstanceOf[Long])
    // `+ 0.0f` normalizes -0.0 to 0.0 (NaN unaffected): Spark SQL treats
    // the two zeros as EQUAL (NormalizeFloatingNumbers) while
    // Float.compare orders them — without this a pushed `col = 0.0`
    // would drop -0.0 rows the unpushed plan keeps. NaN = NaN stays
    // true and NaN sorts greatest, both matching Spark's NaN semantics.
    case FloatType => java.lang.Float.compare(
      x.asInstanceOf[Float] + 0.0f, y.asInstanceOf[Float] + 0.0f)
    case DoubleType => java.lang.Double.compare(
      x.asInstanceOf[Double] + 0.0d, y.asInstanceOf[Double] + 0.0d)
    case _: DecimalType => x.asInstanceOf[Decimal].compare(y.asInstanceOf[Decimal])
    case other => throw new IllegalStateException(s"uncomparable type $other")
  }
}
