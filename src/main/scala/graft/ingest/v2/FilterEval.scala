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
  * every referenced column is a top-level field of a supported atomic type
  * and every literal converts to that type's internal form; everything
  * else stays a Spark-side residual. Accepted predicates run per parsed
  * row BEFORE the row ships — rows failing the predicate never leave the
  * scan, exactly like documents `$match` drops server-side.
  *
  * SQL three-valued logic: each comparison with a NULL operand is UNKNOWN
  * (`None`), `And`/`Or` follow Kleene semantics, and a row is kept only on
  * a definite `true` — matching what the equivalent post-scan `FilterExec`
  * would do.
  */
object FilterEval {

  /** Can this filter be fully evaluated against the given schema? */
  def supported(f: Filter, schema: StructType): Boolean = f match {
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
    case EqualTo(a, v) => comparable(a, v, schema)
    case GreaterThan(a, v) => comparable(a, v, schema)
    case GreaterThanOrEqual(a, v) => comparable(a, v, schema)
    case LessThan(a, v) => comparable(a, v, schema)
    case LessThanOrEqual(a, v) => comparable(a, v, schema)
    case In(a, vs) => vs.nonEmpty && vs.forall(v => comparable(a, v, schema))
    case IsNull(a) => topLevel(a, schema).isDefined
    case IsNotNull(a) => topLevel(a, schema).isDefined
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
    case IsNull(a) =>
      val idx = schema.fieldIndex(a)
      row => if (row.isNullAt(idx)) 1 else 0
    case IsNotNull(a) =>
      val idx = schema.fieldIndex(a)
      row => if (row.isNullAt(idx)) 0 else 1
    case EqualTo(a, v) => cmpPred(a, v, schema)(_ == 0)
    case GreaterThan(a, v) => cmpPred(a, v, schema)(_ > 0)
    case GreaterThanOrEqual(a, v) => cmpPred(a, v, schema)(_ >= 0)
    case LessThan(a, v) => cmpPred(a, v, schema)(_ < 0)
    case LessThanOrEqual(a, v) => cmpPred(a, v, schema)(_ <= 0)
    case In(a, vs) =>
      val idx = schema.fieldIndex(a)
      val dt = schema.fields(idx).dataType
      val internals = vs.map(v => toInternal(v, dt).get)
      row =>
        if (row.isNullAt(idx)) -1
        else {
          val x = row.get(idx, dt)
          if (internals.exists(y => compareInternal(dt, x, y) == 0)) 1 else 0
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
    val idx = schema.fieldIndex(attr)
    val dt = schema.fields(idx).dataType
    val y = toInternal(value, dt).get
    row =>
      if (row.isNullAt(idx)) -1
      else if (test(compareInternal(dt, row.get(idx, dt), y))) 1 else 0
  }

  private def strPred(attr: String, schema: StructType, pat: UTF8String)(
      test: (UTF8String, UTF8String) => Boolean): Pred = {
    val idx = schema.fieldIndex(attr)
    row =>
      if (row.isNullAt(idx)) -1
      else if (test(row.getUTF8String(idx), pat)) 1 else 0
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
    case IsNull(a) => Some(get(a, schema, row) == null)
    case IsNotNull(a) => Some(get(a, schema, row) != null)
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

  /** v1 attribute → top-level field; dotted names are nested references
    * (none of this engine's spec schemas contain literal dots) and stay
    * residual.
    */
  private def topLevel(attr: String, schema: StructType): Option[StructField] =
    if (attr.contains(".")) None
    else schema.fields.find(_.name == attr)

  private def dtype(attr: String, schema: StructType): DataType =
    topLevel(attr, schema).get.dataType

  private def comparable(attr: String, value: Any, schema: StructType): Boolean =
    topLevel(attr, schema).exists(f =>
      value != null && toInternal(value, f.dataType).isDefined)

  private def stringCol(attr: String, schema: StructType): Boolean =
    topLevel(attr, schema).exists(_.dataType == StringType)

  private def get(attr: String, schema: StructType, row: InternalRow): Any = {
    val idx = schema.fieldIndex(attr)
    if (row.isNullAt(idx)) null else row.get(idx, schema.fields(idx).dataType)
  }

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

  private def compareInternal(dt: DataType, x: Any, y: Any): Int = dt match {
    case StringType => x.asInstanceOf[UTF8String].compareTo(y.asInstanceOf[UTF8String])
    case BooleanType => java.lang.Boolean.compare(
      x.asInstanceOf[Boolean], y.asInstanceOf[Boolean])
    case IntegerType | DateType => Integer.compare(
      x.asInstanceOf[Int], y.asInstanceOf[Int])
    case LongType | TimestampType => java.lang.Long.compare(
      x.asInstanceOf[Long], y.asInstanceOf[Long])
    case FloatType => java.lang.Float.compare(
      x.asInstanceOf[Float], y.asInstanceOf[Float])
    case DoubleType => java.lang.Double.compare(
      x.asInstanceOf[Double], y.asInstanceOf[Double])
    case _: DecimalType => x.asInstanceOf[Decimal].compare(y.asInstanceOf[Decimal])
    case other => throw new IllegalStateException(s"uncomparable type $other")
  }
}
