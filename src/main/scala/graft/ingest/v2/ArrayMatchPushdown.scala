package graft.ingest.v2

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructType}
import org.apache.spark.sql.{sources => v1}
import org.apache.spark.unsafe.types.UTF8String

/** Pushes `$match` predicates on FIXED ARRAY ELEMENTS (`items[0].qty >
  * 45`) into the document scan — the reference's array-head access shape
  * (T8: `dags/includes/trades_table.py:17-21`,
  * `invoices_table.py:83-96` — every trades/invoices/agribusiness
  * document keys business fields off the head of an embedded array).
  *
  * Spark's own filter translation cannot hand these to `pushFilters`:
  * `PushableColumnAndNestedColumn` extracts `GetStructField` chains only,
  * so a predicate touching `GetArrayItem` stays a post-scan `FilterExec`
  * and the scan parses + ships every document. This rule is the
  * `Rule[LogicalPlan]` rung of the extension ladder (SURVEY §7.3,
  * registered by [[graft.functions.GraftExtensions]]): it runs in the
  * operator-optimization batch — BEFORE `V2ScanRelationPushDown` — and
  * rewrites `Filter(cond, extjsonRelation)` by
  *
  *  1. splitting `cond` into conjuncts,
  *  2. translating every conjunct whose leaves are comparisons between a
  *     struct/array-element path and a literal into a v1 [[v1.Filter]]
  *     whose attribute carries the ordinal steps in bracket syntax
  *     (`items[0].qty` — [[FilterEval.parseSegment]]'s grammar),
  *  3. TAKING a translated conjunct (removing it from the Filter node)
  *     only when it references at least one array ordinal (plain
  *     struct/attr conjuncts stay for the vanilla pushdown path, which
  *     already consumes them and keeps Catalyst's stats intact) AND
  *     [[FilterEval.supported]] accepts it against the declared schema —
  *     the same evaluation matrix every pushed filter runs under,
  *  4. baking the taken filters into the relation's table
  *     ([[ExtJsonTable.withPreFilters]]), whose every scan then applies
  *     them per parsed row exactly as if `pushFilters` had accepted them.
  *
  * Semantics are preserved by construction: a Catalyst `Filter` keeps a
  * row only on definite TRUE, and [[FilterEval]]'s three-valued
  * evaluation keeps exactly the same rows — ordinal steps null-propagate
  * like `GetArrayItem(failOnError = false)`, which is the ONLY array
  * access form translated (the `get()` function / `try_element_at`
  * shape; an ANSI error-throwing `GetArrayItem`/`ElementAt` is refused —
  * a scan-side eval would mask the error the unpushed plan raises).
  * Literal-only comparisons, `IsNull`/`IsNotNull`, `In`/`InSet` without
  * nulls, string prefix/suffix/contains, and any `And`/`Or`/`Not`
  * composition translate; anything else (casts, functions, subqueries,
  * non-literal operands) leaves its conjunct in the plan untouched.
  *
  * Scale shape: this turns "parse every array element of every document,
  * ship the row, filter above" into "drop the document inside the reader
  * the moment its head element fails the predicate" — with the parse
  * schema pruned to exactly the referenced element subfields
  * ([[SchemaMerge]]), the dominant cost of an array-heavy `$match` drops
  * from corpus-wide row shipping to token traversal.
  */
class ArrayMatchPushdown extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: DataSourceV2Relation)
        if r.table.isInstanceOf[ExtJsonTable] =>
      val table = r.table.asInstanceOf[ExtJsonTable]
      val schema = table.schema()
      val translated = splitConjunctivePredicates(cond)
        .map(c => c -> accept(c, schema))
      val taken = translated.collect { case (_, Some(t)) => t }
      if (taken.isEmpty) f
      else {
        val kept = translated.collect { case (c, None) => c }
        val rel = r.copy(table = table.withPreFilters(taken))
        kept.reduceOption(And).map(Filter(_, rel)).getOrElse(rel)
      }
  }

  /** Translate-and-gate one conjunct: taken only when it translates
    * completely, references an array ordinal somewhere, and the scan's
    * own evaluation matrix accepts it.
    */
  private def accept(e: Expression, schema: StructType): Option[v1.Filter] =
    toV1(e).filter(t => t.references.exists(_.contains("[")) &&
      FilterEval.supported(t, schema))

  private def toV1(e: Expression): Option[v1.Filter] = e match {
    case And(l, r) => for { a <- toV1(l); b <- toV1(r) } yield v1.And(a, b)
    case Or(l, r) => for { a <- toV1(l); b <- toV1(r) } yield v1.Or(a, b)
    case Not(c) => toV1(c).map(v1.Not)
    case EqualTo(PathRef(p), LitVal(v)) => Some(v1.EqualTo(p, v))
    case EqualTo(LitVal(v), PathRef(p)) => Some(v1.EqualTo(p, v))
    case GreaterThan(PathRef(p), LitVal(v)) => Some(v1.GreaterThan(p, v))
    case GreaterThan(LitVal(v), PathRef(p)) => Some(v1.LessThan(p, v))
    case GreaterThanOrEqual(PathRef(p), LitVal(v)) =>
      Some(v1.GreaterThanOrEqual(p, v))
    case GreaterThanOrEqual(LitVal(v), PathRef(p)) =>
      Some(v1.LessThanOrEqual(p, v))
    case LessThan(PathRef(p), LitVal(v)) => Some(v1.LessThan(p, v))
    case LessThan(LitVal(v), PathRef(p)) => Some(v1.GreaterThan(p, v))
    case LessThanOrEqual(PathRef(p), LitVal(v)) =>
      Some(v1.LessThanOrEqual(p, v))
    case LessThanOrEqual(LitVal(v), PathRef(p)) =>
      Some(v1.GreaterThanOrEqual(p, v))
    case EqualNullSafe(PathRef(p), Literal(null, _)) =>
      Some(v1.EqualNullSafe(p, null))
    case EqualNullSafe(Literal(null, _), PathRef(p)) =>
      Some(v1.EqualNullSafe(p, null))
    case EqualNullSafe(PathRef(p), LitVal(v)) => Some(v1.EqualNullSafe(p, v))
    case EqualNullSafe(LitVal(v), PathRef(p)) => Some(v1.EqualNullSafe(p, v))
    case In(PathRef(p), vs) if vs.forall(_.isInstanceOf[Literal]) =>
      // a null in the list would need UNKNOWN-vs-false distinction under
      // Not(); FilterEval.supported already refuses null values, so the
      // gate keeps such a conjunct in the plan
      Some(v1.In(p, vs.map { case LitVal(v) => v; case _ => null }.toArray))
    case InSet(pr @ PathRef(p), hset) =>
      if (hset.contains(null)) None
      else Some(v1.In(p, hset.map(
        CatalystTypeConverters.convertToScala(_, pr.dataType)).toArray))
    case IsNull(PathRef(p)) => Some(v1.IsNull(p))
    case IsNotNull(PathRef(p)) => Some(v1.IsNotNull(p))
    case StartsWith(PathRef(p), Literal(s: UTF8String, StringType)) =>
      Some(v1.StringStartsWith(p, s.toString))
    case EndsWith(PathRef(p), Literal(s: UTF8String, StringType)) =>
      Some(v1.StringEndsWith(p, s.toString))
    case Contains(PathRef(p), Literal(s: UTF8String, StringType)) =>
      Some(v1.StringContains(p, s.toString))
    case _ => None
  }

  /** A pushable path: an attribute, a struct-field chain, or a FIXED
    * non-negative array-element step in `GetArrayItem(failOnError =
    * false)` form (what `get()` replaces to, plan-wide, before this
    * batch) or 1-based `element_at(..., failOnError = false)` form.
    * Rendered in the bracket grammar [[FilterEval.resolve]] walks.
    * Segments carrying '.', '`', or '[' are refused — their rendering
    * would be ambiguous, and none of this engine's schemas need them.
    */
  private object PathRef {
    def unapply(e: Expression): Option[String] = e match {
      case a: Attribute if ok(a.name) => Some(a.name)
      case g: GetStructField =>
        val n = g.childSchema(g.ordinal).name
        if (ok(n)) unapply(g.child).map(p => s"$p.$n") else None
      case GetArrayItem(child, Literal(i: Int, IntegerType), false)
          if i >= 0 =>
        unapply(child).map(p => s"$p[$i]")
      case ElementAt(child, Literal(i: Int, IntegerType), None, false)
          if i >= 1 && child.dataType.isInstanceOf[ArrayType] =>
        unapply(child).map(p => s"$p[${i - 1}]")
      case _ => None
    }
    private def ok(n: String): Boolean =
      !n.contains(".") && !n.contains("`") && !n.contains("[")
  }

  /** A non-null literal in its EXTERNAL form — what a v1 [[v1.Filter]]
    * carries and [[FilterEval.toInternal]] converts back.
    */
  private object LitVal {
    def unapply(e: Expression): Option[Any] = e match {
      case l @ Literal(v, _) if v != null =>
        Some(CatalystTypeConverters.convertToScala(v, l.dataType))
      case _ => None
    }
  }
}
