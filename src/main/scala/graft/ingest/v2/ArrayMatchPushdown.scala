package graft.ingest.v2

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
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

/** Pushes array-head PROJECTION into the document scan: when every use
  * of a top-level array column above the scan is a FIXED ordinal access
  * (`items[0].qty` — reference T8's array-head extraction,
  * `trades_table.py:17-21`) or a null check, the scan may stop
  * MATERIALIZING the array after its highest referenced ordinal — the
  * parser token-skips the tail, and the rows crossing the scan boundary
  * carry 1 element instead of 50. Nested schema pruning already narrows
  * each ELEMENT to the referenced subfields; this rule prunes the
  * ELEMENT COUNT, the other axis of an array-heavy document's width.
  *
  * Soundness: the rule inspects the node that DEFINES everything
  * downstream (the Project/Aggregate directly over the relation, plus
  * an intervening Filter's condition) — if the column appears anywhere
  * outside a `GetArrayItem(col, lit, failOnError=false)` step or a bare
  * `IsNull`/`IsNotNull` (whose value truncation never changes: presence
  * vs JSON null is decided before any element parses), NO truncation
  * applies. Pre-pushed bracket filters ([[ArrayMatchPushdown]]) raise
  * the bound to cover their own ordinals. Element validation past the
  * bound is skipped — the same documented permissive-mode property
  * column pruning already has (a pruned field's malformedness is
  * invisible either way).
  */
class ArrayHeadProjection extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, r: DataSourceV2Relation)
        if r.table.isInstanceOf[ExtJsonTable] =>
      rewrite(projList, None, r).map(nr => p.copy(child = nr)).getOrElse(p)
    case p @ Project(projList,
        f @ Filter(cond, r: DataSourceV2Relation))
        if r.table.isInstanceOf[ExtJsonTable] =>
      rewrite(projList, Some(cond), r)
        .map(nr => p.copy(child = f.copy(child = nr))).getOrElse(p)
    case a @ Aggregate(ge, ae, r: DataSourceV2Relation, _)
        if r.table.isInstanceOf[ExtJsonTable] =>
      rewrite(ge ++ ae, None, r).map(nr => a.copy(child = nr)).getOrElse(a)
    case a @ Aggregate(ge, ae,
        f @ Filter(cond, r: DataSourceV2Relation), _)
        if r.table.isInstanceOf[ExtJsonTable] =>
      rewrite(ge ++ ae, Some(cond), r)
        .map(nr => a.copy(child = f.copy(child = nr))).getOrElse(a)
  }

  /** The relation with truncation registered for every qualifying array
    * column, or None when nothing CHANGES (fixed-point discipline: a
    * re-run computing the same bounds must be a no-op).
    */
  private def rewrite(exprs: Seq[Expression], cond: Option[Expression],
      r: DataSourceV2Relation): Option[DataSourceV2Relation] = {
    val table = r.table.asInstanceOf[ExtJsonTable]
    val uses = exprs ++ cond.toSeq
    var t = table
    var changed = false
    r.output.foreach { attr =>
      attr.dataType match {
        case _: ArrayType if !attr.name.contains(".") &&
            !attr.name.contains("`") && !attr.name.contains("[") =>
          boundOf(attr, uses).foreach { planBound =>
            // planBound == -1 means "safe because UNUSED in the plan" —
            // truncate then only if a pre-pushed bracket filter still
            // needs head elements (the filter-only projection case);
            // a fully-unused column is pruned by Spark anyway
            val pre = preFilterBound(table, attr.name)
            val k = math.max(planBound, pre)
            // register only when the bound GROWS: withArrayTrunc keeps
            // max(k, existing), so a later pass computing a SMALLER k
            // would otherwise rebuild a content-identical table every
            // iteration and the fixed-point batch would never converge
            if (k >= 0 && (planBound >= 0 || pre > 0 ||
                table.preFilters.exists(_.references.exists(
                  _.split("\\.", -1).head == attr.name))) &&
              k > t.arrayTrunc.getOrElse(attr.name, -1)) {
              t = t.withArrayTrunc(attr.name, k)
              changed = true
            }
          }
        case _ =>
      }
    }
    if (changed) Some(r.copy(table = t)) else None
  }

  /** Some(k >= 0) when every use of `attr` across `exprs` is a fixed
    * ordinal (< k) or a null check (k = 0 suffices: presence vs JSON
    * null is decided before any element parses); Some(-1) when the
    * column is UNUSED (vacuously safe); None on any other use.
    */
  private def boundOf(attr: Attribute, exprs: Seq[Expression]): Option[Int] = {
    def walk(e: Expression): Option[Int] = e match {
      case GetArrayItem(a: Attribute, Literal(i: Int, IntegerType), false)
          if a.exprId == attr.exprId && i >= 0 => Some(i + 1)
      case ElementAt(a: Attribute, Literal(i: Int, IntegerType), None, false)
          if a.exprId == attr.exprId && i >= 1 => Some(i)
      case IsNull(a: Attribute) if a.exprId == attr.exprId => Some(0)
      case IsNotNull(a: Attribute) if a.exprId == attr.exprId => Some(0)
      case a: Attribute if a.exprId == attr.exprId => None // bare use
      case other => other.children.foldLeft(Option(-1)) { (acc, c) =>
        for (x <- acc; y <- walk(c)) yield math.max(x, y)
      }
    }
    exprs.foldLeft(Option(-1)) { (acc, e) =>
      for (x <- acc; y <- walk(e)) yield math.max(x, y)
    }
  }

  /** Ordinals the table's pre-pushed bracket filters hit on `field`:
    * their FIRST array step must stay materialized too. A bracketless
    * reference (IsNull) needs nothing.
    */
  private def preFilterBound(table: ExtJsonTable, field: String): Int =
    table.preFilters.flatMap(_.references).foldLeft(0) { (k, ref) =>
      val head = ref.split("\\.", -1).head
      FilterEval.parseSegment(head) match {
        case Some((n, ords)) if n == field && ords.nonEmpty =>
          math.max(k, ords(0) + 1)
        case _ => k
      }
    }
}
