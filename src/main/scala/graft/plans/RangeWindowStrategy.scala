package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, BindReferences, CurrentRow, Descending, Expression, GenericInternalRow, JoinedRow, Literal, NamedExpression, NullsFirst, RangeFrame, Rank, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{ExternalAppendOnlyUnsafeRowArray, SortExec, SparkPlan, SparkStrategy, UnaryExecNode, WholeStageCodegenExec}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.v2.{ExtJsonScan, FilterEval, ZoneMaps}

/** EXCHANGE-FREE global running window over a range-landed drop — the
  * single-partition-collapse rung: `SUM(x) OVER (ORDER BY key)`,
  * `row_number() / rank() OVER (ORDER BY key)` with NO `PARTITION BY` is
  * the canonical "does not scale" shape — Spark's WindowExec requires
  * `AllTuples`, so the ordinary plan funnels the ENTIRE input through one
  * partition (worse than a shuffle: a 100 TB corpus simply cannot run
  * it). Over the [[graft.sink.CorpusSink.landJsonlRangeIndexed]] layout
  * it decomposes exactly: bands are strictly disjoint and internally
  * sorted on the key, so a running aggregate is a per-band LOCAL running
  * aggregate plus a constant per-band PREFIX (the totals of all earlier
  * bands). [[BandRunningWindowExec]] runs the local half over
  * [[OrderedBandScanExec]]'s partitions — full band parallelism, zero
  * exchange — and gets the prefixes either
  *
  *  - from the SIDECAR (`prefix=metadata` in the plan string): when the
  *    scan provably delivers every indexed row (no pushed/runtime
  *    filters, no limit/top-N/agg modes) and every needed total is
  *    derivable (row counts always; exact sums for integer/decimal
  *    columns; min/max for any indexed column), the prefix costs ZERO
  *    reads — the window is planned entirely from metadata; or
  *  - from ONE narrow partials pass (`prefix=computed`): per-partition
  *    totals collected to the driver (a few values per band — the
  *    zipWithIndex shape), then the data streams once more for output.
  *    Two sequential scans beat any exchange at 100 TB, and the pass
  *    runs BELOW the per-band sort when one exists (totals are
  *    order-free).
  *
  * Supported functions — the family whose value at a row depends only
  * on a bounded neighborhood of it in window order:
  *
  *  - `row_number()`, `rank()` (ties never straddle bands: the first
  *    key strictly differs across groups, so local rank + prefix row
  *    count is the GLOBAL rank), `dense_rank` (per-band distinct-key
  *    counts — disjointness makes them additive), and the size-based
  *    family `percent_rank` / `cume_dist` / `ntile` (dividing by the
  *    global N the exec folds from the per-band totals);
  *  - non-distinct `count` / `sum` / `min` / `max` / `avg` over the
  *    default cumulative frame (`RANGE UNBOUNDED PRECEDING..CURRENT
  *    ROW` — tie groups share the value), the explicit cumulative
  *    `ROWS` form, the SUFFIX frame `CURRENT ROW AND UNBOUNDED
  *    FOLLOWING` for count, exact-invertible sums (grand − prefix;
  *    ANSI long and double sums refuse — subtraction can't reproduce a
  *    refold's overflow/ulp behavior; metadata answers the totals with
  *    zero passes), avg over integral children (exact-sum inversion ÷
  *    count), min/max (partition-buffered backward fold), and
  *    `last_value` (the global last — a constant through the grand
  *    fold; IGNORE NULLS refuses), the bounded sliding `ROWS BETWEEN n PRECEDING AND
  *    CURRENT ROW`, the bounded FOLLOWING `ROWS BETWEEN n
  *    PRECEDING|CURRENT ROW AND m FOLLOWING` (the centered moving
  *    average — emission delays behind an m-slot ring; the cross-band
  *    suffix is the next bands' first m values, the global end just
  *    clips) (n, m ≤ 65,536 — the prefix is the earlier bands' last
  *    n values), and the VALUE-based `RANGE BETWEEN d PRECEDING AND
  *    [CURRENT ROW | d2 PRECEDING]` over an integral key, a DATE key
  *    with whole-day `INTERVAL 'd' DAY` or calendar `INTERVAL 'm'
  *    MONTH`/YEAR boundaries (month distance is monotone in the key —
  *    the bound is `add_months(current, -m)` with Spark's month-end
  *    clamping), a TIMESTAMP key with calendar MONTH/YEAR boundaries
  *    (session-timezone wall-clock month adds —
  *    `timestampAddMonths(current, -m, tz)`, Spark's own
  *    TimestampAddYMInterval arithmetic with its forward-only
  *    frame-head semantics on clamp-plateau inversions; single-bound
  *    frames only, NTZ keys pin UTC — see MonthTsDist), or a
  *    TIMESTAMP key with any day-time interval (the
  *    7-day-mean, 3-month-rolling-mean, 15-minute-event-window, and
  *    lagged dual-bound shapes; the buffer holds the frame's live
  *    (key, value) pairs, evicted by key distance, population-bounded
  *    at plan time from the sidecar and capped at runtime —
  *    `spark.graft.window.maxRangeFrameRows` — where no plan bound
  *    applies; frames denser than the cap refuse to Spark's spillable
  *    window), and the ±FOLLOWING value frame `RANGE BETWEEN d1
  *    PRECEDING|CURRENT ROW AND f FOLLOWING` (fixed kinds, or MONTH
  *    bounds over DATE keys — `add_months(rk, +m)` is non-strictly
  *    monotone over dates, so each pending row's precomputed release
  *    bound is a valid per-arrival release test; month-forward over
  *    TIMESTAMP keys refuses — the ts clamp plateau inverts with
  *    time-of-day, see MonthTsDist. Rows release from a key-ordered
  *    pending queue once an arrival passes their frame-end bound,
  *    with the next bands' leading entries as the forward suffix; a
  *    node mixing this key-released queue with the row-count delay
  *    ring refuses whole);
  *  - the ORDER-SENSITIVE carries, whose computed-totals pass runs over
  *    the SORTED stream: `last(x, ignoreNulls)` (forward-fill / as-of),
  *    `first_value(x[, ignoreNulls])` and `nth_value(x, n[,
  *    ignoreNulls])` (earliest-band-wins firsts), `max_by` / `min_by`
  *    (the argmax carry, stream-first-wins on ordering ties),
  *    `lag(x, n[, default])` (n ≤ 65,536 — n = 1 as a single-value
  *    carry, deeper on the ring), `lag(x, n[, default]) IGNORE NULLS`
  *    (the previous-known-value deque), `lead(x, n[, default])`
  *    (n = 1 by one-row lookahead with a cross-band SUFFIX, deeper by
  *    delaying emission behind an n-slot ring), and `lead(x, n[,
  *    default]) IGNORE NULLS` (no bounded ring form exists — a null
  *    run defers the lookahead unboundedly — so the exec buffers the
  *    partition, rows spillable + values cap-guarded, and answers by
  *    index into the non-null list; the same population Spark's own
  *    UnboundedFollowing frame buffers) — constant defaults only.
  *
  * Distinct or filtered aggregates, UNBOUNDED FOLLOWING frames, RANGE
  * frames past the current row, expression (non-literal) offsets or
  * defaults, and huge bounds fall through to Spark's ordinary window. EXACT — no opt-in conf; any
  * unprovable layout falls through like the ordered scan does. A
  * `PARTITION BY` window never matches the decomposition (Spark's own
  * hash-partitioned WindowExec already scales that shape — the second
  * rule below re-stages it over the band scan instead).
  */
class RangeWindowStrategy(session: SparkSession) extends SparkStrategy {
  import OrderedScanStrategy.restage
  import RunningWindow._

  /** The merge-join matcher, for composing a running window over a
    * provable join chain (its exec claims RangePartitioning + ordering
    * on the band key — exactly the child contract the band window
    * needs).
    */
  private lazy val mergeJoin = new RangeMergeJoinStrategy(session)

  /** The interval-sweep matcher, same composition: its exec claims
    * ordering + RangePartitioning on the POINT key, so a running
    * window over the labeled stream decomposes over its partitions.
    */
  private lazy val intervalJoin = new RangeIntervalJoinStrategy(session)

  /** The window strategy's peel admits ALIASING Projects too (the
    * analyzer extracts complex window inputs — `sum(cast(v)) OVER …` —
    * into an aliased child Project): a deterministic row-local Project
    * preserves row order, row count, and the band partitioning claim
    * alike. The sort-order key itself still has to reach the SCAN
    * unaliased (the band-key exprId check against `rel.output`), so an
    * ORDER BY over a computed expression refuses as before.
    */
  private def peelW(p: LogicalPlan, above: List[LogicalPlan])
      : Option[(org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation, List[LogicalPlan])] =
    p match {
      case rel: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        Some((rel, above))
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          if pr.projectList.forall(_.deterministic) =>
        peelW(pr.child, pr :: above)
      case f: Filter if f.condition.deterministic =>
        peelW(f.child, f :: above)
      case _ => None
    }

  /** The peel with an inner WINDOW leaf — STACKED windows: a window
    * whose inputs are another window's OUTPUTS analyzes as two Window
    * nodes with a Project between (the sessionization idiom: flag the
    * gaps with lag, then session-id = running SUM of the flags). A
    * [[BandRunningWindowExec]] preserves its child's ordering and
    * range-partitioning claims, so an outer window ordered the same
    * way decomposes over the INNER band window's partitions exactly as
    * over the scan's bands.
    */
  private def peelInnerW(p: LogicalPlan, above: List[LogicalPlan])
      : Option[(Window, List[LogicalPlan])] =
    p match {
      case w: Window => Some((w, above))
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          if pr.projectList.forall(_.deterministic) =>
        peelInnerW(pr.child, pr :: above)
      case f: Filter if f.condition.deterministic =>
        peelInnerW(f.child, f :: above)
      case _ => None
    }

  /** The same peel with a JOIN leaf — the window-over-merge-chain
    * composition (`SUM(...) OVER (ORDER BY key)` above q185's
    * enrich+decontaminate chain): deterministic row-local Projects and
    * Filters preserve the chain exec's ordering and partitioning claims
    * exactly as they preserve the scan's.
    */
  private def peelJ(p: LogicalPlan, above: List[LogicalPlan])
      : Option[(org.apache.spark.sql.catalyst.plans.logical.Join, List[LogicalPlan])] =
    p match {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        Some((j, above))
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          if pr.projectList.forall(_.deterministic) =>
        peelJ(pr.child, pr :: above)
      case f: Filter if f.condition.deterministic =>
        peelJ(f.child, f :: above)
      case _ => None
    }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case w @ Window(windowExprs, Seq(), orderSpec, child, _)
        if orderSpec.nonEmpty && windowExprs.nonEmpty =>
      orderSpec.head match {
        case first @ SortOrder(attr: AttributeReference,
            Ascending | Descending, _, _) =>
          peelW(child, Nil) match {
            case Some((rel, above)) => rel.scan match {
              case scan: ExtJsonScan
                  if rel.output.exists(_.exprId == attr.exprId) &&
                    orderSpec.forall(_.references.subsetOf(child.outputSet)) =>
                val funcs = windowExprs.map(parse(_, child.outputSet, orderSpec))
                if (funcs.exists(_.isEmpty)) return Nil
                if (!RunningWindow.delayCompatible(funcs.map(_.get)))
                  return Nil
                // value-frame population bound: a RANGE frame denser
                // than the configured cap must run on Spark's spillable
                // WindowExec, not an in-memory deque
                if (!rangeFramesBounded(scan, attr.name, funcs.map(_.get)))
                  return Nil
                scan.orderedBandPartitions(attr.name) match {
                  case Some(bands) if bands.nonEmpty =>
                    val desc = first.direction == Descending
                    val ordered = OrderedBandScanExec(rel.output, orderSpec,
                      scan, if (desc) bands.reverse else bands,
                      claimOrdering = !desc && orderSpec.length == 1 &&
                        first.nullOrdering == NullsFirst)
                    val chain = restage(above, ordered)
                    val sortedChild =
                      if (ordered.claimOrdering) chain
                      else SortExec(orderSpec, global = false, chain)
                    // the metadata prefix is sound only when nothing
                    // between the scan and the window drops rows: the scan
                    // itself proves its side (orderedBandFileStats refuses
                    // under any pushed filter/limit/agg mode), and a
                    // peeled residual Filter above it must refuse too
                    val metadata =
                      if (above.exists(_.isInstanceOf[Filter])) None
                      else metadataTotals(scan, rel.output, attr.name,
                        funcs.map(_.get), desc)
                    BandRunningWindowExec(windowExprs, funcs.map(_.get),
                      orderSpec, metadata, sortedChild) :: Nil
                  case _ => Nil
                }
              case _ => Nil
            }
            // no scan leaf: a running window OVER A MERGE-JOIN CHAIN —
            // the chain exec already claims RangePartitioning + ordering
            // on the band key, so the window decomposes over ITS
            // partitions exactly as over the scan's bands (prefixes
            // always computed: join output sizes have no sidecar form —
            // the totals pass streams the chain once more, still zero
            // exchange). ASC NULLS FIRST on the chain's own key only:
            // the chain streams ASC and its partitions come in ASC band
            // order, which a DESC window cannot reuse.
            case None => peelJ(child, Nil) match {
              case Some((join, above))
                  if first.direction == Ascending &&
                    first.nullOrdering == NullsFirst &&
                    orderSpec.forall(_.references.subsetOf(child.outputSet)) =>
                val funcs = windowExprs.map(parse(_, child.outputSet, orderSpec))
                if (funcs.exists(_.isEmpty)) return Nil
                if (!RunningWindow.delayCompatible(funcs.map(_.get)))
                  return Nil
                mergeJoin.planChain(join)
                  .orElse(intervalJoin.planJoin(join)) match {
                  case Some(exec)
                      if exec.outputOrdering.headOption.exists(_.child match {
                        case a: AttributeReference => a.exprId == attr.exprId
                        case _ => false
                      }) =>
                    val chain = restage(above, exec)
                    val sortedChild =
                      if (orderSpec.length == 1) chain
                      else SortExec(orderSpec, global = false, chain)
                    BandRunningWindowExec(windowExprs, funcs.map(_.get),
                      orderSpec, None, sortedChild) :: Nil
                  case _ => Nil
                }
              // no join either: STACKED windows — a window over another
              // window's OUTPUTS (the sessionization idiom: lag-flag the
              // gaps, then session-id = running SUM of the flags; the
              // analyzer stacks the nodes because the outer's inputs
              // are the inner's outputs). Plan the inner window with
              // THIS strategy recursively; a band-window result claims
              // its child's ordering and range partitioning, so the
              // outer decomposes over ITS partitions (prefixes always
              // computed — the inner window re-executes for the totals
              // pass; sequential zero-exchange streams, never a
              // collapse). ASC NULLS FIRST on the same band key only.
              case _ => peelInnerW(child, Nil) match {
                case Some((w2, above))
                    if first.direction == Ascending &&
                      first.nullOrdering == NullsFirst &&
                      orderSpec.forall(_.references.subsetOf(child.outputSet)) =>
                  val funcs = windowExprs.map(parse(_, child.outputSet, orderSpec))
                  if (funcs.exists(_.isEmpty)) return Nil
                  if (!RunningWindow.delayCompatible(funcs.map(_.get)))
                    return Nil
                  apply(w2) match {
                    case Seq(inner: BandRunningWindowExec)
                        if inner.outputOrdering.headOption.exists(o =>
                          o.direction == Ascending && (o.child match {
                            case a: AttributeReference =>
                              a.exprId == attr.exprId
                            case _ => false
                          })) =>
                      val chain = restage(above, inner)
                      val sortedChild =
                        if (orderSpec.length == 1) chain
                        else SortExec(orderSpec, global = false, chain)
                      BandRunningWindowExec(windowExprs, funcs.map(_.get),
                        orderSpec, None, sortedChild) :: Nil
                    case _ => Nil
                  }
                case _ => Nil
              }
            }
          }
        case _ => Nil
      }
    // PARTITION BY containing the band key: Spark's OWN WindowExec runs
    // over the band scan with zero exchange — the layout's
    // RangePartitioning claim satisfies its ClusteredDistribution (equal
    // keys never straddle bands), and EnsureRequirements adds only the
    // LOCAL per-band sort its ordering requirement asks for. FULL window
    // generality (any function, any frame, lead, ntile, sliding windows)
    // because the evaluation is Spark's, not ours — the decomposition
    // trick is only needed when there is no partitioning to cluster by.
    case org.apache.spark.sql.catalyst.planning.PhysicalWindow(
        org.apache.spark.sql.catalyst.expressions.WindowFunctionType.SQL,
        windowExprs, partSpec, orderSpec, child)
        if partSpec.nonEmpty =>
      // the SQL gate mirrors Spark's own Window strategy: a Python /
      // pandas window function must route to WindowInPandasExec, which
      // only the builtin strategy plans — fall through for those.
      // FLOAT/DOUBLE partition keys arrive wrapped in
      // KnownFloatingPointNormalized(NormalizeNaNAndZero(...)) and fall
      // through too, CORRECTLY: the normalization clusters -0.0 with
      // 0.0, but the raw band layout may place them in different bands
      // (the sidecar's total order distinguishes them), so the layout
      // cannot honestly satisfy the normalized clustering.
      //
      // GROUP-TOP-N composes: `rank() OVER (PARTITION BY key …) <= k`
      // makes InferWindowGroupLimit insert a WindowGroupLimit directly
      // under the Window — strip it here and re-stage it as the
      // FINAL-mode exec over the band scan (its clustered distribution
      // is the same one the band claim satisfies; exact over clustered
      // input, and the rank Filter above re-checks regardless). The
      // best-k-documents-per-group curation shape, zero exchange.
      val (wgl, inner) = child match {
        case w: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
          (Some(w), w.child)
        case other => (None, other)
      }
      peelW(inner, Nil) match {
        case Some((rel, above)) =>
          rel.scan match {
            case scan: ExtJsonScan =>
              val keyed = partSpec.collectFirst {
                case a: AttributeReference
                    if rel.output.exists(_.exprId == a.exprId) &&
                      scan.orderedBandPartitions(a.name)
                        .exists(_.nonEmpty) =>
                  (a, scan.orderedBandPartitions(a.name).get)
              }
              keyed match {
                case Some((k, groups)) =>
                  val bands = OrderedBandScanExec(rel.output,
                    Seq(SortOrder(k, Ascending)), scan, groups,
                    claimOrdering = false)
                  val restaged = restage(above, bands)
                  val limited = wgl match {
                    case Some(w) =>
                      org.apache.spark.sql.execution.window
                        .WindowGroupLimitExec(w.partitionSpec,
                          w.orderSpec, w.rankLikeFunction, w.limit,
                          org.apache.spark.sql.execution.window.Final,
                          restaged)
                    case None => restaged
                  }
                  org.apache.spark.sql.execution.window.WindowExec(
                    windowExprs, partSpec, orderSpec, limited) :: Nil
                case None => Nil
              }
            case _ => Nil
          }
        case None => Nil
      }
    case _ => Nil
  }

  /** One window expression → its running-function spec, or None (the
    * whole strategy then refuses — partial acceleration would still plan
    * Spark's single-partition WindowExec for the rest, gaining nothing).
    */
  private def parse(ne: NamedExpression,
      childOut: org.apache.spark.sql.catalyst.expressions.AttributeSet,
      orderSpec: Seq[SortOrder]): Option[RunningFunc] = ne match {
    case Alias(we @ WindowExpression(fn, spec), _)
        if spec.partitionSpec.isEmpty &&
          fn.references.subsetOf(childOut) && fn.deterministic =>
      // Right(rows?) = cumulative (UNBOUNDED PRECEDING..CURRENT ROW;
      // true = ROWS, false = RANGE); Left(n) = the bounded sliding
      // frame ROWS BETWEEN n PRECEDING AND CURRENT ROW (the optimizer
      // folds `n PRECEDING` to a negative literal by planning time)
      val frame: Option[Either[Int, Boolean]] =
        spec.frameSpecification match {
          case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) =>
            Some(Right(true))
          case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) =>
            Some(Right(false))
          case SpecifiedWindowFrame(RowFrame, Literal(lo: Int, _), CurrentRow)
              // bounded: the accumulator pre-sizes a ring of n+1 slots
              // per partition and folds O(n) per row — a huge frame
              // must fall through to Spark's own window (which buffers
              // actual rows) rather than pre-allocate per-band arrays
              // or overflow n+1
              if lo < 0 && lo >= -65536 => Some(Left(-lo))
          case _ => None
        }
      // `RANGE BETWEEN x PRECEDING AND [CURRENT ROW | y PRECEDING]` —
      // the VALUE-based sliding frame (a 7-DAY mean over a day key, not
      // 7 rows; `13 PRECEDING AND 7 PRECEDING` is the LAGGED-window
      // twin): frame membership is a key-distance test, so the buffer
      // holds only the rows whose key is within x of the current one —
      // in the KEY's own units. Integral keys take integral boundaries;
      // DATE keys take whole-day `INTERVAL 'x' DAY` boundaries (dates
      // are day numbers internally, so the distance arithmetic is
      // identical; sub-day intervals never reach us — the analyzer
      // rejects them) or CALENDAR `INTERVAL 'm' MONTH` boundaries
      // (month distance is monotone in the key: the bound is
      // `add_months(current, -m)` with Spark's own month-end clamping,
      // so the same front-eviction applies — the 3-month rolling mean);
      // both bounds of a dual-bound frame must be the same kind (a
      // month lower against a day upper has no shared unit and refuses)
      val rangeSlide: Option[RunningWindow.RangeDist] = {
        import org.apache.spark.sql.types.{DateType, DayTimeIntervalType, YearMonthIntervalType}
        val keyDt = orderSpec.head.child.dataType
        // one boundary expression → (kind, distance ≥ 0): kind 0 =
        // fixed (linear key units), 1 = calendar months over a DATE
        // key, 2 = calendar months over a TIMESTAMP key (session-tz
        // wall-clock arithmetic), 3 = months over TIMESTAMP_NTZ
        // (zone-less local arithmetic). Wrap guards: Long.MinValue
        // negates to itself, and a distance of exactly Long.MaxValue
        // would tie the eviction's wrapped-distance clamp (dist caps at
        // MaxValue, which must stay > d) — frames that wide refuse
        def bound(e: Expression, allowZero: Boolean)
            : Option[(Int, Long)] = e match {
          case CurrentRow if allowZero => Some((0, 0L))
          case l: Literal if l.value != null =>
            (keyDt, l.dataType) match {
              case (kdt, bdt) if integralVal(kdt) && integralVal(bdt) &&
                  asLong(l.value) < 0 && asLong(l.value) > -Long.MaxValue =>
                Some((0, -asLong(l.value)))
              case (DateType, _: DayTimeIntervalType) =>
                val micros = l.value.asInstanceOf[java.lang.Long].longValue()
                val MicrosPerDay = 86400L * 1000000L
                if (micros < 0 && micros % MicrosPerDay == 0L)
                  Some((0, -(micros / MicrosPerDay)))
                else None
              case (DateType, _: YearMonthIntervalType) =>
                // year-month intervals are month counts internally
                // (years arrive ×12) — LocalDate calendar arithmetic
                // with Spark's month-end clamping
                val months = l.value.asInstanceOf[java.lang.Integer].intValue()
                if (months < 0 && months > Int.MinValue)
                  Some((1, -months.toLong))
                else None
              // month intervals over a TIMESTAMP key: the bound is
              // Spark's own TimestampAddYMInterval arithmetic —
              // session-timezone wall-clock month adds with month-end
              // clamping (DateTimeUtils.timestampAddMonths), still
              // monotone in the key, so the same front-eviction applies
              case (org.apache.spark.sql.types.TimestampType,
                  _: YearMonthIntervalType) =>
                val months = l.value.asInstanceOf[java.lang.Integer].intValue()
                if (months < 0 && months > Int.MinValue)
                  Some((2, -months.toLong))
                else None
              // TIMESTAMP_NTZ month adds are zone-less local-calendar
              // arithmetic — the same adds pinned at UTC
              case (org.apache.spark.sql.types.TimestampNTZType,
                  _: YearMonthIntervalType) =>
                val months = l.value.asInstanceOf[java.lang.Integer].intValue()
                if (months < 0 && months > Int.MinValue)
                  Some((3, -months.toLong))
                else None
              // TIMESTAMP keys are microsecond counts — ANY day-time
              // interval is already in the key's unit (the sliding
              // 15-minute event-time window, exact to the microsecond)
              case (org.apache.spark.sql.types.TimestampType |
                  org.apache.spark.sql.types.TimestampNTZType,
                  _: DayTimeIntervalType) =>
                val micros = l.value.asInstanceOf[java.lang.Long].longValue()
                if (micros < 0 && micros > -Long.MaxValue) Some((0, -micros))
                else None
              case _ => None
            }
          case _ => None
        }
        spec.frameSpecification match {
          case SpecifiedWindowFrame(RangeFrame, loE, hiE)
              if orderSpec.lengthCompare(1) == 0 =>
            (bound(loE, allowZero = false), bound(hiE, allowZero = true))
              match {
              case (Some((loM, lo)), Some((hiM, hi)))
                  // the CurrentRow upper (hi = 0) pairs with any kind;
                  // an explicit upper must match the lower's
                  if lo >= hi && (hi == 0L || loM == hiM) =>
                loM match {
                  case 0 => Some(RunningWindow.FixedDist(lo, hi))
                  case 1 => Some(RunningWindow.MonthDist(lo.toInt, hi.toInt))
                  // ts-months: SINGLE-bound frames only (upper =
                  // CURRENT ROW). A dual-bound upper inverts on the
                  // clamp plateau like the lower does, and matching
                  // Spark's forward-only upper pointer would need its
                  // running-max state carried across bands — refuse
                  // the lagged ts-month shape to Spark instead
                  case 2 if hi == 0L =>
                    Some(RunningWindow.MonthTsDist(lo.toInt, hi.toInt,
                      session.sessionState.conf.sessionLocalTimeZone))
                  case 3 if hi == 0L =>
                    Some(RunningWindow.MonthTsDist(lo.toInt, hi.toInt,
                      "UTC"))
                  case _ => None
                }
              case _ => None
            }
          case _ => None
        }
      }
      // `RANGE BETWEEN d1 PRECEDING|CURRENT ROW AND f FOLLOWING` — the
      // VALUE-based FOLLOWING frame (the ±window around each event):
      // rows release from a pending queue once a key strictly beyond
      // the frame end arrives. Kinds: FIXED (integral / whole-day /
      // any day-time over timestamps), or MONTHLY over a DATE key
      // (add_months bounds — non-strictly monotone over dates, so the
      // per-row release bound add_months(rk, +m) is a valid release
      // test; ASC only, and both explicit bounds must be months).
      // Month-forward over TIMESTAMP keys refuses (the ts clamp
      // plateau inverts with time-of-day — see MonthTsDist)
      val rangeFwd: Option[(Long, Long, Boolean)] =
        spec.frameSpecification match {
        case SpecifiedWindowFrame(RangeFrame, loE, hiE)
            if orderSpec.lengthCompare(1) == 0 =>
          import org.apache.spark.sql.types.{DateType, DayTimeIntervalType, YearMonthIntervalType}
          val keyDt = orderSpec.head.child.dataType
          val MicrosPerDay = 86400L * 1000000L
          // kind: 0 = fixed, 1 = months over a DATE key, -1 = the
          // CURRENT ROW bound (zero in either kind's units)
          def fixed(e: Expression, sign: Int, allowZero: Boolean)
              : Option[(Int, Long)] = e match {
            case CurrentRow if allowZero => Some((-1, 0L))
            case l: Literal if l.value != null =>
              (keyDt, l.dataType) match {
                case (kdt, bdt) if integralVal(kdt) && integralVal(bdt) &&
                    asLong(l.value) * sign > 0 &&
                    asLong(l.value) != Long.MinValue &&
                    math.abs(asLong(l.value)) < Long.MaxValue =>
                  Some((0, math.abs(asLong(l.value))))
                case (DateType, _: DayTimeIntervalType) =>
                  val micros = l.value.asInstanceOf[java.lang.Long].longValue()
                  if (micros * sign > 0 && micros % MicrosPerDay == 0L)
                    Some((0, math.abs(micros / MicrosPerDay)))
                  else None
                case (DateType, _: YearMonthIntervalType)
                    if orderSpec.head.direction == Ascending =>
                  val months = l.value.asInstanceOf[java.lang.Integer]
                    .intValue()
                  if (months * sign > 0 && months > Int.MinValue)
                    Some((1, math.abs(months.toLong)))
                  else None
                case (org.apache.spark.sql.types.TimestampType |
                    org.apache.spark.sql.types.TimestampNTZType,
                    _: DayTimeIntervalType) =>
                  val micros = l.value.asInstanceOf[java.lang.Long].longValue()
                  if (micros * sign > 0 && micros != Long.MinValue &&
                    math.abs(micros) < Long.MaxValue)
                    Some((0, math.abs(micros)))
                  else None
                case _ => None
              }
            case _ => None
          }
          (fixed(loE, -1, allowZero = true), fixed(hiE, 1, allowZero = false))
            match {
            case (Some((k1, d1)), Some((k2, f)))
                // CURRENT ROW (-1) pairs with either kind; explicit
                // bounds must agree. The combined fixed width must not
                // saturate the release and eviction arithmetic
                if (k1 == -1 || k1 == k2) && k2 != -1 &&
                  (k2 == 1 || d1 < Long.MaxValue - f) =>
              Some((d1, f, k2 == 1))
            case _ => None
          }
        case _ => None
      }
      // `ROWS BETWEEN n PRECEDING|CURRENT ROW AND m FOLLOWING` — the
      // bounded FOLLOWING frame (the centered moving average): emission
      // delays behind an m-slot ring (the row's frame completes when
      // row +m arrives), the per-band total carries the band's last n
      // values (next bands' preceding context) AND first m values
      // (earlier bands' forward suffix); same 65,536 guard as the other
      // bounded frames
      val rowsFwd: Option[(Int, Int)] = spec.frameSpecification match {
        case SpecifiedWindowFrame(RowFrame, lo, Literal(m: Int, _))
            if m > 0 && m <= 65536 =>
          lo match {
            case CurrentRow => Some((0, m))
            case Literal(l: Int, _) if l < 0 && l >= -65536 =>
              Some((-l, m))
            case _ => None
          }
        case _ => None
      }
      // `CURRENT ROW AND UNBOUNDED FOLLOWING` — the SUFFIX frame (the
      // "remaining total from here" shape): invertible aggregates
      // derive it as grand − prefix (see RunSuffixCount and kin)
      val suffixFrame: Option[Boolean] = spec.frameSpecification match {
        case SpecifiedWindowFrame(RowFrame, CurrentRow,
            org.apache.spark.sql.catalyst.expressions.UnboundedFollowing) =>
          Some(true)
        case SpecifiedWindowFrame(RangeFrame, CurrentRow,
            org.apache.spark.sql.catalyst.expressions.UnboundedFollowing) =>
          Some(false)
        case _ => None
      }
      (fn, frame) match {
        case (ae: AggregateExpression, None)
            if suffixFrame.isDefined && !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case c: Count if c.children.lengthCompare(1) == 0 =>
              Some(RunSuffixCount(c.children.head, suffixFrame.get))
            case s: Sum => s.dataType match {
              // ANSI long sums refuse: a per-row suffix refold can
              // overflow where grand − prefix does not; doubles refuse:
              // subtraction is not the refold's IEEE value
              case LongType if !session.sessionState.conf.ansiEnabled =>
                Some(RunSuffixSumLong(s.child, suffixFrame.get))
              case d: DecimalType => Some(RunSuffixSumDecimal(s.child, d,
                suffixFrame.get, session.sessionState.conf.ansiEnabled))
              case _ => None
            }
            // min/max aren't invertible: the partition-buffered
            // backward fold (see RunSuffixMinMax)
            case m: Min if orderable(m.dataType) =>
              Some(RunSuffixMinMax(m.child, m.dataType, isMin = true,
                suffixFrame.get,
                RangeWindowStrategy.maxRangeFrameRows(session)))
            case m: Max if orderable(m.dataType) =>
              Some(RunSuffixMinMax(m.child, m.dataType, isMin = false,
                suffixFrame.get,
                RangeWindowStrategy.maxRangeFrameRows(session)))
            // avg over an integral child: sum/count inversion composed
            // (exact integer sum ÷ count); double children refuse per
            // the family doc's IEEE posture
            case a: org.apache.spark.sql.catalyst.expressions.aggregate.Average
                if a.dataType == DoubleType && integralVal(a.child.dataType) =>
              Some(RunSuffixAvgLong(a.child, suffixFrame.get))
            // last_value over the suffix frame = the GLOBAL last value —
            // a constant through the grand fold; the IGNORE NULLS form
            // is not constant (all-null tails) and refuses
            case l: org.apache.spark.sql.catalyst.expressions.aggregate.Last
                if !l.ignoreNulls && orderable(l.dataType) =>
              Some(RunSuffixLast(l.child))
            case _ => None
          }
        case (_: RowNumber, Some(Right(true))) => Some(RunRowNumber())
        case (_: Rank, Some(Right(true))) => Some(RunRank())
        // the size-based rank family divides by the GLOBAL row count,
        // which the exec folds from the per-band totals (free from the
        // sidecar on the metadata path); their frames are the
        // analyzer's rank-like/size-based shapes, not cumulative ones
        case (_: org.apache.spark.sql.catalyst.expressions.DenseRank, _) =>
          Some(RunDenseRank(orderSpec))
        case (_: org.apache.spark.sql.catalyst.expressions.PercentRank, _) =>
          Some(RunPercentRank())
        case (_: org.apache.spark.sql.catalyst.expressions.CumeDist, _) =>
          Some(RunCumeDist())
        case (nt: org.apache.spark.sql.catalyst.expressions.NTile, _) =>
          nt.buckets match {
            case Literal(b: Int, _) if b > 0 => Some(RunNTile(b))
            case _ => None
          }
        // lag(x, n[, default]): the n-rows-back value in window order —
        // its frame is the offset row, not a cumulative one, so it
        // bypasses the frame gate. n = 1 keeps the single-value carry;
        // bounded deeper offsets ride the sliding ring (prefix = the
        // earlier bands' last n values); huge offsets fall through like
        // huge sliding frames do. A CONSTANT default (the analyzer
        // coerces it to the input type) only replaces the
        // fell-off-the-start null — Literal values are immutable
        // internal representations, safe to retain and ship
        case (lg: org.apache.spark.sql.catalyst.expressions.Lag, _)
            if !lg.ignoreNulls && orderable(lg.input.dataType) =>
          constDefault(lg.default, lg.input.dataType).flatMap { d =>
            lg.inputOffset match {
              case Literal(1, _) => Some(RunLag(lg.input, d))
              case Literal(k: Int, _) if k > 1 && k <= 65536 =>
                Some(RunSliding(lg.input, k,
                  RunningWindow.SlideOp.LagN(k, d)))
              case _ => None
            }
          }
        // lag(x, n) IGNORE NULLS: the n-th most recent NON-NULL value
        // among strictly preceding rows (the previous-known-value /
        // forward-fill-excluding-self shape) — a bounded deque of the
        // last n non-null values; the cross-band prefix is the earlier
        // bands' last n non-nulls (lead IGNORE NULLS takes the
        // partition-buffered path above instead — no bounded ring form)
        case (lg: org.apache.spark.sql.catalyst.expressions.Lag, _)
            if lg.ignoreNulls && orderable(lg.input.dataType) =>
          constDefault(lg.default, lg.input.dataType).flatMap { d =>
            lg.inputOffset match {
              case Literal(k: Int, _) if k >= 1 && k <= 65536 =>
                Some(RunLagNulls(lg.input, k, d))
              case _ => None
            }
          }
        // lead(x, n) IGNORE NULLS: the n-th NON-NULL value strictly
        // after the row — no bounded ring form (a null run defers the
        // lookahead unboundedly), so the exec buffers the partition and
        // indexes its non-null value list (see RunLeadNulls); the
        // runtime cap bounds the heap-held values where no plan-time
        // sidecar bound applied
        case (ld: org.apache.spark.sql.catalyst.expressions.Lead, _)
            if ld.ignoreNulls && orderable(ld.input.dataType) =>
          constDefault(ld.default, ld.input.dataType).flatMap { d =>
            ld.offset match {
              case Literal(k: Int, _) if k >= 1 && k <= 65536 =>
                Some(RunLeadNulls(ld.input, k, d,
                  RangeWindowStrategy.maxRangeFrameRows(session)))
              case _ => None
            }
          }
        // lead(x, n[, default]): the value n rows AHEAD — the function
        // family whose cross-band carry flows BACKWARD (the last rows of
        // band i read band i+1's first rows), so a band's total is its
        // FIRST n input values and the exec wires them as a SUFFIX.
        // n = 1 keeps the one-row lookahead; deeper offsets delay
        // emission behind an n-slot ring (the lag ring mirrored); the
        // constant default replaces only the fell-off-the-END nulls
        case (ld: org.apache.spark.sql.catalyst.expressions.Lead, _)
            if !ld.ignoreNulls && orderable(ld.input.dataType) =>
          constDefault(ld.default, ld.input.dataType).flatMap { d =>
            ld.offset match {
              case Literal(1, _) => Some(RunLead(ld.input, d))
              case Literal(k: Int, _) if k > 1 && k <= 65536 =>
                Some(RunLeadN(ld.input, k, d))
              case _ => None
            }
          }
        case (ae: AggregateExpression, Some(Right(rows)))
            if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case c: Count if c.children.lengthCompare(1) == 0 =>
              Some(RunCount(c.children.head, rows))
            case s: Sum => s.dataType match {
              // overflow posture follows the SESSION's ANSI setting, so an
              // accepted plan behaves exactly as WindowExec's Sum would:
              // ANSI throws, default mode wraps longs / nulls decimals
              case LongType => Some(RunSumLong(s.child, rows,
                session.sessionState.conf.ansiEnabled))
              case DoubleType => Some(RunSumDouble(s.child, rows))
              case d: DecimalType => Some(RunSumDecimal(s.child, d, rows,
                session.sessionState.conf.ansiEnabled))
              case _ => None
            }
            case a: org.apache.spark.sql.catalyst.expressions.aggregate.Average
                if a.dataType == DoubleType =>
              Some(RunAvgDouble(a.child, rows))
            case m: Min if orderable(m.dataType) =>
              Some(RunMinMax(m.child, m.dataType, isMin = true, rows))
            case m: Max if orderable(m.dataType) =>
              Some(RunMinMax(m.child, m.dataType, isMin = false, rows))
            case l: org.apache.spark.sql.catalyst.expressions.aggregate.Last
                if l.ignoreNulls && orderable(l.dataType) =>
              Some(RunLastNonNull(l.child, rows))
            // first_value(x[, ignoreNulls]): the stream's first
            // (non-null) value — a backward carry: once set it never
            // changes, and the earliest band's value wins the merge
            case f: org.apache.spark.sql.catalyst.expressions.aggregate.First
                if orderable(f.dataType) =>
              Some(RunFirstValue(f.child, f.ignoreNulls, rows))
            // max_by/min_by(v, o): the argmax carry — per-band best
            // (ordering, value) pair, stream-first-wins on ties exactly
            // like Spark's own strict-inequality update
            case mb: org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
                if orderable(mb.valueExpr.dataType) &&
                  orderable(mb.orderingExpr.dataType) =>
              Some(RunMinMaxBy(mb.valueExpr, mb.orderingExpr,
                mb.orderingExpr.dataType, isMax = true, rows))
            case mb: org.apache.spark.sql.catalyst.expressions.aggregate.MinBy
                if orderable(mb.valueExpr.dataType) &&
                  orderable(mb.orderingExpr.dataType) =>
              Some(RunMinMaxBy(mb.valueExpr, mb.orderingExpr,
                mb.orderingExpr.dataType, isMax = false, rows))
            case _ => None
          }
        // nth_value(x, n[, ignoreNulls]) over the cumulative frame: the
        // n-th (non-null) value from the stream's start — the
        // first_value carry generalized to a bounded FIRSTS window
        // (null until n qualifying rows have arrived, constant after)
        case (nv: org.apache.spark.sql.catalyst.expressions.NthValue,
            Some(Right(rows))) if orderable(nv.input.dataType) =>
          nv.offset match {
            case Literal(k: Int, _) if k >= 1 && k <= 65536 =>
              Some(RunNth(nv.input, k, nv.ignoreNulls, rows))
            case _ => None
          }
        // the bounded sliding frame: the per-band prefix is the LAST n
        // input values of the earlier bands (bounded, order-sensitive —
        // the lag(1) carry generalized), and each row's value folds its
        // ≤ n+1 buffered frame values in stream order — the same
        // re-evaluation Spark's own SlidingWindowFunctionFrame does,
        // so double folds are bit-identical
        case (ae: AggregateExpression, Some(Left(n)))
            if !ae.isDistinct && ae.filter.isEmpty =>
          slideOpFor(ae).map { case (in, op) => RunSliding(in, n, op) }
        // the VALUE-based sliding frame: same fold ops, but the buffer
        // retains (key, value) pairs and evicts by key distance — frame
        // size is data-dependent (dense keys hold more rows), bounded by
        // the frame's actual row population, the same rows Spark's own
        // WindowExec would buffer WHOLE. RANGE CURRENT ROW includes the
        // entire tie group, so the value is group-scoped (read at group
        // end) — tie groups share the frame, exactly SQL's semantics.
        // Requires the single integral order key the strategy already
        // proved is the band key (nulls impossible: the layout proof is
        // null-free)
        // the bounded FOLLOWING frame: same fold ops, evaluated through
        // the delay ring (see RunSlidingFwd)
        case (ae: AggregateExpression, None)
            if rowsFwd.isDefined && !ae.isDistinct && ae.filter.isEmpty =>
          slideOpFor(ae).map { case (in, op) =>
            RunSlidingFwd(in, rowsFwd.get._1, rowsFwd.get._2, op)
          }
        // the VALUE-based FOLLOWING frame: pending rows release by key
        // distance (see RunRangeFwd)
        case (ae: AggregateExpression, None)
            if rangeFwd.isDefined && rangeSlide.isEmpty &&
              !ae.isDistinct && ae.filter.isEmpty =>
          slideOpFor(ae).map { case (in, op) =>
            RunRangeFwd(orderSpec.head.child, in,
              rangeFwd.get._1, rangeFwd.get._2,
              orderSpec.head.direction == Descending, op,
              RangeWindowStrategy.maxRangeFrameRows(session),
              monthly = rangeFwd.get._3)
          }
        case (ae: AggregateExpression, None)
            if rangeSlide.isDefined && !ae.isDistinct &&
              ae.filter.isEmpty =>
          // the key-type/boundary-type pairing (integral↔integral,
          // date↔whole-day/month interval) was already settled by the
          // rangeSlide extraction, in key units. The runtime cap bounds
          // the live buffer where no plan-time sidecar bound applied
          // (chain windows, filtered scans): past it the frame is one
          // Spark's spillable WindowExec should run instead
          slideOpFor(ae).map { case (in, op) =>
            RunRangeSliding(orderSpec.head.child, in, rangeSlide.get,
              orderSpec.head.direction == Descending, op,
              RangeWindowStrategy.maxRangeFrameRows(session))
          }
        case _ => None
      }
    case _ => None
  }

  /** The sliding-frame aggregate set shared by the ROWS and RANGE
    * bounded forms: (input expression, fold op), or None for anything
    * outside the count/sum/avg/min/max family.
    */
  private def slideOpFor(ae: AggregateExpression)
      : Option[(Expression, RunningWindow.SlideOp)] = {
    import RunningWindow.SlideOp
    ae.aggregateFunction match {
      case c: Count if c.children.lengthCompare(1) == 0 =>
        Some((c.children.head, SlideOp.Count))
      case s: Sum => s.dataType match {
        case LongType => Some((s.child,
          SlideOp.SumLong(session.sessionState.conf.ansiEnabled)))
        case DoubleType => Some((s.child, SlideOp.SumDouble))
        case d: DecimalType => Some((s.child,
          SlideOp.SumDecimal(d, session.sessionState.conf.ansiEnabled)))
        case _ => None
      }
      case a: org.apache.spark.sql.catalyst.expressions.aggregate.Average
          if a.dataType == DoubleType =>
        Some((a.child, SlideOp.AvgDouble))
      case m: Min if orderable(m.dataType) =>
        Some((m.child, SlideOp.MinMax(m.dataType, isMin = true)))
      case m: Max if orderable(m.dataType) =>
        Some((m.child, SlideOp.MinMax(m.dataType, isMin = false)))
      case _ => None
    }
  }

  /** Types whose internal value the RANGE frame's key-distance
    * arithmetic can read as a long (dates excluded: their SQL frame
    * boundaries are intervals, not bare integers).
    */
  private def integralVal(dt: DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  private def asLong(v: Any): Long = v.asInstanceOf[Number].longValue()

  /** lag/lead default as a plan-time constant, or None (an expression
    * default — rare, but legal SQL — refuses the whole strategy). The
    * analyzer coerces a constant default to the input type, so a typed
    * literal either matches or the shape is one we must not guess at.
    */
  private def constDefault(e: Expression, dt: DataType): Option[Any] =
    e match {
      case Literal(null, _) => Some(null)
      case Literal(v, ldt) if ldt == dt => Some(v)
      case _ => None
    }

  /** Atomic orderable types whose values the accumulator can RETAIN
    * safely (UTF8String is cloned; the rest are immutable) — arrays,
    * maps, and structs would alias the transient row buffer.
    */
  private def orderable(dt: DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
          FloatType | DoubleType | StringType | DateType | TimestampType |
          TimestampNTZType => true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** Per-partition (= per final group, post-reverse for DESC) TOTALS for
    * every function, straight from the sidecar — None if any single
    * total is underivable (the exec then computes them all in one pass;
    * mixing sources would read the data anyway). A function input maps
    * to a sidecar column only when it is the SCAN'S OWN output attribute
    * (exprId check): a peeled Project alias that SHADOWS an indexed
    * column's name (`(k+1).as("v")`) must never borrow the real column's
    * stats — that would be a silently wrong prefix, the one forbidden
    * outcome.
    */
  private def metadataTotals(scan: ExtJsonScan, relOutput: Seq[Attribute],
      keyCol: String, funcs: Seq[RunningFunc],
      desc: Boolean): Option[Seq[Array[Any]]] = {
    def scanCol(e: Expression): Option[String] = e match {
      case a: AttributeReference
          if relOutput.exists(o => o.exprId == a.exprId) => Some(a.name)
      case _ => None
    }
    scan.orderedBandFileStats(keyCol).flatMap { groups0 =>
      val groups = if (desc) groups0.reverse else groups0
      val out = groups.map { files =>
        val rows = files.map(_.cols(keyCol).rows).sum
        val totals = funcs.map {
          case _: RunRowNumber | _: RunRank | _: RunPercentRank |
              _: RunCumeDist | _: RunNTile =>
            Some(java.lang.Long.valueOf(rows))
          case RunCount(input, _) => input match {
            case l: Literal =>
              Some(java.lang.Long.valueOf(if (l.value == null) 0L else rows))
            case _ => scanCol(input).flatMap(n =>
              colTotals(files, n).map(cs =>
                java.lang.Long.valueOf(cs.map(c => c.rows - c.nulls).sum)))
          }
          // the suffix family's totals are the same sidecar counts and
          // exact sums, shaped as the accs carry them
          case RunSuffixCount(input, _) => input match {
            case l: Literal =>
              Some(java.lang.Long.valueOf(if (l.value == null) 0L else rows))
            case _ => scanCol(input).flatMap(n =>
              colTotals(files, n).map(cs =>
                java.lang.Long.valueOf(cs.map(c => c.rows - c.nulls).sum)))
          }
          case RunSuffixSumLong(input, _) => scanCol(input) match {
            case Some(n) =>
              colTotals(files, n).flatMap { cs =>
                if (cs.exists(_.sum.isEmpty)) None
                else {
                  // wrap mode only (ANSI refused at parse): low 64 bits
                  // of the exact sum, plus the non-null count
                  val exact = cs.flatMap(_.sum)
                    .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
                  Some(Array[Any](
                    java.lang.Long.valueOf(exact.toBigInteger.longValue()),
                    java.lang.Long.valueOf(
                      cs.map(c => c.rows - c.nulls).sum)))
                }
              }
            case _ => None
          }
          case RunSuffixSumDecimal(input, _, _, _) => scanCol(input) match {
            case Some(n) =>
              colTotals(files, n).flatMap { cs =>
                if (cs.exists(_.sum.isEmpty)) None
                else Some(Array[Any](
                  cs.flatMap(_.sum)
                    .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)),
                  java.lang.Long.valueOf(
                    cs.map(c => c.rows - c.nulls).sum)))
              }
            case _ => None
          }
          // suffix avg's totals are the same (exact sum, count) pair
          case RunSuffixAvgLong(input, _) => scanCol(input) match {
            case Some(n) =>
              colTotals(files, n).flatMap { cs =>
                if (cs.exists(_.sum.isEmpty)) None
                else Some(Array[Any](
                  cs.flatMap(_.sum)
                    .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)),
                  java.lang.Long.valueOf(
                    cs.map(c => c.rows - c.nulls).sum)))
              }
            case _ => None
          }
          case _: RunSuffixLast => None // order-dependent: no sidecar form
          case RunSumLong(input, _, ansi) => scanCol(input) match {
            case Some(n) =>
              colTotals(files, n).flatMap { cs =>
                if (cs.exists(_.sum.isEmpty)) None
                else if (cs.forall(c => c.rows == c.nulls)) Some(null)
                else {
                  val exact = cs.flatMap(_.sum)
                    .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
                  if (ansi) {
                    // ANSI: an overflowing band total would have thrown
                    // in the data pass — refuse the metadata shortcut
                    // rather than silently differ (computed pass throws)
                    try Some(java.lang.Long.valueOf(exact.longValueExact()))
                    catch { case _: ArithmeticException => None }
                  } else
                    // default mode WRAPS: low 64 bits of the exact sum —
                    // identical to folding the band's values with
                    // wrap-around addition (associative mod 2^64)
                    Some(java.lang.Long.valueOf(
                      exact.toBigInteger.longValue()))
                }
              }
            case _ => None
          }
          case RunSumDecimal(input, _, _, _) => scanCol(input) match {
            case Some(n) =>
              colTotals(files, n).flatMap { cs =>
                if (cs.exists(_.sum.isEmpty)) None
                else if (cs.forall(c => c.rows == c.nulls)) Some(null)
                else Some(cs.flatMap(_.sum)
                  .foldLeft(java.math.BigDecimal.ZERO)(_.add(_)))
              }
            case _ => None
          }
          case _: RunSumDouble => None // doubles carry no exact sidecar sum
          case _: RunAvgDouble => None // its double sum prefix likewise
          case _: RunLastNonNull => None // order-dependent: no sidecar form
          case _: RunFirstValue => None // order-dependent: no sidecar form
          case _: RunNth => None // order-dependent: no sidecar form
          case _: RunMinMaxBy => None // tie-order-dependent: no sidecar form
          case _: RunLag => None // order-dependent: no sidecar form
          case _: RunLagNulls => None // order-dependent: no sidecar form
          case _: RunLead => None // order-dependent: no sidecar form
          case _: RunLeadN => None // order-dependent: no sidecar form
          case _: RunLeadNulls => None // order-dependent: no sidecar form
          case _: RunSliding => None // order-dependent: no sidecar form
          case _: RunSlidingFwd => None // order-dependent: no sidecar form
          case _: RunRangeSliding => None // order-dependent: no sidecar form
          case _: RunRangeFwd => None // order-dependent: no sidecar form
          // dense_rank's prefix is the earlier bands' DISTINCT-KEY
          // count — the v4 sidecar records exact per-file distincts for
          // monotone columns, and strict band disjointness makes them
          // additive ACROSS groups; valid only when the window orders
          // by exactly the band key (a tiebreak column would split tie
          // groups the key-only count can't see). Within a multi-file
          // group the per-file counts CHAIN-fold when the files touch
          // in at most single boundary values (the post-append,
          // pre-compact layout); genuine overlap refuses
          case RunDenseRank(order) =>
            val keyOnly = order.lengthCompare(1) == 0 &&
              (order.head.child match {
                case a: AttributeReference => a.name == keyCol &&
                  relOutput.exists(_.exprId == a.exprId)
                case _ => false
              })
            if (keyOnly)
              relOutput.find(_.name == keyCol)
                .flatMap(a => chainDistinct(files, keyCol, a.dataType))
            else None
          case RunMinMax(input, dt, isMin, _) => scanCol(input) match {
            case Some(n) =>
              colTotals(files, n).flatMap { cs =>
                val vals = cs.flatMap(c => if (isMin) c.min else c.max)
                // a stats row exists for every file; empty min/max means
                // an all-null column in that file — neutral, skip it
                if (vals.isEmpty) Some(null)
                else Some(vals.reduce((x, y) =>
                  if ((FilterEval.compareInternal(dt, x, y) < 0) == isMin) x
                  else y))
              }
            case _ => None
          }
          // the suffix min/max's band total is the same sidecar fold
          case RunSuffixMinMax(input, dt, isMin, _, _) =>
            scanCol(input) match {
              case Some(n) =>
                colTotals(files, n).flatMap { cs =>
                  val vals = cs.flatMap(c => if (isMin) c.min else c.max)
                  if (vals.isEmpty) Some(null)
                  else Some(vals.reduce((x, y) =>
                    if ((FilterEval.compareInternal(dt, x, y) < 0) == isMin)
                      x
                    else y))
                }
              case _ => None
            }
        }
        if (totals.exists(_.isEmpty)) None
        else Some(totals.map(_.get.asInstanceOf[Any]).toArray)
      }
      if (out.exists(_.isEmpty)) None else Some(out.map(_.get))
    }
  }

  private def colTotals(files: Seq[ZoneMaps.FileStats],
      col: String): Option[Seq[ZoneMaps.ColStats]] = {
    val cs = files.map(_.cols.get(col))
    if (cs.exists(_.isEmpty)) None else Some(cs.map(_.get))
  }

  /** Exact distinct-key count of one band GROUP from the v4 sidecar's
    * per-file distincts. One file answers directly; a multi-file group
    * (files merged because their ranges touch or overlap) folds when
    * the files form a CHAIN overlapping in at most single boundary
    * values: counts ADD, minus one per adjacent pair sharing its
    * boundary (min/max ARE that boundary for a monotone null-free
    * file) — the same rule the metadata COUNT(DISTINCT) pushdown
    * applies across files. Genuine overlap returns None (the distincts
    * would double-count unknowably), falling back to the computed pass.
    */
  private def chainDistinct(files: Seq[ZoneMaps.FileStats], keyCol: String,
      dt: DataType): Option[java.lang.Long] = {
    val stats = files.flatMap { f =>
      f.cols.get(keyCol) match {
        case Some(cs) =>
          if (cs.rows - cs.nulls == 0L) None // contributes no keys
          else if (cs.distinct.isEmpty || cs.min.isEmpty) return None
          else Some((cs.min.get, cs.max.get, cs.distinct.get))
        case None => return None
      }
    }
    if (stats.isEmpty) return Some(java.lang.Long.valueOf(0L))
    val sorted = stats.sortWith((a, b) =>
      FilterEval.compareInternal(dt, a._1, b._1) < 0)
    var total = sorted.head._3
    var prevMax = sorted.head._2
    sorted.drop(1).foreach { case (mn, mx, d) =>
      val c = FilterEval.compareInternal(dt, mn, prevMax)
      if (c < 0) return None // genuine overlap
      total += d - (if (c == 0) 1L else 0L)
      if (FilterEval.compareInternal(dt, mx, prevMax) > 0) prevMax = mx
    }
    Some(java.lang.Long.valueOf(total))
  }

  /** Plan-time population bound for value-based RANGE frames: an upper
    * bound on the densest frame's row count, from the sidecar's per-file
    * (key min, key max, rows). A frame ending at key c holds only rows
    * of files whose [min, max] intersects [c − lo, c], so the max over c
    * of that file-row sum bounds every frame; the sweep evaluates it at
    * arrival points (the sum only grows there). Over-estimates freely
    * (whole files count even when one row overlaps) — it only gates
    * whether the in-memory buffer is SAFE; the runtime cap still guards
    * paths with no stats (filtered scans, chain windows). Returns true
    * when every frame provably fits, false to refuse to Spark's
    * spillable WindowExec, true-with-runtime-guard when stats are
    * underivable.
    */
  private def rangeFramesBounded(scan: ExtJsonScan, keyCol: String,
      funcs: Seq[RunningFunc]): Boolean = {
    import RunningWindow.{FixedDist, MonthDist, MonthTsDist, RunLeadNulls, RunRangeFwd, RunRangeSliding, RunSuffixMinMax}
    // frame widths whose window population the sweep must bound: the
    // PRECEDING width for trailing frames, d1+f for ±FOLLOWING frames
    // (the buffer plus the pending queue both live inside that window)
    val MicrosPerDay = 86400L * 1000000L
    val widths = funcs.collect {
      case r: RunRangeSliding => r.dist match {
        case FixedDist(l, _) => l
        // months → conservative day width (31 days each + slack)
        case MonthDist(l, _) => 31L * l + 3L
        // …and the same conservative width in micros over ts keys
        // (saturating: a frame of ~3.4M+ months overflows the multiply)
        case MonthTsDist(l, _, _) =>
          val days = 31L * l + 3L
          if (days > Long.MaxValue / MicrosPerDay) Long.MaxValue - 1
          else days * MicrosPerDay
      }
      case r: RunRangeFwd =>
        if (r.monthly) 31L * (r.d1 + r.f) + 6L // months → day width
        else if (r.d1 > Long.MaxValue - r.f - 1) Long.MaxValue - 1
        else r.d1 + r.f + 1
    }
    val wholeBand = funcs.exists(f => f.isInstanceOf[RunLeadNulls] ||
      f.isInstanceOf[RunSuffixMinMax])
    if (widths.isEmpty && !wholeBand) return true
    val cap = RangeWindowStrategy.maxRangeFrameRows(session)
    scan.orderedBandFileStats(keyCol) match {
      case Some(groups) =>
        // lead IGNORE NULLS buffers the whole partition's values: the
        // densest band group must fit the cap
        if (wholeBand && groups.nonEmpty) {
          val maxBand = groups.map(_.flatMap(_.cols.get(keyCol))
            .map(_.rows).sum).max
          if (maxBand > cap) return false
        }
        if (widths.isEmpty) return true
        val files = groups.flatten
        val stats = files.flatMap { f =>
          f.cols.get(keyCol).flatMap { cs =>
            (cs.min, cs.max) match {
              case (Some(mn), Some(mx)) =>
                Some((asLong(mn), asLong(mx), cs.rows))
              case _ => None
            }
          }
        }
        // any underivable file → no plan-time bound; the runtime cap
        // still fails fast before an OOM
        if (stats.length != files.length) return true
        widths.forall(lo =>
          RangeWindowStrategy.maxWindowRows(stats, lo, cap) <= cap)
      case None => true
    }
  }
}

object RangeWindowStrategy {
  /** Runtime/plan-time cap on a value-based RANGE frame's live buffered
    * rows per function — past it the frame belongs to Spark's spillable
    * WindowExec, not an in-memory deque.
    */
  val MaxRangeFrameRowsKey = "spark.graft.window.maxRangeFrameRows"

  private[plans] def maxRangeFrameRows(session: SparkSession): Long =
    session.sessionState.conf
      .getConfString(MaxRangeFrameRowsKey, "4194304").toLong

  /** Max file-row sum over any width-`lo` key window (see
    * [[RangeWindowStrategy.rangeFramesBounded]]); early-exits once past
    * `cap`. Direction-free: the max over sliding windows of one width
    * is the same swept either way.
    */
  private[plans] def maxWindowRows(stats: Seq[(Long, Long, Long)],
      lo: Long, cap: Long): Long = {
    val arr = stats.sortBy(_._1)
    // a file [mn, mx] is live for frame-end c while mn ≤ c ≤ mx + lo
    // (saturating: huge hash-range keys must not wrap the departure)
    val pq = scala.collection.mutable.PriorityQueue
      .empty[(Long, Long)](Ordering.by((e: (Long, Long)) => -e._1))
    var sum = 0L
    var best = 0L
    arr.foreach { case (mn, mx, rows) =>
      val c = mn
      while (pq.nonEmpty && pq.head._1 < c) {
        sum -= pq.head._2
        pq.dequeue()
      }
      sum += rows
      val dep = if (mx > Long.MaxValue - lo) Long.MaxValue else mx + lo
      pq.enqueue((dep, rows))
      if (sum > best) best = sum
      if (best > cap) return best
    }
    best
  }
}

