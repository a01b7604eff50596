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
                mergeJoin.planChain(join) match {
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

/** The running-function specs and their per-partition accumulators.
  * Each accumulator is a small monoid: `update(row)` folds one row in,
  * `total()` snapshots the partition's contribution in a driver-portable
  * form, `mergeTotal(t)` folds a snapshot in (the driver's prefix scan
  * AND the executor's prefix load are the same operation), `value()`
  * renders the current state in the function's result type.
  */
private[plans] object RunningWindow {

  /** One delayed output row of the deep-lead ring: the copied input row
    * and its window values (the lead slots fill in as their source rows
    * arrive, up to n positions later).
    */
  private[plans] final class PendingRow(val row: UnsafeRow,
      val vals: GenericInternalRow)

  /** Retain a value extracted from a TRANSIENT row (a reader's or
    * buffer's reused holder): UTF8Strings are cloned — they alias the
    * row's bytes past the next advance — and every other type the
    * accumulators accept here is an immutable boxed value.
    */
  private[plans] def retain(v: Any): Any = v match {
    case u: UTF8String => u.clone()
    case other => other
  }

  /** Emission-delay regimes cannot mix in one Window node: the
    * row-count ring (deep leads, ROWS FOLLOWING) and the key-released
    * pending queue (RANGE FOLLOWING) each own the partition's emission
    * order — a node holding both refuses whole (partial acceleration
    * would still leave Spark's single-partition WindowExec for the
    * rest, gaining nothing).
    */
  private[plans] def delayCompatible(fs: Seq[RunningFunc]): Boolean =
    !(fs.exists(_.isInstanceOf[RunRangeFwd]) &&
      fs.exists(f => f.isInstanceOf[RunLeadN] ||
        f.isInstanceOf[RunSlidingFwd]))

  sealed trait RunAcc {
    def update(row: InternalRow): Unit
    def total(): Any
    def mergeTotal(t: Any): Unit
    def value(): Any
  }

  /** `rowsFrame = true`: the value changes per ROW (updated at emission,
    * read after the update — `ROWS` frames and `row_number`). False: the
    * value is constant over an order-ties group (`RANGE` frames, read at
    * group end; `rank` reads the count at group START instead, see
    * [[RunRank]]). `orderSensitive = true`: the per-partition TOTAL
    * depends on row order (the carry functions), so the computed-prefix
    * pass must run over the SORTED child, not below its sort.
    */
  sealed trait RunningFunc extends Serializable {
    def rowsFrame: Boolean
    def groupStart: Boolean = false
    def orderSensitive: Boolean = false
    def bound(input: Seq[Attribute]): RunningFunc
    /** `grand`: the fold of EVERY partition's total — the global row
      * count the size-based rank family (percent_rank, cume_dist, ntile)
      * divides by; null on the driver's prefix scan, where only
      * total()/mergeTotal() run.
      */
    def newAcc(grand: Any = null): RunAcc
  }

  private final class CountingAcc(render: Long => Any) extends RunAcc {
    var n = 0L
    override def update(row: InternalRow): Unit = n += 1
    override def total(): Any = java.lang.Long.valueOf(n)
    override def mergeTotal(t: Any): Unit =
      if (t != null) n += t.asInstanceOf[java.lang.Long].longValue()
    override def value(): Any = render(n)
  }

  final case class RunRowNumber() extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def bound(input: Seq[Attribute]): RunningFunc = this
    // value read AFTER the row's update: n IS the 1-based row number
    override def newAcc(grand: Any): RunAcc = new CountingAcc(n => n.toInt)
  }

  /** Ties never straddle band groups (strict key disjointness), so the
    * group-START row count + 1 is the global rank of every row in the
    * tie group — `rank()`'s exact semantics.
    */
  final case class RunRank() extends RunningFunc {
    override def rowsFrame: Boolean = false
    override def groupStart: Boolean = true
    override def bound(input: Seq[Attribute]): RunningFunc = this
    override def newAcc(grand: Any): RunAcc = new CountingAcc(n => (n + 1).toInt)
  }

  final case class RunCount(input: Expression, rowsFrame: Boolean)
      extends RunningFunc {
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var n = 0L
      override def update(row: InternalRow): Unit =
        if (input.eval(row) != null) n += 1
      override def total(): Any = java.lang.Long.valueOf(n)
      override def mergeTotal(t: Any): Unit =
        if (t != null) n += t.asInstanceOf[java.lang.Long].longValue()
      override def value(): Any = n
    }
  }

  /** `ansi = true`: overflow throws (Math.addExact — ANSI Sum's
    * posture). `ansi = false`: overflow WRAPS silently, matching
    * WindowExec's default-mode running Sum — and wrap-around addition is
    * associative mod 2^64, so the per-band prefix decomposition stays
    * exact in either mode.
    */
  final case class RunSumLong(input: Expression, rowsFrame: Boolean,
      ansi: Boolean) extends RunningFunc {
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var s = 0L
      var any = false
      private def add(v: Long): Unit =
        s = if (ansi) Math.addExact(s, v) else s + v
      override def update(row: InternalRow): Unit = {
        val v = input.eval(row)
        if (v != null) {
          add(v.asInstanceOf[Number].longValue())
          any = true
        }
      }
      override def total(): Any =
        if (any) java.lang.Long.valueOf(s) else null
      override def mergeTotal(t: Any): Unit = if (t != null) {
        add(t.asInstanceOf[java.lang.Long].longValue())
        any = true
      }
      override def value(): Any = if (any) s else null
    }
  }

  /** Running double sums reassociate: (band₀ subtotal) + x is not
    * bit-identical to WindowExec's strict left fold — the SAME last-ulp
    * caveat every distributed double aggregation (Spark's own partial
    * GROUP BY sums included) carries. Exact for the house oracle rule
    * (never hash-check SUM(double); q-queries sum integers/decimals).
    */
  final case class RunSumDouble(input: Expression, rowsFrame: Boolean)
      extends RunningFunc {
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var s = 0.0
      var any = false
      override def update(row: InternalRow): Unit = {
        val v = input.eval(row)
        if (v != null) { s += v.asInstanceOf[Number].doubleValue(); any = true }
      }
      override def total(): Any =
        if (any) java.lang.Double.valueOf(s) else null
      override def mergeTotal(t: Any): Unit = if (t != null) {
        s += t.asInstanceOf[java.lang.Double].doubleValue(); any = true
      }
      override def value(): Any = if (any) s else null
    }
  }

  /** The intermediate fold is an unbounded BigDecimal — exact regardless
    * of mode; only the RENDER checks the result precision, which is
    * exactly CheckOverflow's placement in Spark's own Sum: `ansi = true`
    * throws on overflow, `ansi = false` returns null for the overflowing
    * rows (and values back in range render normally again).
    */
  final case class RunSumDecimal(input: Expression, resultType: DecimalType,
      rowsFrame: Boolean, ansi: Boolean) extends RunningFunc {
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var s: java.math.BigDecimal = null
      override def update(row: InternalRow): Unit = {
        val v = input.eval(row)
        if (v != null) {
          val d = v.asInstanceOf[Decimal].toJavaBigDecimal
          s = if (s == null) d else s.add(d)
        }
      }
      override def total(): Any = s
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val d = t.asInstanceOf[java.math.BigDecimal]
        s = if (s == null) d else s.add(d)
      }
      override def value(): Any =
        if (s == null) null
        else {
          val d = Decimal(s)
          if (d.changePrecision(resultType.precision, resultType.scale)) d
          else if (ansi) throw new ArithmeticException(
            s"running sum overflows ${resultType.simpleString}")
          else null
        }
    }
  }

  /** SUFFIX aggregates — `count(x)` / `sum(x)` `OVER (ORDER BY k
    * ROWS|RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)`: the
    * "remaining total from here" shape (corpus packing's
    * budget-remaining). The suffix fold inverts from the GRAND fold
    * minus the prefix — exact for counts, for wrap-mode long sums
    * (mod-2^64 arithmetic is associative and invertible), and for
    * decimal sums (unbounded BigDecimal, render-checked like Sum
    * itself); ANSI long sums REFUSE (a per-row suffix refold can
    * overflow where grand − prefix does not — subtraction would
    * silently differ from WindowExec's throw), and double sums/avgs
    * REFUSE (subtraction is not the refold's IEEE value). RANGE form
    * reads at group START (the whole tie group belongs to the suffix);
    * ROWS form snapshots the prefix before the current row. Totals are
    * order-free — the metadata path answers both from the sidecar with
    * zero passes.
    */
  final case class RunSuffixCount(input: Expression, rowsFrame: Boolean)
      extends RunningFunc {
    override def groupStart: Boolean = !rowsFrame
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val g =
        if (grand == null) 0L
        else grand.asInstanceOf[java.lang.Long].longValue()
      var n = 0L
      var before = 0L
      override def update(row: InternalRow): Unit = {
        before = n
        if (input.eval(row) != null) n += 1
      }
      override def total(): Any = java.lang.Long.valueOf(n)
      override def mergeTotal(t: Any): Unit =
        if (t != null) n += t.asInstanceOf[java.lang.Long].longValue()
      override def value(): Any = if (rowsFrame) g - before else g - n
    }
  }

  /** Suffix long sum — wrap (non-ANSI) mode only; see the family doc
    * above. State carries (wrapped sum, non-null count): a zero
    * remaining count renders SQL's empty-frame NULL.
    */
  final case class RunSuffixSumLong(input: Expression, rowsFrame: Boolean)
      extends RunningFunc {
    override def groupStart: Boolean = !rowsFrame
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ga = grand.asInstanceOf[Array[Any]]
      private val gs =
        if (ga == null) 0L
        else ga(0).asInstanceOf[java.lang.Long].longValue()
      private val gn =
        if (ga == null) 0L
        else ga(1).asInstanceOf[java.lang.Long].longValue()
      var s = 0L
      var n = 0L
      var sBefore = 0L
      var nBefore = 0L
      override def update(row: InternalRow): Unit = {
        sBefore = s; nBefore = n
        val v = input.eval(row)
        if (v != null) { s += v.asInstanceOf[Number].longValue(); n += 1 }
      }
      override def total(): Any =
        Array[Any](java.lang.Long.valueOf(s), java.lang.Long.valueOf(n))
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        s += a(0).asInstanceOf[java.lang.Long].longValue()
        n += a(1).asInstanceOf[java.lang.Long].longValue()
      }
      override def value(): Any = {
        val rn = gn - (if (rowsFrame) nBefore else n)
        if (rn == 0L) null
        else java.lang.Long.valueOf(gs - (if (rowsFrame) sBefore else s))
      }
    }
  }

  /** Suffix decimal sum — exact unbounded BigDecimal inversion with
    * Sum's own render posture (ANSI throws on result overflow, default
    * nulls it); see the family doc above.
    */
  final case class RunSuffixSumDecimal(input: Expression,
      resultType: DecimalType, rowsFrame: Boolean, ansi: Boolean)
      extends RunningFunc {
    override def groupStart: Boolean = !rowsFrame
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ga = grand.asInstanceOf[Array[Any]]
      private val gs =
        if (ga == null || ga(0) == null) java.math.BigDecimal.ZERO
        else ga(0).asInstanceOf[java.math.BigDecimal]
      private val gn =
        if (ga == null) 0L
        else ga(1).asInstanceOf[java.lang.Long].longValue()
      var s: java.math.BigDecimal = java.math.BigDecimal.ZERO
      var n = 0L
      var sBefore: java.math.BigDecimal = java.math.BigDecimal.ZERO
      var nBefore = 0L
      override def update(row: InternalRow): Unit = {
        sBefore = s; nBefore = n
        val v = input.eval(row)
        if (v != null) {
          s = s.add(v.asInstanceOf[Decimal].toJavaBigDecimal)
          n += 1
        }
      }
      override def total(): Any =
        Array[Any](s, java.lang.Long.valueOf(n))
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        if (a(0) != null) s = s.add(a(0).asInstanceOf[java.math.BigDecimal])
        n += a(1).asInstanceOf[java.lang.Long].longValue()
      }
      override def value(): Any = {
        val rn = gn - (if (rowsFrame) nBefore else n)
        if (rn == 0L) null
        else {
          val rs = gs.subtract(if (rowsFrame) sBefore else s)
          val d = Decimal(rs)
          if (d.changePrecision(resultType.precision, resultType.scale)) d
          else if (ansi) throw new ArithmeticException(
            s"suffix sum overflows ${resultType.simpleString}")
          else null
        }
      }
    }
  }

  /** Suffix `last(x)` (ignoreNulls = false) — `last_value(x) OVER (…
    * CURRENT ROW AND UNBOUNDED FOLLOWING)`: every row's frame ends at
    * the partition's last row, so the answer is ONE constant — the
    * global last value in window order — delivered through the grand
    * fold (each band's total is its last value; the driver's band-order
    * merge lets the latest band win). Order-sensitive: the totals pass
    * must see the sorted stream. The IGNORE NULLS form is NOT constant
    * (rows after the last non-null see an all-null suffix) and refuses.
    */
  final case class RunSuffixLast(input: Expression) extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val g: Any = grand match {
        case a: Array[Any]
            if a(1).asInstanceOf[java.lang.Boolean].booleanValue() => a(0)
        case _ => null
      }
      var cur: Any = null
      var sawRows = false
      override def update(row: InternalRow): Unit = {
        cur = retain(input.eval(row)); sawRows = true
      }
      override def total(): Any =
        Array[Any](cur, java.lang.Boolean.valueOf(sawRows))
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        if (a(1).asInstanceOf[java.lang.Boolean].booleanValue()) {
          cur = a(0); sawRows = true
        }
      }
      override def value(): Any = g
    }
  }

  /** Suffix `avg(x)` over an INTEGRAL child — sum/count inversion
    * composed: the suffix's EXACT integer sum (unbounded BigDecimal,
    * like the decimal suffix sum) and non-null count both invert from
    * grand − prefix, and the render is one IEEE division
    * `exactSum.toDouble / count`. Agrees bit-for-bit with WindowExec's
    * per-row refold whenever every suffix partial sum stays within
    * double's 2^53 integer-exact range (the refold's left-fold is then
    * exact too); beyond it this value is the mathematically exact one
    * where the refold has accumulated rounding. Double/float children
    * refuse (subtraction is not the refold's IEEE value — the suffix
    * family doc's posture); an all-null suffix renders SQL NULL.
    * Totals are order-free — the metadata path answers them from the
    * sidecar's exact sums with zero passes.
    */
  final case class RunSuffixAvgLong(input: Expression, rowsFrame: Boolean)
      extends RunningFunc {
    override def groupStart: Boolean = !rowsFrame
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ga = grand.asInstanceOf[Array[Any]]
      private val gs =
        if (ga == null || ga(0) == null) java.math.BigDecimal.ZERO
        else ga(0).asInstanceOf[java.math.BigDecimal]
      private val gn =
        if (ga == null) 0L
        else ga(1).asInstanceOf[java.lang.Long].longValue()
      var s: java.math.BigDecimal = java.math.BigDecimal.ZERO
      var n = 0L
      var sBefore: java.math.BigDecimal = java.math.BigDecimal.ZERO
      var nBefore = 0L
      override def update(row: InternalRow): Unit = {
        sBefore = s; nBefore = n
        val v = input.eval(row)
        if (v != null) {
          s = s.add(java.math.BigDecimal.valueOf(
            v.asInstanceOf[Number].longValue()))
          n += 1
        }
      }
      override def total(): Any =
        Array[Any](s, java.lang.Long.valueOf(n))
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        if (a(0) != null) s = s.add(a(0).asInstanceOf[java.math.BigDecimal])
        n += a(1).asInstanceOf[java.lang.Long].longValue()
      }
      override def value(): Any = {
        val rn = gn - (if (rowsFrame) nBefore else n)
        if (rn == 0L) null
        else {
          val rs = gs.subtract(if (rowsFrame) sBefore else s)
          java.lang.Double.valueOf(rs.doubleValue() / rn.toDouble)
        }
      }
    }
  }

  /** Suffix `min(x)` / `max(x)` — not invertible from the grand fold,
    * so the exec buffers the PARTITION (rows in the spillable window
    * buffer, this function's values on the heap, cap-guarded — the
    * RunLeadNulls posture) and precomputes the right-to-left fold
    * array seeded with the LATER bands' fold (a scalar per partition,
    * assembled driver-side from the per-band min/max totals — which
    * the sidecar answers with zero passes). ROWS form reads the fold
    * at the row's own index; RANGE form at its tie group's first index
    * (the whole group belongs to the suffix). `value()` is never read —
    * the accumulator only carries the band total.
    */
  final case class RunSuffixMinMax(input: Expression, dt: DataType,
      isMin: Boolean, rowsForm: Boolean, cap: Long = Long.MaxValue)
      extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ord = TypeUtils.getInterpretedOrdering(dt)
      var cur: Any = null
      private def fold(v: Any): Unit =
        if (cur == null || (ord.compare(v, cur) < 0) == isMin)
          cur = retain(v)
      override def update(row: InternalRow): Unit = {
        val v = input.eval(row)
        if (v != null) fold(v)
      }
      override def total(): Any = cur
      override def mergeTotal(t: Any): Unit = if (t != null) fold(t)
      override def value(): Any = null
    }
  }

  /** `dense_rank()` — distinct order-key tuples at-or-before the row:
    * the per-band total is the band's DISTINCT-KEY COUNT (counted by
    * watching tie boundaries in the sorted stream — order-sensitive, so
    * the totals pass runs over the sort), and strict band disjointness
    * means no key straddles a boundary: prefix counts simply ADD. The
    * only rank-family member with no metadata form (the sidecar has no
    * distinct counts).
    */
  final case class RunDenseRank(order: Seq[SortOrder]) extends RunningFunc {
    override def rowsFrame: Boolean = false
    override def groupStart: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(order = order.map(o =>
        o.copy(child = BindReferences.bindReference(o.child, in))))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ord = new LazilyGeneratedOrdering(order)
      private var prev: InternalRow = _
      var nd = 0L
      override def update(row: InternalRow): Unit =
        if (prev == null || ord.compare(prev, row) != 0) {
          nd += 1
          prev = row.asInstanceOf[UnsafeRow].copy()
        }
      override def total(): Any = java.lang.Long.valueOf(nd)
      override def mergeTotal(t: Any): Unit =
        if (t != null) nd += t.asInstanceOf[java.lang.Long].longValue()
      override def value(): Any = (nd + 1).toInt
    }
  }

  /** `percent_rank()` — `(rank − 1) / (N − 1)` (0 when N = 1): the
    * size-based twin of rank; the global N is the fold of every band's
    * total, which the metadata path reads off the sidecar for free.
    */
  final case class RunPercentRank() extends RunningFunc {
    override def rowsFrame: Boolean = false
    override def groupStart: Boolean = true
    override def bound(input: Seq[Attribute]): RunningFunc = this
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val n =
        if (grand == null) 0L
        else grand.asInstanceOf[java.lang.Long].longValue()
      var rows = 0L
      override def update(row: InternalRow): Unit = rows += 1
      override def total(): Any = java.lang.Long.valueOf(rows)
      override def mergeTotal(t: Any): Unit =
        if (t != null) rows += t.asInstanceOf[java.lang.Long].longValue()
      override def value(): Any =
        if (n <= 1L) 0.0 else rows.toDouble / (n - 1).toDouble
    }
  }

  /** `cume_dist()` — rows at-or-before the tie group, over N. */
  final case class RunCumeDist() extends RunningFunc {
    override def rowsFrame: Boolean = false
    override def bound(input: Seq[Attribute]): RunningFunc = this
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val n =
        if (grand == null) 0L
        else grand.asInstanceOf[java.lang.Long].longValue()
      var rows = 0L
      override def update(row: InternalRow): Unit = rows += 1
      override def total(): Any = java.lang.Long.valueOf(rows)
      override def mergeTotal(t: Any): Unit =
        if (t != null) rows += t.asInstanceOf[java.lang.Long].longValue()
      override def value(): Any = rows.toDouble / n.toDouble
    }
  }

  /** `ntile(b)` — Spark's bucketing: the first `N mod b` buckets hold
    * `N/b + 1` rows, the rest `N/b`; the bucket is a pure function of
    * (row number, N, b), so the per-band prefix is just the row count.
    */
  final case class RunNTile(buckets: Int) extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def bound(input: Seq[Attribute]): RunningFunc = this
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val n =
        if (grand == null) 0L
        else grand.asInstanceOf[java.lang.Long].longValue()
      private val base = if (n > 0) n / buckets else 0L
      private val rem = if (n > 0) (n % buckets).toInt else 0
      private val cut = rem.toLong * (base + 1)
      var rows = 0L
      override def update(row: InternalRow): Unit = rows += 1
      override def total(): Any = java.lang.Long.valueOf(rows)
      override def mergeTotal(t: Any): Unit =
        if (t != null) rows += t.asInstanceOf[java.lang.Long].longValue()
      override def value(): Any = {
        val rn = rows // 1-based after the update
        if (rn <= cut) ((rn - 1) / (base + 1)).toInt + 1
        else rem + ((rn - 1 - cut) / math.max(1L, base)).toInt + 1
      }
    }
  }

  /** Running `avg(x)` — sum/count over the cumulative frame, rendered
    * as their IEEE quotient exactly like Spark's Average (whose sum
    * buffer is a DOUBLE for every non-decimal input, so the same
    * reassociation caveat as [[RunSumDouble]] applies to the sum; the
    * count is exact). No metadata form — the sidecar's exact integer
    * sums cannot reproduce the double fold.
    */
  final case class RunAvgDouble(input: Expression, rowsFrame: Boolean)
      extends RunningFunc {
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var s = 0.0
      var n = 0L
      override def update(row: InternalRow): Unit = {
        val v = input.eval(row)
        if (v != null) { s += v.asInstanceOf[Number].doubleValue(); n += 1 }
      }
      override def total(): Any =
        Array[Any](java.lang.Double.valueOf(s), java.lang.Long.valueOf(n))
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        s += a(0).asInstanceOf[java.lang.Double].doubleValue()
        n += a(1).asInstanceOf[java.lang.Long].longValue()
      }
      override def value(): Any = if (n == 0L) null else s / n
    }
  }

  /** `lead(x, 1[, default])` — the NEXT row's value in window order
    * (the constant default at the very last row): lag's mirror. Its
    * accumulator serves only the totals pass (the band's FIRST input
    * value, order-sensitive); the exec evaluates the function itself
    * with a one-row lookahead over the buffered stream and wires each
    * band's last row to the next band's first value as a SUFFIX — the
    * backward-flowing carry of the family. Deterministic under the same
    * unique-order-key caveat as lag.
    */
  final case class RunLead(input: Expression, default: Any = null)
      extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var first: Any = null
      var sawRows = false
      override def update(row: InternalRow): Unit =
        if (!sawRows) { first = retain(input.eval(row)); sawRows = true }
      override def total(): Any =
        Array[Any](first, java.lang.Boolean.valueOf(sawRows))
      override def mergeTotal(t: Any): Unit = if (t != null) {
        // driver prefix folds run in band order: the FIRST band's first
        // value wins (later bands only fill an empty state)
        val a = t.asInstanceOf[Array[Any]]
        if (!sawRows && a(1).asInstanceOf[java.lang.Boolean].booleanValue()) {
          first = a(0); sawRows = true
        }
      }
      override def value(): Any = first
    }
  }

  /** `lead(x, n[, default])` for n ≥ 2 — the lag ring MIRRORED: the
    * exec delays each row's emission behind an n-slot ring (the value
    * arrives with the row n positions ahead), and the per-band total is
    * the band's FIRST n input values — the bounded backward carry the
    * lead(1) suffix generalizes to. The accumulator serves only the
    * totals pass; `value()` is never read (the exec fills lead slots at
    * ring push / flush time). O(n) memory per partition, same 65,536
    * guard as the sliding frames.
    */
  final case class RunLeadN(input: Expression, n: Int, default: Any)
      extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val firsts =
        new scala.collection.mutable.ArrayBuffer[Any](math.min(n, 64))
      override def update(row: InternalRow): Unit =
        if (firsts.length < n) firsts += retain(input.eval(row))
      override def total(): Any = firsts.toArray[Any]
      override def mergeTotal(t: Any): Unit = if (t != null) {
        // band-order fold: an earlier band's firsts take precedence;
        // later bands only top the window up to n values
        val a = t.asInstanceOf[Array[Any]]
        var i = 0
        while (firsts.length < n && i < a.length) { firsts += a(i); i += 1 }
      }
      override def value(): Any = null
    }
  }

  /** The bounded sliding aggregate ops — each folds the ≤ n+1 buffered
    * frame values IN STREAM ORDER, the same per-frame re-evaluation
    * Spark's SlidingWindowFunctionFrame performs, so double sums are
    * bit-identical to WindowExec's.
    */
  sealed trait SlideOp extends Serializable {
    def fold(values: Iterator[Any]): Any
  }
  object SlideOp {
    case object Count extends SlideOp {
      override def fold(values: Iterator[Any]): Any =
        values.count(_ != null).toLong
    }
    final case class SumLong(ansi: Boolean) extends SlideOp {
      override def fold(values: Iterator[Any]): Any = {
        var s = 0L; var any = false
        values.foreach { v =>
          if (v != null) {
            val x = v.asInstanceOf[Number].longValue()
            s = if (ansi) Math.addExact(s, x) else s + x
            any = true
          }
        }
        if (any) s else null
      }
    }
    case object SumDouble extends SlideOp {
      override def fold(values: Iterator[Any]): Any = {
        var s = 0.0; var any = false
        values.foreach { v =>
          if (v != null) { s += v.asInstanceOf[Number].doubleValue(); any = true }
        }
        if (any) s else null
      }
    }
    final case class SumDecimal(resultType: DecimalType, ansi: Boolean)
        extends SlideOp {
      override def fold(values: Iterator[Any]): Any = {
        var s: java.math.BigDecimal = null
        values.foreach { v =>
          if (v != null) {
            val d = v.asInstanceOf[Decimal].toJavaBigDecimal
            s = if (s == null) d else s.add(d)
          }
        }
        if (s == null) null
        else {
          val d = Decimal(s)
          if (d.changePrecision(resultType.precision, resultType.scale)) d
          else if (ansi) throw new ArithmeticException(
            s"sliding sum overflows ${resultType.simpleString}")
          else null
        }
      }
    }
    case object AvgDouble extends SlideOp {
      override def fold(values: Iterator[Any]): Any = {
        var s = 0.0; var n = 0L
        values.foreach { v =>
          if (v != null) { s += v.asInstanceOf[Number].doubleValue(); n += 1 }
        }
        if (n == 0L) null else s / n
      }
    }
    /** `lag(x, n[, default])` over the ring: the OLDEST buffered value
      * when the ring holds exactly n+1 (the current row plus its n
      * predecessors — positions count ROWS, so null values ride along),
      * the constant default while the global position is still under n.
      */
    final case class LagN(n: Int, default: Any = null) extends SlideOp {
      override def fold(values: Iterator[Any]): Any = {
        var first: Any = null
        var cnt = 0
        values.foreach { v => if (cnt == 0) first = v; cnt += 1 }
        if (cnt == n + 1) first else default
      }
    }

    final case class MinMax(dt: DataType, isMin: Boolean) extends SlideOp {
      @transient private lazy val ord = TypeUtils.getInterpretedOrdering(dt)
      override def fold(values: Iterator[Any]): Any = {
        var cur: Any = null
        values.foreach { v =>
          if (v != null &&
            (cur == null || (ord.compare(v, cur) < 0) == isMin)) cur = v
        }
        cur
      }
    }
  }

  /** `agg(x) OVER (ORDER BY k ROWS BETWEEN n PRECEDING AND CURRENT
    * ROW)` — the bounded sliding frame: the accumulator keeps a ring of
    * the last ≤ n+1 evaluated input values (retained — UTF8Strings
    * cloned), each row's value folds the ring in stream order, and the
    * per-band TOTAL is the band's last ≤ n values — the bounded,
    * order-sensitive carry the lag(1) prefix generalizes to. Prefix
    * merge is `(earlier ++ later).takeRight(n)`, associative by
    * construction. O(n) per row — exactly the re-evaluation Spark's own
    * sliding frame pays, minus its single-partition collapse.
    */
  final case class RunSliding(input: Expression, n: Int, op: SlideOp)
      extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ring = new java.util.ArrayDeque[AnyRef](n + 1)
      private val NullToken: AnyRef = RunSliding.NullToken
      private def push(v: Any, cap: Int): Unit = {
        ring.addLast(if (v == null) NullToken else v.asInstanceOf[AnyRef])
        while (ring.size > cap) ring.removeFirst()
      }
      override def update(row: InternalRow): Unit =
        push(retain(input.eval(row)), n + 1)
      override def total(): Any = {
        val vals = ring.toArray
        val keep = vals.drop(math.max(0, vals.length - n))
        val out = new Array[Any](keep.length)
        var i = 0
        while (i < keep.length) {
          out(i) = if (keep(i) eq NullToken) null else keep(i)
          i += 1
        }
        out
      }
      override def mergeTotal(t: Any): Unit = if (t != null)
        // band-order fold: later values append after earlier ones, the
        // ring trims to the last n (a prefix can never exceed n values)
        t.asInstanceOf[Array[Any]].foreach(push(_, n))
      override def value(): Any = op match {
        // lag is O(1) on the ring: size and oldest element are direct
        // deque queries — no per-row scan of up-to-n values (Spark's own
        // OffsetWindowFunctionFrame is O(1) per row too)
        case SlideOp.LagN(k, d) =>
          if (ring.size == k + 1) {
            val v = ring.peekFirst()
            if (v eq NullToken) null else v
          } else d
        case _ =>
          val it = ring.iterator()
          op.fold(new Iterator[Any] {
            override def hasNext: Boolean = it.hasNext
            override def next(): Any = {
              val v = it.next()
              if (v eq NullToken) null else v
            }
          })
      }
    }
  }

  object RunSliding {
    /** ArrayDeque rejects nulls; legitimate null inputs ride as this
      * sentinel and unwrap at fold/snapshot time.
      */
    private[RunningWindow] val NullToken: AnyRef = new java.io.Serializable {
      override def toString: String = "<null>"
    }
  }

  /** `agg(x) OVER (ORDER BY k ROWS BETWEEN n PRECEDING|CURRENT ROW AND
    * m FOLLOWING)` — the bounded FOLLOWING frame (the centered moving
    * average): row i's frame is values [i−n .. i+m], complete only when
    * row i+m arrives, so the exec DELAYS emission behind the m-slot
    * ring it already runs for deep leads and fills each row's slot from
    * [[FwdAcc.foldFill]] when its +m row lands (the deque then holds
    * exactly the frame: last ≤ n+m+1 values ending at i+m, clipped at
    * the global start by construction). At partition end the ≤ m
    * still-delayed rows read [[FwdAcc.foldFlush]] — the deque's last
    * n+1+d in-partition values plus the next bands' first m−d values
    * (the forward SUFFIX, default-free: past the global end the frame
    * just clips). The per-band total carries (last ≤ n values, first
    * ≤ m values) — the preceding context the NEXT band's early rows
    * seed from, and the forward suffix the PREVIOUS band's late rows
    * read. O(n+m) memory per function per partition; fold order is
    * stream order, so double sums are bit-identical to Spark's
    * SlidingWindowFunctionFrame.
    */
  final case class RunSlidingFwd(input: Expression, n: Int, m: Int,
      op: SlideOp) extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new FwdAcc(input, n, m, op)
  }

  private[plans] final class FwdAcc(input: Expression, n: Int, m: Int,
      op: SlideOp) extends RunAcc {
    private val NullToken: AnyRef = RunSliding.NullToken
    private val cap = n + m + 1
    private val ring = new java.util.ArrayDeque[AnyRef](math.min(cap, 4096))
    private val firsts =
      new scala.collection.mutable.ArrayBuffer[Any](math.min(m, 64))
    private def push(v: Any, c: Int): Unit = {
      ring.addLast(if (v == null) NullToken else v.asInstanceOf[AnyRef])
      while (ring.size > c) ring.removeFirst()
    }
    override def update(row: InternalRow): Unit = {
      val v = retain(input.eval(row))
      if (firsts.length < m) firsts += v
      push(v, cap)
    }
    /** (band's last ≤ n values, band's first ≤ m values). */
    override def total(): Any = {
      val vals = ring.toArray
      val keep = vals.drop(math.max(0, vals.length - n))
      val lastN = new Array[Any](keep.length)
      var i = 0
      while (i < keep.length) {
        lastN(i) = if (keep(i) eq NullToken) null else keep(i)
        i += 1
      }
      Array[Any](lastN, firsts.toArray[Any])
    }
    /** Band-order fold of the PRECEDING context: later values append
      * after earlier ones, trimmed to the last n (the only part a later
      * band's early frames can reach).
      */
    override def mergeTotal(t: Any): Unit = if (t != null)
      t.asInstanceOf[Array[Any]](0).asInstanceOf[Array[Any]]
        .foreach(push(_, math.max(n, 0)))
    /** Never the emitted value — the exec fills slots at ring time. */
    override def value(): Any = null
    private def unwrapped(a: Array[AnyRef], from: Int): Iterator[Any] =
      new Iterator[Any] {
        private var i = from
        override def hasNext: Boolean = i < a.length
        override def next(): Any = {
          val v = a(i); i += 1
          if (v eq NullToken) null else v
        }
      }
    /** Frame fold at FILL time (row i's +m row just updated): the whole
      * deque IS the frame — last min(seen, n+m+1) values ending at i+m.
      */
    private[plans] def foldFill(): Any = {
      val it = ring.iterator()
      op.fold(new Iterator[Any] {
        override def hasNext: Boolean = it.hasNext
        override def next(): Any = {
          val v = it.next()
          if (v eq NullToken) null else v
        }
      })
    }
    /** Frame fold at FLUSH time (partition ended; this row has d < m
      * rows after it in the partition): the deque's last n+1+d values
      * (the in-partition frame part ending at the partition's last row)
      * then the suffix's first m−d values (the next bands' firsts; the
      * global end just clips).
      */
    private[plans] def foldFlush(d: Int, suffix: Array[Any]): Any = {
      val vals = ring.toArray
      val take = math.min(vals.length, n + 1 + d)
      val inPart = unwrapped(vals, vals.length - take)
      val sTake = math.min(suffix.length, m - d)
      op.fold(inPart ++ suffix.iterator.take(sTake))
    }
  }

  /** The value-frame boundary pair, as distances ≥ 0 from the current
    * key in the KEY's own units — `lo` is the far (eviction) bound,
    * `hi` the near (admission) bound (0 = CURRENT ROW; `hi > 0` is the
    * dual-bound lagged frame `lo PRECEDING AND hi PRECEDING`).
    * [[FixedDist]] is linear key arithmetic (integral keys,
    * day-intervals over DATE keys, day-time intervals over TIMESTAMP
    * keys); [[MonthDist]] is calendar arithmetic over DATE keys — the
    * bound is `add_months(current, -m)` with LocalDate's month-end
    * clamping, bit-identical to Spark's own DateAddYMInterval boundary,
    * and monotone in the key (so front-eviction stays valid).
    */
  sealed trait RangeDist extends Serializable
  final case class FixedDist(lo: Long, hi: Long) extends RangeDist
  final case class MonthDist(lo: Int, hi: Int) extends RangeDist

  /** Calendar months over a TIMESTAMP band key — single-bound frames
    * (`m MONTH PRECEDING AND CURRENT ROW`) only: the bound is Spark's
    * own `timestampAddMonths(current, −m, zone)` — wall-clock month
    * arithmetic in the SESSION timezone with month-end clamping,
    * bit-identical to the TimestampAddYMInterval boundary Spark's own
    * WindowExec evaluates for this frame. UNLIKE the DATE form, the
    * timestamp bound is NOT monotone in the key: clamping collapses a
    * run of month-end days onto one target day, so within that plateau
    * the bound follows TIME-OF-DAY against the key's date order
    * (Mar 28 23:50 − 1 MONTH = Feb 28 23:50, but Mar 29 00:10 − 1
    * MONTH = Feb 28 00:10 — the bound steps BACKWARD as the key
    * advances). Spark's WindowExec resolves the inversion with its
    * FORWARD-ONLY frame-head pointer: the effective frame start is the
    * RUNNING MAX of the per-row bounds, never retreating — and
    * eviction-by-current-bound reproduces exactly that (the retained
    * set is "entries ≥ every bound seen so far", per band and across
    * the prefix merge alike). An engine evaluating the exact per-row
    * bound instead (DuckDB does) differs on precisely those plateau
    * rows — an oracle must encode the running-max bound explicitly
    * (q207 does). Dual-bound ts-month frames REFUSE: the upper bound
    * inverts the same way, and matching Spark's forward-only upper
    * pointer would need its running-max state carried across bands.
    * TIMESTAMP_NTZ keys pin `zone` to UTC (zone-less local-calendar
    * arithmetic).
    */
  final case class MonthTsDist(lo: Int, hi: Int, zone: String)
      extends RangeDist

  /** `agg(x) OVER (ORDER BY k RANGE BETWEEN d PRECEDING AND [CURRENT
    * ROW | d2 PRECEDING])` — the VALUE-based sliding frame (the 7-day
    * mean; the lagged "week ending 3 days ago"; the 3-MONTH rolling
    * mean over a date key): the accumulator retains (key, value) pairs
    * and EVICTS by key distance (past the lo bound from the current
    * key — or the mirrored direction under DESC), so the buffer holds
    * exactly the frame's live rows; each group-end value folds the
    * buffered values that clear the hi (admission) bound, in stream
    * order (RANGE CURRENT ROW spans the whole tie group, so the value
    * is group-scoped — tie groups share the frame, SQL's peer
    * semantics). The per-band TOTAL is the band's own trailing frame
    * (entries within lo of its last key — every future row is farther
    * out, so nothing else can matter), merged band-to-band with the
    * same eviction. Memory is O(live frame rows) of (long, value)
    * pairs — the SAME row population Spark's own WindowExec buffers as
    * whole spillable rows for this frame, held smaller; each FUNCTION
    * keeps its own buffer (n functions over one frame hold the live
    * values n times — still value-sized). `cap` bounds the live buffer
    * at runtime: where the strategy could not prove a plan-time bound
    * from the sidecar (chain windows, filtered scans), a frame denser
    * than the cap fails fast with the conf to raise instead of
    * accreting toward an executor OOM — Spark's own WindowExec (which
    * spills) is the right plan for those. The layout proof is
    * null-free, so the key never needs a null peer group.
    */
  final case class RunRangeSliding(key: Expression, input: Expression,
      dist: RangeDist, desc: Boolean, op: SlideOp,
      cap: Long = Long.MaxValue) extends RunningFunc {
    override def rowsFrame: Boolean = false
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(key = BindReferences.bindReference(key, in),
        input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val NullToken: AnyRef = RunSliding.NullToken
      private val keys = new java.util.ArrayDeque[java.lang.Long]()
      private val vals = new java.util.ArrayDeque[AnyRef]()
      // keep entry k for current key c: ASC → c - k ≤ lo (k can never
      // exceed c in a sorted stream); DESC → k - c ≤ lo. The
      // subtraction is always of (later − earlier) in stream order,
      // hence mathematically ≥ 0 — a WRAPPED (negative) result means
      // the true distance exceeds the Long range entirely, which is
      // certainly > lo (64-bit hash-id keys can legitimately span that
      // far). Admission mirrors it: distance ≥ hi.
      private def wdist(later: Long, earlier: Long): Long = {
        val r = later - earlier
        if (r < 0) Long.MaxValue else r
      }
      // month bounds cache per current key: the calendar adds run once
      // per row, not once per buffered entry. Eviction by the current
      // row's bound implements Spark's own forward-only frame-head
      // pointer EXACTLY: the retained set is "entries ≥ the running
      // max of every bound so far", which is what WindowExec's
      // non-retreating head produces on the timestamp clamp plateau's
      // bound inversions (see MonthTsDist — dates are plateau-equal,
      // so exact and running-max coincide there)
      private var mFor = Long.MinValue
      private var mHave = false
      private var mEvict = 0L
      private var mAdmit = 0L
      private lazy val tsZone: java.time.ZoneId = dist match {
        case MonthTsDist(_, _, z) =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .getZoneId(z)
        case _ => java.time.ZoneOffset.UTC
      }
      private def monthBounds(cur: Long, lo: Int, hi: Int): Unit =
        if (!mHave || cur != mFor) {
          dist match {
            case _: MonthTsDist =>
              import org.apache.spark.sql.catalyst.util.DateTimeUtils
              if (desc) {
                mEvict = DateTimeUtils.timestampAddMonths(cur, lo, tsZone)
                mAdmit = DateTimeUtils.timestampAddMonths(cur, hi, tsZone)
              } else {
                mEvict = DateTimeUtils.timestampAddMonths(cur, -lo, tsZone)
                mAdmit = DateTimeUtils.timestampAddMonths(cur, -hi, tsZone)
              }
            case _ =>
              val ld = java.time.LocalDate.ofEpochDay(cur)
              if (desc) {
                mEvict = ld.plusMonths(lo.toLong).toEpochDay
                mAdmit = ld.plusMonths(hi.toLong).toEpochDay
              } else {
                mEvict = ld.minusMonths(lo.toLong).toEpochDay
                mAdmit = ld.minusMonths(hi.toLong).toEpochDay
              }
          }
          mFor = cur; mHave = true
        }
      private def keep(cur: Long, k: Long): Boolean = dist match {
        case FixedDist(lo, _) =>
          (if (desc) wdist(k, cur) else wdist(cur, k)) <= lo
        case MonthDist(lo, hi) =>
          monthBounds(cur, lo, hi)
          if (desc) k <= mEvict else k >= mEvict
        case MonthTsDist(lo, hi, _) =>
          monthBounds(cur, lo, hi)
          if (desc) k <= mEvict else k >= mEvict
      }
      private def admit(cur: Long, k: Long): Boolean = dist match {
        case FixedDist(_, hi) =>
          hi == 0L || (if (desc) wdist(k, cur) else wdist(cur, k)) >= hi
        case MonthDist(lo, hi) =>
          monthBounds(cur, lo, hi)
          if (desc) k >= mAdmit else k <= mAdmit
        case MonthTsDist(_, _, _) =>
          // ts-months plan single-bound only (upper = CURRENT ROW, so
          // every retained entry is in frame): a dual-bound upper
          // would need Spark's running-max pointer state carried
          // across bands, and the strategy refuses that shape instead
          true
      }
      private var curKey = 0L
      private def evict(cur: Long): Unit = {
        var go = true
        while (go && !keys.isEmpty) {
          val k = keys.peekFirst().longValue()
          if (!keep(cur, k)) {
            keys.removeFirst(); vals.removeFirst()
          } else go = false
        }
      }
      override def update(row: InternalRow): Unit = {
        val c = key.eval(row).asInstanceOf[Number].longValue()
        curKey = c
        evict(c)
        keys.addLast(java.lang.Long.valueOf(c))
        val v = retain(input.eval(row))
        vals.addLast(if (v == null) NullToken else v.asInstanceOf[AnyRef])
        if (keys.size > cap) throw new org.apache.spark.SparkException(
          s"graft range-window frame exceeds $cap live rows per " +
            "function; raise spark.graft.window.maxRangeFrameRows or " +
            "let Spark's spillable window plan this frame")
      }
      override def total(): Any = {
        val ks = new Array[Any](keys.size)
        val vs = new Array[Any](vals.size)
        var i = 0
        val ki = keys.iterator(); val vi = vals.iterator()
        while (ki.hasNext) {
          ks(i) = ki.next().longValue()
          val v = vi.next()
          vs(i) = if (v eq NullToken) null else v
          i += 1
        }
        Array[Any](ks, vs)
      }
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        val ks = a(0).asInstanceOf[Array[Any]]
        val vs = a(1).asInstanceOf[Array[Any]]
        var i = 0
        while (i < ks.length) {
          keys.addLast(java.lang.Long.valueOf(ks(i).asInstanceOf[Long]))
          vals.addLast(if (vs(i) == null) NullToken
            else vs(i).asInstanceOf[AnyRef])
          i += 1
        }
        // the merged band's own last key is the tightest future bound
        if (!keys.isEmpty) evict(keys.peekLast().longValue())
      }
      override def value(): Any = {
        val ki = keys.iterator(); val vi = vals.iterator()
        op.fold(new Iterator[Any] {
          private var nextV: Any = _
          private var haveNext = false
          private def advance(): Unit =
            while (!haveNext && ki.hasNext) {
              val k = ki.next().longValue()
              val v = vi.next()
              if (admit(curKey, k)) {
                nextV = if (v eq NullToken) null else v
                haveNext = true
              }
            }
          override def hasNext: Boolean = { advance(); haveNext }
          override def next(): Any = {
            advance()
            if (!haveNext) throw new NoSuchElementException
            haveNext = false
            nextV
          }
        })
      }
    }
  }

  /** `agg(x) OVER (ORDER BY k RANGE BETWEEN d1 PRECEDING|CURRENT ROW
    * AND f FOLLOWING)` — the value-based FOLLOWING frame (the ±window
    * around each event): row r's frame is every key in
    * [r.key − d1, r.key + f] (stream-mirrored under DESC), complete
    * only once a key strictly beyond r.key + f arrives — so the exec
    * holds pending rows in a key-released queue and this accumulator
    * is the live (key, value) buffer they fold from. Eviction keeps
    * entries within d1 of the OLDEST pending key (not the current
    * one — later pendings still need them); both the buffer and the
    * queue are population-bounded by the d1+f-wide window, plan-bounded
    * by the sidecar sweep and `cap`-guarded at runtime. Per-band totals
    * carry the band's TRAILING entries (within d1 of its last key — the
    * next band's preceding prefix, merged exactly like the trailing
    * frame), its LEADING entries (within f of its first key — the
    * previous band's forward suffix), and its first/last keys (the
    * driver's suffix-assembly stop bound). Bound kinds: FIXED
    * (integral / day / day-time — linear key distances), or MONTHLY
    * over a DATE key (`monthly = true`: d1/f are MONTH counts and the
    * bounds are `add_months(rk, ∓m)` with LocalDate's clamping —
    * non-strictly monotone over dates since the clamp plateau carries
    * no time-of-day, so each pending row's release bound
    * `add_months(rk, +f)` IS a valid per-arrival release test; ASC
    * only, enforced at parse). Month-forward over TIMESTAMP keys
    * refuses: the ts clamp plateau inverts with time-of-day (see
    * MonthTsDist) and the release/eviction tests would need Spark's
    * forward-only pointer state.
    */
  final case class RunRangeFwd(key: Expression, input: Expression,
      d1: Long, f: Long, desc: Boolean, op: SlideOp,
      cap: Long = Long.MaxValue, monthly: Boolean = false)
      extends RunningFunc {
    override def rowsFrame: Boolean = false
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(key = BindReferences.bindReference(key, in),
        input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new FwdRangeAcc(this)
    /** `cur` is strictly beyond the frame end of a row keyed `rk` —
      * the pending queue's release test.
      */
    private[plans] def beyond(cur: Long, rk: Long): Boolean =
      if (monthly) cur > addMonthsDay(rk, f)
      else {
        val r = if (desc) rk - cur else cur - rk
        (if (r < 0) Long.MaxValue else r) > f
      }
    /** `k` is at-or-after `anchor` in stream order and within the
      * forward reach — the suffix-assembly walk's stop test.
      */
    private[plans] def withinFwdOf(anchor: Long, k: Long): Boolean =
      if (monthly) k >= anchor && k <= addMonthsDay(anchor, f)
      else {
        val r = if (desc) anchor - k else k - anchor
        r >= 0 && r <= f
      }
  }

  /** `add_months` over an epoch-day key — LocalDate's month-end
    * clamping, the same arithmetic Spark's DateAddYMInterval applies.
    */
  private[plans] def addMonthsDay(day: Long, m: Long): Long =
    java.time.LocalDate.ofEpochDay(day).plusMonths(m).toEpochDay

  /** The live buffer + totals accumulator of [[RunRangeFwd]]. Stream
    * distance: `sd(later, earlier)` is the non-negative key distance in
    * STREAM direction (ASC: later − earlier; DESC mirrored); a wrapped
    * (negative) subtraction reads as "farther than any bound".
    */
  private[plans] final class FwdRangeAcc(spec: RunRangeFwd) extends RunAcc {
    import spec.{cap, d1, desc, f, monthly, op}
    private val NullToken: AnyRef = RunSliding.NullToken
    private val keys = new java.util.ArrayDeque[java.lang.Long]()
    private val vals = new java.util.ArrayDeque[AnyRef]()
    // the band's first ≤f-window entries, for the totals' leading part
    private val leadK = new scala.collection.mutable.ArrayBuffer[Long]()
    private val leadV = new scala.collection.mutable.ArrayBuffer[Any]()
    private var firstKey = 0L
    private var lastKey = 0L
    private var any = false
    // set once mergeTotal seeds this acc (the EVAL pass): the leading
    // buffers are only ever read from the totals pass's snapshots, so
    // an eval-pass acc skips their accumulation entirely (mergeTotal
    // seeds firstKey with the previous band's lastKey, which would
    // otherwise anchor a dead, f-window-bounded append per partition)
    private var prefixSeeded = false

    private def sd(later: Long, earlier: Long): Long = {
      val r = if (desc) earlier - later else later - earlier
      if (r < 0) Long.MaxValue else r
    }
    /** Evict entries farther than d1 BEFORE `low` (the oldest key any
      * still-pending row's frame can reach back from). A wrapped
      * (negative) distance of a stream-before entry means the true span
      * exceeds the Long range — certainly > d1, evicted.
      */
    private[plans] def evictBefore(low: Long): Unit = {
      val mLow = if (monthly) addMonthsDay(low, -d1) else 0L
      var go = true
      while (go && !keys.isEmpty) {
        val k = keys.peekFirst().longValue()
        val drop =
          if (monthly) k < mLow
          else {
            val before = if (desc) k >= low else k <= low
            val dist = if (desc) k - low else low - k
            before && (dist < 0 || dist > d1)
          }
        if (drop) {
          keys.removeFirst(); vals.removeFirst()
        } else go = false
      }
    }
    /** One arriving row's (key, value); `low` = oldest pending key.
      * Values are retained here (the consumer evals them from pending
      * rows whose buffers the buffer entries outlive).
      */
    private[plans] def arrive(k: Long, v: Any, low: Long): Unit = {
      evictBefore(low)
      val rv = retain(v)
      keys.addLast(java.lang.Long.valueOf(k))
      vals.addLast(if (rv == null) NullToken else rv.asInstanceOf[AnyRef])
      if (!any) { firstKey = k; any = true }
      lastKey = k
      if (!prefixSeeded && spec.withinFwdOf(firstKey, k)) {
        leadK += k; leadV += rv
      }
      if (keys.size > cap) throw new org.apache.spark.SparkException(
        s"graft range-following frame exceeds $cap live rows per " +
          "function; raise spark.graft.window.maxRangeFrameRows or let " +
          "Spark's spillable window plan this frame")
    }
    /** Frame fold for the pending row at `rk`: buffered entries within
      * the frame, then suffix entries (all strictly after the band)
      * within f.
      */
    private[plans] def foldFor(rk: Long, sufK: Array[Long],
        sufV: Array[Any]): Any = {
      // monthly frame bounds, computed once per pending row
      val mLo = if (monthly) addMonthsDay(rk, -d1) else 0L
      val mHi = if (monthly) addMonthsDay(rk, f) else 0L
      val ki = keys.iterator(); val vi = vals.iterator()
      op.fold(new Iterator[Any] {
        private var si = 0
        private var nextV: Any = _
        private var haveNext = false
        private def inFrame(k: Long): Boolean =
          if (monthly) k >= mLo && k <= mHi
          else {
            // entry before-or-at rk ⇒ within d1; after ⇒ within f
            val back = sd(rk, k)
            if (back != Long.MaxValue) back <= d1 || sd(k, rk) <= f
            else sd(k, rk) <= f
          }
        private def advance(): Unit = {
          while (!haveNext && ki.hasNext) {
            val k = ki.next().longValue()
            val v = vi.next()
            if (inFrame(k)) {
              nextV = if (v eq NullToken) null else v
              haveNext = true
            }
          }
          while (!haveNext && si < sufK.length) {
            val k = sufK(si); val v = sufV(si); si += 1
            val in = if (monthly) k <= mHi else sd(k, rk) <= f
            if (in) { nextV = v; haveNext = true }
          }
        }
        override def hasNext: Boolean = { advance(); haveNext }
        override def next(): Any = {
          advance()
          if (!haveNext) throw new NoSuchElementException
          haveNext = false
          nextV
        }
      })
    }
    override def update(row: InternalRow): Unit = {
      // totals-pass form: no pending queue exists — the oldest key a
      // future row can reach back from is the current key itself
      val k = spec.key.eval(row).asInstanceOf[Number].longValue()
      arrive(k, spec.input.eval(row), k)
    }
    /** (trailing keys, trailing vals, leading keys, leading vals,
      * lastKey | null, firstKey | null).
      */
    override def total(): Any = {
      val tk = new scala.collection.mutable.ArrayBuffer[Any]()
      val tv = new scala.collection.mutable.ArrayBuffer[Any]()
      val mTrail = if (monthly && any) addMonthsDay(lastKey, -d1) else 0L
      val ki = keys.iterator(); val vi = vals.iterator()
      while (ki.hasNext) {
        val k = ki.next().longValue(); val v = vi.next()
        val trail =
          if (monthly) any && k >= mTrail
          else any && sd(lastKey, k) <= d1
        if (trail) {
          tk += k
          tv += (if (v eq NullToken) null else v)
        }
      }
      Array[Any](tk.toArray[Any], tv.toArray[Any],
        leadK.toArray[Any], leadV.toArray[Any],
        if (any) java.lang.Long.valueOf(lastKey) else null,
        if (any) java.lang.Long.valueOf(firstKey) else null)
    }
    /** Prefix fold: the earlier bands' trailing entries seed the buffer
      * (band order); leading parts are consumed by the driver's suffix
      * assembly, not here.
      */
    override def mergeTotal(t: Any): Unit = if (t != null) {
      prefixSeeded = true
      val a = t.asInstanceOf[Array[Any]]
      val tk = a(0).asInstanceOf[Array[Any]]
      val tv = a(1).asInstanceOf[Array[Any]]
      var i = 0
      while (i < tk.length) {
        keys.addLast(java.lang.Long.valueOf(tk(i).asInstanceOf[Long]))
        vals.addLast(if (tv(i) == null) NullToken
          else tv(i).asInstanceOf[AnyRef])
        i += 1
      }
      if (a(4) != null) {
        val lk = a(4).asInstanceOf[java.lang.Long].longValue()
        if (!any) { firstKey = lk; any = true } // prefix only seeds keys
        lastKey = lk
        evictBefore(lk)
      }
    }
    override def value(): Any = null
  }

  /** `lag(x, 1[, default])` — the previous row's value in window order
    * (the constant default at the very first row): the global delta /
    * time-series step shape.
    * Order-sensitive; the prefix is the PRECEDING band's last row value,
    * carried as a (value, sawRows) pair so an earlier band's legitimate
    * null value is distinguishable from an empty prefix and still
    * overrides. Like Spark's own lag, the value among equal order keys
    * follows stream order — deterministic only when the order key is
    * unique (the landing's tiebreak makes the STREAM deterministic, but
    * the assignment within ties is layout-defined, exactly as WindowExec's
    * is partition-defined).
    */
  final case class RunLag(input: Expression, default: Any = null)
      extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var prev: Any = null
      var sawRows = false
      var emitVal: Any = null
      override def update(row: InternalRow): Unit = {
        emitVal = if (sawRows) prev else default
        prev = retain(input.eval(row))
        sawRows = true
      }
      override def total(): Any =
        Array[Any](prev, java.lang.Boolean.valueOf(sawRows))
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        if (a(1).asInstanceOf[java.lang.Boolean].booleanValue()) {
          prev = a(0); sawRows = true
        }
      }
      override def value(): Any = emitVal
    }
  }

  /** `lag(x, n[, default]) IGNORE NULLS` — the n-th most recent
    * NON-NULL value among strictly preceding rows: a deque of the last
    * ≤ n non-null values (nulls never enter), with the emitted value
    * snapshotted BEFORE the current row folds in. The per-band total is
    * the band's last ≤ n non-nulls; prefix merges append in band order
    * and trim from the front — the lag ring's null-skipping twin.
    */
  final case class RunLagNulls(input: Expression, n: Int, default: Any)
      extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val buf = new java.util.ArrayDeque[AnyRef](n)
      private var emitVal: Any = default
      private def push(v: Any): Unit = {
        buf.addLast(v.asInstanceOf[AnyRef])
        if (buf.size > n) buf.removeFirst()
      }
      override def update(row: InternalRow): Unit = {
        emitVal = if (buf.size == n) buf.peekFirst() else default
        val v = input.eval(row)
        if (v != null) push(retain(v))
      }
      override def total(): Any = {
        val out = new Array[Any](buf.size)
        val it = buf.iterator()
        var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        out
      }
      override def mergeTotal(t: Any): Unit = if (t != null)
        t.asInstanceOf[Array[Any]].foreach(push)
      override def value(): Any = emitVal
    }
  }

  /** `lead(x, n[, default]) IGNORE NULLS` — the n-th NON-NULL value
    * strictly after the row: a null run defers the lookahead
    * unboundedly, so no bounded ring evaluates it; instead the exec
    * buffers the PARTITION (rows in the spillable window buffer — the
    * same population Spark's own UnboundedFollowing frame buffers —
    * plus this function's non-null values on the heap, `cap`-guarded)
    * and answers each row by INDEX into the partition's non-null value
    * list: the n-th non-null after row i is global non-null index
    * c_i + n − 1, where c_i counts non-nulls at-or-before i — a
    * two-pointer second pass, O(rows) total. The cross-band SUFFIX is
    * the later bands' first ≤ n non-nulls (this accumulator's total;
    * the totals pass runs over the sorted stream); past the global end
    * the constant default applies. The accumulator never evaluates the
    * function — `value()` is never read.
    */
  final case class RunLeadNulls(input: Expression, n: Int, default: Any,
      cap: Long = Long.MaxValue) extends RunningFunc {
    override def rowsFrame: Boolean = true
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val firsts =
        new scala.collection.mutable.ArrayBuffer[Any](math.min(n, 64))
      override def update(row: InternalRow): Unit =
        if (firsts.length < n) {
          val v = input.eval(row)
          if (v != null) firsts += retain(v)
        }
      override def total(): Any = firsts.toArray[Any]
      override def mergeTotal(t: Any): Unit = if (t != null) {
        // driver prefix-scan fold only — evaluation never reads these
        // offsets; band order tops the window up like the deep-lead one
        val a = t.asInstanceOf[Array[Any]]
        var i = 0
        while (firsts.length < n && i < a.length) { firsts += a(i); i += 1 }
      }
      override def value(): Any = null
    }
  }

  /** Running `last(x, ignoreNulls = true)` — the forward-fill / as-of
    * CARRY: at each row, the most recent non-null value at-or-before it
    * in the window order. Order-sensitive: a band's total is its LAST
    * non-null in sorted order, and the prefix merge lets a later band's
    * non-null total REPLACE an earlier one (nulls pass the carry
    * through) — merged strictly in band order on the driver.
    */
  final case class RunLastNonNull(input: Expression, rowsFrame: Boolean)
      extends RunningFunc {
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var cur: Any = null
      override def update(row: InternalRow): Unit = {
        val v = input.eval(row)
        if (v != null) cur = retain(v)
      }
      override def total(): Any = cur
      override def mergeTotal(t: Any): Unit = if (t != null) cur = t
      override def value(): Any = cur
    }
  }

  /** `first_value(x[, ignoreNulls])` — the stream's first (non-null)
    * value: a backward carry that never changes once set. The prefix
    * merge lets the EARLIEST band's set value win (the exec merges the
    * offset before any row updates, so an earlier band's value blocks
    * later ones — exactly stream order).
    */
  final case class RunFirstValue(input: Expression, ignoreNulls: Boolean,
      rowsFrame: Boolean) extends RunningFunc {
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      var v: Any = null
      var set = false
      override def update(row: InternalRow): Unit = if (!set) {
        val x = input.eval(row)
        if (x != null || !ignoreNulls) { v = retain(x); set = true }
      }
      override def total(): Any =
        Array[Any](v, java.lang.Boolean.valueOf(set))
      override def mergeTotal(t: Any): Unit = if (t != null && !set) {
        val a = t.asInstanceOf[Array[Any]]
        if (a(1).asInstanceOf[java.lang.Boolean].booleanValue()) {
          v = a(0); set = true
        }
      }
      override def value(): Any = v
    }
  }

  /** `nth_value(x, n[, ignoreNulls])` over the cumulative frame — the
    * n-th (non-null) value from the stream's start: null until n
    * qualifying rows arrive, constant after. The prefix is the earlier
    * bands' first ≤ n qualifying values, merged earliest-first.
    */
  final case class RunNth(input: Expression, n: Int, ignoreNulls: Boolean,
      rowsFrame: Boolean) extends RunningFunc {
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val firsts =
        new scala.collection.mutable.ArrayBuffer[Any](math.min(n, 64))
      override def update(row: InternalRow): Unit =
        if (firsts.length < n) {
          val x = input.eval(row)
          if (x != null || !ignoreNulls) firsts += retain(x)
        }
      override def total(): Any = firsts.toArray[Any]
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        var i = 0
        while (firsts.length < n && i < a.length) { firsts += a(i); i += 1 }
      }
      override def value(): Any =
        if (firsts.length >= n) firsts(n - 1) else null
    }
  }

  /** `max_by` / `min_by(value, ordering)` — the running ARGMAX carry:
    * the value at the best non-null ordering seen so far. Strict
    * comparison keeps the FIRST pair among ordering ties in stream
    * order — Spark's own MaxBy/MinBy update posture — which also makes
    * the band-order prefix merge exact (earlier bands merge first, and
    * a later equal ordering never replaces). A null VALUE at the best
    * ordering is a legitimate answer; only null orderings are skipped.
    */
  final case class RunMinMaxBy(valueExpr: Expression, ordExpr: Expression,
      ordType: DataType, isMax: Boolean, rowsFrame: Boolean)
      extends RunningFunc {
    override def orderSensitive: Boolean = true
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(valueExpr = BindReferences.bindReference(valueExpr, in),
        ordExpr = BindReferences.bindReference(ordExpr, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ord = TypeUtils.getInterpretedOrdering(ordType)
      var bestOrd: Any = null
      var bestVal: Any = null
      // STRICT inequality: an equal ordering never replaces — the first
      // pair in stream order wins ties, like Spark's own update
      private def better(o: Any): Boolean = bestOrd == null || {
        val c = ord.compare(o, bestOrd)
        if (isMax) c > 0 else c < 0
      }
      override def update(row: InternalRow): Unit = {
        val o = ordExpr.eval(row)
        if (o != null && better(o)) {
          bestOrd = retain(o)
          bestVal = retain(valueExpr.eval(row))
        }
      }
      override def total(): Any = Array[Any](bestOrd, bestVal)
      override def mergeTotal(t: Any): Unit = if (t != null) {
        val a = t.asInstanceOf[Array[Any]]
        if (a(0) != null && better(a(0))) {
          bestOrd = a(0); bestVal = a(1)
        }
      }
      override def value(): Any = bestVal
    }
  }

  final case class RunMinMax(input: Expression, dt: DataType,
      isMin: Boolean, rowsFrame: Boolean) extends RunningFunc {
    override def bound(in: Seq[Attribute]): RunningFunc =
      copy(input = BindReferences.bindReference(input, in))
    override def newAcc(grand: Any): RunAcc = new RunAcc {
      private val ord = TypeUtils.getInterpretedOrdering(dt)
      var cur: Any = null
      private def fold(v: Any): Unit =
        if (cur == null || (ord.compare(v, cur) < 0) == isMin)
          cur = retain(v)
      override def update(row: InternalRow): Unit = {
        val v = input.eval(row)
        if (v != null) fold(v)
      }
      override def total(): Any = cur
      override def mergeTotal(t: Any): Unit = if (t != null) fold(t)
      override def value(): Any = cur
    }
  }
}

/** Per-partition running-window evaluation over an order-claiming child
  * (the strategy guarantees the child streams each partition in
  * `orderSpec` order, partitions globally ordered). `partitionTotals`:
  * per-partition per-function totals from the SIDECAR, or None — then
  * one narrow pass computes them (below the per-band sort when one
  * exists: totals are order-free). Tie groups buffer in a spillable
  * UnsafeRow array (all-equal-keys is memory-bounded the same way
  * Spark's own WindowExec partitions are).
  */
case class BandRunningWindowExec(windowExprs: Seq[NamedExpression],
    funcs: Seq[RunningWindow.RunningFunc], orderSpec: Seq[SortOrder],
    partitionTotals: Option[Seq[Array[Any]]], child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] =
    child.output ++ windowExprs.map(_.toAttribute)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    // columns the computed-totals pass actually decoded (0 = metadata
    // prefix, no pass at all) — the narrowing observability hook
    "totalsPassColumns" -> SQLMetrics.createMetric(sparkContext,
      "totals pass columns"))

  override def stringArgs: Iterator[Any] = Iterator(
    windowExprs.map(_.name).mkString("[", ", ", "]"),
    orderSpec.mkString("[", ", ", "]"),
    if (partitionTotals.isDefined) "prefix=metadata" else "prefix=computed")

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)

  /** The totals pass never needs the per-band sort (totals are
    * order-free) — run it below a local SortExec when that is the
    * direct child shape.
    */
  private def unsortedChild(p: SparkPlan): SparkPlan = p match {
    case s: SortExec if !s.global => s.child
    case w: WholeStageCodegenExec => unsortedChild(w.child)
    case _ => p
  }

  /** A column-pruned clone of the totals pass's plan: the second stream
    * over the data (or over the whole merge-join chain — q192's 2×-IO
    * shape) re-reads the same files and partitions but CONVERTS only
    * the columns the accumulators fold, instead of the query's full
    * output. Structure-preserving: same partitioning, same merge keys,
    * same filters; None for any shape it can't prove (the caller runs
    * the full plan — never wrong, just unpruned).
    */
  private def narrowTotalsPlan(p: SparkPlan,
      needed: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[SparkPlan] = p match {
    case w: WholeStageCodegenExec => narrowTotalsPlan(w.child, needed)
    case a: org.apache.spark.sql.execution.InputAdapter =>
      narrowTotalsPlan(a.child, needed)
    case s: SortExec if !s.global =>
      narrowTotalsPlan(s.child, needed ++
        org.apache.spark.sql.catalyst.expressions.AttributeSet(
          s.sortOrder.flatMap(_.references)))
        .map(SortExec(s.sortOrder, global = false, _))
    case pr: org.apache.spark.sql.execution.ProjectExec =>
      val kept = pr.projectList.filter(ne => needed.contains(ne.toAttribute))
      if (kept.isEmpty) None
      else narrowTotalsPlan(pr.child,
        org.apache.spark.sql.catalyst.expressions.AttributeSet(
          kept.flatMap(_.references)))
        .map(org.apache.spark.sql.execution.ProjectExec(kept, _))
    case f: org.apache.spark.sql.execution.FilterExec =>
      narrowTotalsPlan(f.child, needed ++ f.condition.references)
        .map(org.apache.spark.sql.execution.FilterExec(f.condition, _))
    case o: OrderedBandScanExec
        if o.scan != null && o.scan.partCols.isEmpty &&
          o.scan.pushedAggs.isEmpty &&
          // a pushed sort/top-N could reference a column the pruning
          // drops — the narrowed reader would then fail to bind its
          // sort ordering; those modes run the unpruned plan instead
          o.scan.pushedSorts.isEmpty && o.scan.pushedTopN < 0 =>
      val keep = needed ++
        org.apache.spark.sql.catalyst.expressions.AttributeSet(
          o.sortOrder.flatMap(_.references))
      val kept = o.output.filter(keep.contains)
      if (kept.isEmpty || kept.length == o.output.length) None
      else Some(o.copy(output = kept,
        scan = o.scan.pruneTo(kept.map(_.name))))
    case m: RangeMergeJoinExec => m.narrowForTotals(needed)
    case _ => None
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    val bound = funcs.map(_.bound(childOut))
    val totals: Seq[Array[Any]] = partitionTotals.getOrElse {
      // carry functions' totals depend on row order: their pass must see
      // the sorted stream; order-free totals run below the local sort
      val base =
        if (bound.exists(_.orderSensitive)) child else unsortedChild(child)
      // …and CONVERTS only the columns the accumulators read: the
      // narrowed clone streams the same partitions with the rest of the
      // query's columns left undecoded (totals snapshots are plain
      // values, so binding against the narrow output changes nothing
      // downstream)
      val needed = org.apache.spark.sql.catalyst.expressions.AttributeSet(
        windowExprs.flatMap(_.references))
      val (tPlan, tBound) = narrowTotalsPlan(base, needed) match {
        case Some(np) if needed.subsetOf(np.outputSet) =>
          (np, funcs.map(_.bound(np.output)))
        case _ => (base, bound)
      }
      longMetric("totalsPassColumns") += tPlan.output.length
      sparkContext.runJob(tPlan.execute(),
        (it: Iterator[InternalRow]) => {
          val accs = tBound.map(_.newAcc())
          it.foreach(r => accs.foreach(_.update(r)))
          accs.map(_.total()).toArray
        }).toSeq
    }
    // driver-side exclusive prefix scan: offsets(i) = fold of totals < i
    val scanAccs = bound.map(_.newAcc())
    val offsets: Array[Array[Any]] = totals.indices.map { i =>
      val off = scanAccs.map(_.total()).toArray
      scanAccs.zip(totals(i)).foreach { case (a, t) => a.mergeTotal(t) }
      off
    }.toArray
    // ...and the GRAND fold (every partition merged) — the global N the
    // size-based rank family divides by
    val grands: Array[Any] = scanAccs.map(_.total()).toArray
    // lead's carry flows BACKWARD: partition i's last row reads the
    // FIRST input value of the next non-empty partition — wired as a
    // per-partition suffix (lead blocks the metadata path, so `totals`
    // here are always the computed ones holding each band's first value)
    val leadIdxs: Array[Int] = bound.zipWithIndex
      .collect { case (_: RunningWindow.RunLead, j) => j }.toArray
    val leadSuffixes: Array[Array[Any]] =
      if (leadIdxs.isEmpty) null
      else Array.tabulate(totals.length) { i =>
        leadIdxs.map { j =>
          totals.drop(i + 1).iterator
            .map(_(j).asInstanceOf[Array[Any]])
            .collectFirst {
              case a if a(1).asInstanceOf[java.lang.Boolean].booleanValue() =>
                a(0)
            }.getOrElse( // no later band has rows: the global last row —
              // the constant default is what fell off the end
              bound(j).asInstanceOf[RunningWindow.RunLead].default)
        }
      }
    // deep leads (n ≥ 2): emission delays behind an n-slot ring; each
    // partition's SUFFIX is the concatenation of the LATER partitions'
    // first-n values (each RunLeadN total is its band's first ≤ n input
    // values), padded to exactly n with the constant default — the
    // values the partition's last n rows read from beyond its end
    val deepIdxs: Array[Int] = bound.zipWithIndex
      .collect { case (_: RunningWindow.RunLeadN, j) => j }.toArray
    val deepSuffixes: Array[Array[Array[Any]]] =
      if (deepIdxs.isEmpty) null
      else Array.tabulate(totals.length) { i =>
        deepIdxs.map { j =>
          val f = bound(j).asInstanceOf[RunningWindow.RunLeadN]
          val out = new Array[Any](f.n)
          var z = 0
          while (z < f.n) { out(z) = f.default; z += 1 }
          var k = 0
          totals.drop(i + 1).iterator
            .map(_(j).asInstanceOf[Array[Any]])
            .takeWhile(_ => k < f.n)
            .foreach { a =>
              var q = 0
              while (k < f.n && q < a.length) { out(k) = a(q); k += 1; q += 1 }
            }
          out
        }
      }
    // bounded-FOLLOWING frames also ride the delay ring: a partition's
    // forward SUFFIX per function is the LATER partitions' first-m
    // values concatenated (each RunSlidingFwd total = (last n, first m))
    // — default-free, the global end just clips the frame
    // lead IGNORE NULLS: per-partition SUFFIX = the later partitions'
    // first ≤ n non-null values concatenated (each total is its band's
    // firsts) — default-free; past the global end the constant default
    // applies at read time
    val lnIdxs: Array[Int] = bound.zipWithIndex
      .collect { case (_: RunningWindow.RunLeadNulls, j) => j }.toArray
    // suffix min/max: the LATER bands' fold per partition — a scalar
    // assembled from the per-band totals (sidecar-free on the metadata
    // path), seeding each partition's backward fold array
    val smIdxs: Array[Int] = bound.zipWithIndex
      .collect { case (_: RunningWindow.RunSuffixMinMax, j) => j }.toArray
    val smLaters: Array[Array[Any]] =
      if (smIdxs.isEmpty) null
      else Array.tabulate(totals.length) { i =>
        smIdxs.map { j =>
          val f = bound(j).asInstanceOf[RunningWindow.RunSuffixMinMax]
          val ord = TypeUtils.getInterpretedOrdering(f.dt)
          var acc: Any = null
          totals.drop(i + 1).foreach { t =>
            val v = t(j)
            if (v != null &&
              (acc == null || (ord.compare(v, acc) < 0) == f.isMin))
              acc = v
          }
          acc
        }
      }
    val lnSuffixes: Array[Array[Array[Any]]] =
      if (lnIdxs.isEmpty) null
      else Array.tabulate(totals.length) { i =>
        lnIdxs.map { j =>
          val f = bound(j).asInstanceOf[RunningWindow.RunLeadNulls]
          val buf = new scala.collection.mutable.ArrayBuffer[Any](
            math.min(f.n, 64))
          totals.drop(i + 1).iterator
            .map(_(j).asInstanceOf[Array[Any]])
            .takeWhile(_ => buf.length < f.n)
            .foreach { a =>
              var q = 0
              while (buf.length < f.n && q < a.length) {
                buf += a(q); q += 1
              }
            }
          buf.toArray[Any]
        }
      }
    // value-based FOLLOWING frames: per-partition forward SUFFIX per
    // function = the later partitions' LEADING (key, value) entries up
    // to this partition's lastKey + f, assembled from the totals
    // (leading arrays ascend across bands, so the walk stops at the
    // first beyond-bound entry; a wrapped distance reads as beyond)
    val vfIdxs: Array[Int] = bound.zipWithIndex
      .collect { case (_: RunningWindow.RunRangeFwd, j) => j }.toArray
    val vfSuffixes: Array[Array[(Array[Long], Array[Any])]] =
      if (vfIdxs.isEmpty) null
      else Array.tabulate(totals.length) { i =>
        vfIdxs.map { j =>
          val fn = bound(j).asInstanceOf[RunningWindow.RunRangeFwd]
          val ks = new scala.collection.mutable.ArrayBuffer[Long]()
          val vs = new scala.collection.mutable.ArrayBuffer[Any]()
          val myLast = totals(i)(j).asInstanceOf[Array[Any]](4)
          if (myLast != null) {
            val lastK = myLast.asInstanceOf[java.lang.Long].longValue()
            var stop = false
            val it = totals.iterator.drop(i + 1)
            while (!stop && it.hasNext) {
              val a = it.next()(j).asInstanceOf[Array[Any]]
              val lk = a(2).asInstanceOf[Array[Any]]
              val lv = a(3).asInstanceOf[Array[Any]]
              var q = 0
              while (!stop && q < lk.length) {
                val k = lk(q).asInstanceOf[Long]
                if (fn.withinFwdOf(lastK, k)) {
                  ks += k; vs += lv(q); q += 1
                } else stop = true
              }
            }
          }
          (ks.toArray, vs.toArray)
        }
      }
    val fwdIdxs: Array[Int] = bound.zipWithIndex
      .collect { case (_: RunningWindow.RunSlidingFwd, j) => j }.toArray
    val fwdSuffixes: Array[Array[Array[Any]]] =
      if (fwdIdxs.isEmpty) null
      else Array.tabulate(totals.length) { i =>
        fwdIdxs.map { j =>
          val f = bound(j).asInstanceOf[RunningWindow.RunSlidingFwd]
          val buf = new scala.collection.mutable.ArrayBuffer[Any](
            math.min(f.m, 64))
          totals.drop(i + 1).iterator
            .map(_(j).asInstanceOf[Array[Any]](1).asInstanceOf[Array[Any]])
            .takeWhile(_ => buf.length < f.m)
            .foreach { a =>
              var q = 0
              while (buf.length < f.m && q < a.length) {
                buf += a(q); q += 1
              }
            }
          buf.toArray[Any]
        }
      }
    val ordering = new LazilyGeneratedOrdering(orderSpec, childOut)
    val schema = output
    val inMemT = conf.windowExecBufferInMemoryThreshold
    val spillT = conf.windowExecBufferSpillThreshold
    val spillSize = conf.windowExecBufferSpillSizeThreshold
    val rows = longMetric("numOutputRows")
    val rdd = child.execute()
    require(partitionTotals.isEmpty ||
      rdd.getNumPartitions == totals.length,
      s"band window prefix count ${totals.length} != " +
        s"${rdd.getNumPartitions} partitions")
    rdd.mapPartitionsWithIndex { (i, iter0) =>
      val accs = bound.zip(grands).map { case (f, g) => f.newAcc(g) }
      accs.zip(offsets(i)).foreach { case (a, o) => a.mergeTotal(o) }
      // lead IGNORE NULLS: buffer the partition FIRST (rows in the
      // spillable window buffer, each function's non-null values on the
      // heap, cap-guarded) — every row then answers by INDEX into the
      // non-null list (see RunLeadNulls); the stream the rest of the
      // pipeline sees is the buffered replay, same rows same order
      val lnFuncs: Array[RunningWindow.RunLeadNulls] = lnIdxs.map(j =>
        bound(j).asInstanceOf[RunningWindow.RunLeadNulls])
      val lnSuffix: Array[Array[Any]] =
        if (lnIdxs.isEmpty) null else lnSuffixes(i)
      val lnCnt = new Array[Long](lnIdxs.length)
      val smFuncs: Array[RunningWindow.RunSuffixMinMax] = smIdxs.map(j =>
        bound(j).asInstanceOf[RunningWindow.RunSuffixMinMax])
      val smLater: Array[Any] = if (smIdxs.isEmpty) null else smLaters(i)
      // suffix-fold arrays, built backward after the buffering pass
      var smSuffix: Array[Array[Any]] = null
      val lnPass: (Iterator[InternalRow], Array[Array[Any]]) =
        if (lnIdxs.isEmpty && smIdxs.isEmpty) (iter0, null)
        else {
          val pbuf = new ExternalAppendOnlyUnsafeRowArray(inMemT,
            spillSize, spillT, spillSize)
          val collected = lnFuncs.map(_ =>
            new scala.collection.mutable.ArrayBuffer[Any])
          val smCollected = smFuncs.map(_ =>
            new scala.collection.mutable.ArrayBuffer[Any])
          while (iter0.hasNext) {
            val r = iter0.next().asInstanceOf[UnsafeRow]
            var p = 0
            while (p < lnIdxs.length) {
              val v = lnFuncs(p).input.eval(r)
              if (v != null) {
                collected(p) += RunningWindow.retain(v)
                if (collected(p).length > lnFuncs(p).cap)
                  throw new org.apache.spark.SparkException(
                    s"graft lead-ignore-nulls buffer exceeds " +
                      s"${lnFuncs(p).cap} values; raise " +
                      "spark.graft.window.maxRangeFrameRows or let " +
                      "Spark's spillable window plan this function")
              }
              p += 1
            }
            p = 0
            while (p < smIdxs.length) {
              smCollected(p) += RunningWindow.retain(
                smFuncs(p).input.eval(r))
              if (smCollected(p).length > smFuncs(p).cap)
                throw new org.apache.spark.SparkException(
                  s"graft suffix-min/max buffer exceeds " +
                    s"${smFuncs(p).cap} values; raise " +
                    "spark.graft.window.maxRangeFrameRows or let " +
                    "Spark's spillable window plan this function")
              p += 1
            }
            pbuf.add(r)
          }
          smSuffix = smFuncs.zipWithIndex.map { case (f, p) =>
            val ord = TypeUtils.getInterpretedOrdering(f.dt)
            val vals = smCollected(p)
            val out = new Array[Any](vals.length)
            var acc: Any = smLater(p)
            var q = vals.length - 1
            while (q >= 0) {
              val v = vals(q)
              if (v != null &&
                (acc == null || (ord.compare(v, acc) < 0) == f.isMin))
                acc = v
              out(q) = acc
              q -= 1
            }
            out
          }
          (pbuf.generateIterator(), collected.map(_.toArray[Any]))
        }
      val iter = lnPass._1
      val lnVals = lnPass._2
      // per-partition row index + tie-group start index for the
      // suffix-fold reads (ROWS form reads its own row; RANGE form the
      // group's first)
      var pbRowIdx = 0
      var groupStartIdx = 0
      // lead is rows-framed but evaluated by LOOKAHEAD (n = 1) or the
      // delay ring (n ≥ 2), not through its accumulator — exclude both
      // from the per-row update set
      val perRow = bound.zipWithIndex.filter(f => f._1.rowsFrame &&
        !f._1.isInstanceOf[RunningWindow.RunLead] &&
        !f._1.isInstanceOf[RunningWindow.RunLeadN] &&
        !f._1.isInstanceOf[RunningWindow.RunLeadNulls] &&
        !f._1.isInstanceOf[RunningWindow.RunSuffixMinMax]).map(_._2)
      val leadInputs: Array[Expression] = leadIdxs.map(j =>
        bound(j).asInstanceOf[RunningWindow.RunLead].input)
      val leadSuffix: Array[Any] =
        if (leadIdxs.isEmpty) null else leadSuffixes(i)
      val deepFuncs: Array[RunningWindow.RunLeadN] = deepIdxs.map(j =>
        bound(j).asInstanceOf[RunningWindow.RunLeadN])
      val deepSuffix: Array[Array[Any]] =
        if (deepIdxs.isEmpty) null else deepSuffixes(i)
      val fwdFuncs: Array[RunningWindow.RunSlidingFwd] = fwdIdxs.map(j =>
        bound(j).asInstanceOf[RunningWindow.RunSlidingFwd])
      val fwdAccs: Array[RunningWindow.FwdAcc] = fwdIdxs.map(j =>
        accs(j).asInstanceOf[RunningWindow.FwdAcc])
      val fwdSuffix: Array[Array[Any]] =
        if (fwdIdxs.isEmpty) null else fwdSuffixes(i)
      val vfFuncs: Array[RunningWindow.RunRangeFwd] = vfIdxs.map(j =>
        bound(j).asInstanceOf[RunningWindow.RunRangeFwd])
      val vfAccs: Array[RunningWindow.FwdRangeAcc] = vfIdxs.map(j =>
        accs(j).asInstanceOf[RunningWindow.FwdRangeAcc])
      val vfSuffix: Array[(Array[Long], Array[Any])] =
        if (vfIdxs.isEmpty) null else vfSuffixes(i)
      val deep = deepIdxs.nonEmpty || fwdIdxs.nonEmpty || vfIdxs.nonEmpty
      val atStart = bound.zipWithIndex
        .filter(f => !f._1.rowsFrame && f._1.groupStart).map(_._2)
      // RANGE-FOLLOWING funcs are group-scoped semantically but
      // evaluated by the pending-queue consumer, not at group end
      val atEnd = bound.zipWithIndex
        .filter(f => !f._1.rowsFrame && !f._1.groupStart &&
          !f._1.isInstanceOf[RunningWindow.RunRangeFwd]).map(_._2)
      val groupScoped = atStart ++ atEnd
      val buf = new ExternalAppendOnlyUnsafeRowArray(inMemT, spillSize,
        spillT, spillSize)
      val winRow = new GenericInternalRow(bound.length)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(schema, schema)
      // the deep-lead path emits DELAYED carriers (copied row + its
      // window values) instead of projected rows — type-erased so the
      // common path stays allocation-free per row
      val inner: Iterator[AnyRef] = new Iterator[AnyRef] {
        private val groupVals = new Array[Any](bound.length)
        private var pending: UnsafeRow = _
        private var emit: Iterator[AnyRef] = Iterator.empty

        private def loadGroup(): Unit = {
          buf.clear()
          val first =
            if (pending != null) pending
            else iter.next().asInstanceOf[UnsafeRow].copy()
          pending = null
          groupStartIdx = pbRowIdx // the group's rows emit from here
          atStart.foreach(j => groupVals(j) = accs(j).value())
          buf.add(first)
          groupScoped.foreach(j => accs(j).update(first))
          var open = true
          while (open && iter.hasNext) {
            val r = iter.next().asInstanceOf[UnsafeRow]
            if (ordering.compare(first, r) == 0) {
              buf.add(r)
              groupScoped.foreach(j => accs(j).update(r))
            } else { pending = r.copy(); open = false }
          }
          atEnd.foreach(j => groupVals(j) = accs(j).value())
          // lead's one-row lookahead: a second iterator over the same
          // buffer, one position ahead; the group's last row reads
          // `pending` (the next group's first row, already copied) or,
          // at partition end, the next band's first value (the suffix)
          val ahead =
            if (leadIdxs.isEmpty) null else buf.generateIterator(1)
          emit = buf.generateIterator().map { row =>
            val wr =
              if (deep) new GenericInternalRow(bound.length) else winRow
            var k = 0
            while (k < bound.length) { wr(k) = groupVals(k); k += 1 }
            perRow.foreach { j =>
              accs(j).update(row)
              wr(j) = accs(j).value()
            }
            if (ahead != null) {
              val nxt: InternalRow =
                if (ahead.hasNext) ahead.next() else pending
              var p = 0
              while (p < leadIdxs.length) {
                val x =
                  if (nxt != null) leadInputs(p).eval(nxt)
                  else leadSuffix(p)
                // the deep path DELAYS projection behind the ring: a
                // value eval'd from the lookahead row (a reused spill
                // buffer past the next advance) must be retained; the
                // common path projects immediately and stays copy-free
                wr(leadIdxs(p)) = if (deep) RunningWindow.retain(x) else x
                p += 1
              }
            }
            // lead IGNORE NULLS reads the partition's non-null list by
            // index: the n-th non-null strictly after this row is
            // global non-null index c+n−1 (c counts non-nulls
            // at-or-before it); past the list, the suffix; past the
            // global end, the constant default. All values are already
            // retained/stable — safe to hold across the deep delay.
            if (lnIdxs.length > 0) {
              var p = 0
              while (p < lnIdxs.length) {
                if (lnFuncs(p).input.eval(row) != null) lnCnt(p) += 1
                val target = lnCnt(p) + lnFuncs(p).n - 1
                val vals = lnVals(p)
                wr(lnIdxs(p)) =
                  if (target < vals.length) vals(target.toInt)
                  else {
                    val s = target - vals.length
                    if (s < lnSuffix(p).length) lnSuffix(p)(s.toInt)
                    else lnFuncs(p).default
                  }
                p += 1
              }
            }
            // suffix min/max read the precomputed backward fold: ROWS
            // at this row's index, RANGE at its tie group's first
            if (smIdxs.length > 0) {
              var p = 0
              while (p < smIdxs.length) {
                val at = if (smFuncs(p).rowsForm) pbRowIdx
                  else groupStartIdx
                wr(smIdxs(p)) = smSuffix(p)(at)
                p += 1
              }
            }
            if (lnIdxs.length > 0 || smIdxs.length > 0) pbRowIdx += 1
            if (deep)
              new RunningWindow.PendingRow(
                row.asInstanceOf[UnsafeRow].copy(), wr)
            else {
              rows += 1
              proj(joined(row, wr)): AnyRef
            }
          }
        }

        override def hasNext: Boolean = {
          while (!emit.hasNext && (pending != null || iter.hasNext))
            loadGroup()
          emit.hasNext
        }
        override def next(): AnyRef = {
          if (!hasNext) throw new NoSuchElementException
          emit.next()
        }
      }
      if (!deep) inner.asInstanceOf[Iterator[InternalRow]]
      else if (vfIdxs.nonEmpty) new Iterator[InternalRow] {
        // the VALUE-RELEASED PENDING QUEUE (RANGE FOLLOWING frames;
        // delayCompatible guarantees no ring funcs coexist): a pending
        // row releases once an arrival's key is strictly beyond its
        // key + fMax — all of every frame has then arrived (keys only
        // ascend in stream order) — or at partition end, where the
        // forward suffix supplies the next bands' leading entries.
        // Mid-band releases never need the suffix (suffix keys exceed
        // the band's last key, hence every mid-band frame's bound).
        private val pending =
          new java.util.ArrayDeque[RunningWindow.PendingRow]()
        private val pendKeys = new java.util.ArrayDeque[java.lang.Long]()
        private val keyExpr = vfFuncs(0).key
        private val vfCap = vfFuncs(0).cap
        private val emptyK = new Array[Long](0)
        private val emptyV = new Array[Any](0)
        private var curKey = 0L
        private var haveCur = false
        // a pending row releases once the arrival is strictly beyond
        // EVERY function's frame end for it (fixed: rk + f; monthly:
        // add_months(rk, +f) — monotone over date keys)
        private def releasable(cur: Long, rk: Long): Boolean = {
          var p = 0
          while (p < vfFuncs.length) {
            if (!vfFuncs(p).beyond(cur, rk)) return false
            p += 1
          }
          true
        }
        private def release(atEndOfPartition: Boolean): InternalRow = {
          val pr = pending.removeFirst()
          val rk = pendKeys.removeFirst().longValue()
          var p = 0
          while (p < vfIdxs.length) {
            pr.vals(vfIdxs(p)) =
              if (atEndOfPartition)
                vfAccs(p).foldFor(rk, vfSuffix(p)._1, vfSuffix(p)._2)
              else vfAccs(p).foldFor(rk, emptyK, emptyV)
            p += 1
          }
          rows += 1
          proj(joined(pr.row, pr.vals))
        }
        override def hasNext: Boolean = !pending.isEmpty || inner.hasNext
        override def next(): InternalRow = {
          while (true) {
            if (!pending.isEmpty && haveCur &&
              releasable(curKey, pendKeys.peekFirst().longValue()))
              return release(atEndOfPartition = false)
            if (!inner.hasNext) {
              if (pending.isEmpty) throw new NoSuchElementException
              return release(atEndOfPartition = true)
            }
            val pr = inner.next().asInstanceOf[RunningWindow.PendingRow]
            val k = keyExpr.eval(pr.row).asInstanceOf[Number].longValue()
            pending.addLast(pr)
            pendKeys.addLast(java.lang.Long.valueOf(k))
            if (pending.size > vfCap)
              throw new org.apache.spark.SparkException(
                s"graft range-following pending queue exceeds $vfCap " +
                  "rows; raise spark.graft.window.maxRangeFrameRows or " +
                  "let Spark's spillable window plan this frame")
            val low = pendKeys.peekFirst().longValue()
            var p = 0
            while (p < vfIdxs.length) {
              vfAccs(p).arrive(k, vfFuncs(p).input.eval(pr.row), low)
              p += 1
            }
            curKey = k
            haveCur = true
          }
          throw new IllegalStateException("unreachable")
        }
      }
      else new Iterator[InternalRow] {
        // the deep-lead DELAY RING: a row emits when the row nMax
        // positions ahead arrives (func j's slot was filled when row
        // +n_j arrived — n_j ≤ nMax, so a popped row is complete), or at
        // partition end from the suffix. A slot's source row is still in
        // the ring (or a driver-held suffix constant) at projection
        // time, so its buffer-backed values are valid until the
        // projection copies them.
        private val nMax = (deepFuncs.map(_.n) ++ fwdFuncs.map(_.m)).max
        private val cap = nMax + 1
        private val ring = new Array[RunningWindow.PendingRow](cap)
        private var start = 0
        private var count = 0
        private var flushPos = -1

        private def emitRow(pr: RunningWindow.PendingRow): InternalRow = {
          rows += 1
          proj(joined(pr.row, pr.vals))
        }

        override def hasNext: Boolean = count > 0 || inner.hasNext

        override def next(): InternalRow = {
          while (flushPos < 0 && inner.hasNext) {
            val pr = inner.next().asInstanceOf[RunningWindow.PendingRow]
            ring((start + count) % cap) = pr
            count += 1
            // the new arrival is func j's source for the row n_j back
            var p = 0
            while (p < deepIdxs.length) {
              val off = count - 1 - deepFuncs(p).n
              if (off >= 0)
                ring((start + off) % cap).vals(deepIdxs(p)) =
                  deepFuncs(p).input.eval(pr.row)
              p += 1
            }
            // …and COMPLETES the frame of the row m_j back for every
            // FOLLOWING-frame func: the acc's deque (updated by this
            // arrival already) is exactly that row's frame
            p = 0
            while (p < fwdIdxs.length) {
              val off = count - 1 - fwdFuncs(p).m
              if (off >= 0)
                ring((start + off) % cap).vals(fwdIdxs(p)) =
                  fwdAccs(p).foldFill()
              p += 1
            }
            if (count == cap) {
              val out = ring(start)
              ring(start) = null
              start = (start + 1) % cap
              count -= 1
              return emitRow(out)
            }
          }
          // partition exhausted: flush the ≤ nMax delayed rows; slots
          // whose source never arrived (n_j rows past the end) read the
          // suffix — later bands' first values, default-padded
          if (count == 0) throw new NoSuchElementException
          if (flushPos < 0) flushPos = 0
          val pr = ring((start + flushPos) % cap)
          val d = count - 1 - flushPos // rows after this one
          var p = 0
          while (p < deepIdxs.length) {
            val n = deepFuncs(p).n
            if (n > d) pr.vals(deepIdxs(p)) = deepSuffix(p)(n - d - 1)
            p += 1
          }
          // FOLLOWING-frame rows whose +m row never arrived fold their
          // in-partition tail plus the forward suffix
          p = 0
          while (p < fwdIdxs.length) {
            if (fwdFuncs(p).m > d)
              pr.vals(fwdIdxs(p)) = fwdAccs(p).foldFlush(d, fwdSuffix(p))
            p += 1
          }
          flushPos += 1
          val out = emitRow(pr)
          if (flushPos >= count) count = 0
          out
        }
      }
    }
  }
}
