package graft.plans

import org.apache.spark.{Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Literal, NullsFirst, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Sort}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning, SinglePartition}
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.execution.{FilterExec, LeafExecNode, ProjectExec, SortExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.aggregate.AggUtils
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.ingest.v2.{ExtJsonInputPartition, ExtJsonScan, OrderedBandGroup}

/** EXCHANGE-FREE global `ORDER BY` over a range-landed document drop —
  * the planner rung the zone-map `sorted` proof exists for: when the
  * sidecar proves the scan's surviving files form strictly-disjoint,
  * internally-sorted key bands
  * ([[graft.sink.CorpusSink.landJsonlRangeIndexed]] writes exactly this
  * layout), a global sort whose FIRST key is that band key never pays
  * the range Exchange — at 100 TB the single largest cost of a sorted
  * materialization. The strategy replaces `Sort(global)` over the scan
  * with [[OrderedBandScanExec]] (one sequential reader per band, bands
  * in key order — reversed for DESC — claiming `RangePartitioning` over
  * the requested order; strict band disjointness makes the claim honest
  * for the FULL order: the first key alone decides every cross-band
  * comparison):
  *
  *  - single ASC NULLS FIRST key: the layout IS the sort — no SortExec
  *    at all, rows stream out in global order;
  *  - DESC, or extra tiebreak keys: a per-band LOCAL SortExec reorders
  *    within bands (memory-bounded by the band, spillable, shuffle-free)
  *    — the exchange, not the comparator, is what a 100 TB sort pays
  *    for, and it is gone in every accepted shape.
  *
  * The transformation is EXACT (band order ∘ in-band order = global
  * order; pushed filters only remove rows; the proof's null-freedom
  * makes null-ordering vacuous), so unlike the approximate
  * similarity-join strategy it needs no opt-in conf — any unprovable
  * condition (unindexed/stale/unsorted/nullable files, non-column first
  * key, a merge group wider than the FD budget) falls through to the
  * ordinary sort. OVERLAPPING bands (each `appendTag` batch computes
  * its own percentile boundaries, so appended ranges overlap earlier
  * ones) no longer refuse: overlap components k-way merge their proven
  * sorted file streams inside one partition — the exchange-free ORDER
  * BY survives the append-mostly lifecycle of a real corpus.
  * `Sort + Limit` shapes never reach here — Spark's own
  * TakeOrderedAndProject plans them first, composing with the scan's
  * pushed top-N and the sorted-scan early exit instead.
  */
object OrderedScanStrategy {

  /** The operators a band-layout rewrite may be separated from its scan
    * relation by without being defeated — both preserve in-partition row
    * order and the band partitioning claim: an ALIAS-FREE Project (pure
    * column selection/permutation — the shape V2ScanRelationPushDown
    * leaves above a pruned scan when the SELECT order differs from the
    * read-schema order; an aliasing Project would rebind exprIds the
    * sort order references) and a deterministic residual Filter (removal
    * never reorders; nondeterministic conditions are row-order-sensitive
    * and must not be re-staged). SQL text (`SELECT b, a FROM t ORDER BY
    * a`) routinely plans these intermediates where the DataFrame idiom
    * `.orderBy(...).select(...)` does not — without the peel, the SQL
    * twin of the same query silently pays the full range Exchange.
    */
  private[plans] def peel(p: LogicalPlan,
      above: List[LogicalPlan]): Option[(DataSourceV2ScanRelation, List[LogicalPlan])] =
    p match {
      case rel: DataSourceV2ScanRelation => Some((rel, above))
      case pr: Project
          if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
        peel(pr.child, pr :: above)
      case f: Filter if f.condition.deterministic =>
        peel(f.child, f :: above)
      case _ => None
    }

  /** Re-stage the peeled intermediates in their ORIGINAL nesting:
    * `above` accumulates by prepending during the descent, so its HEAD
    * is the innermost node — foldLeft wraps the base innermost-first,
    * reproducing the logical chain exactly. (The former foldRight
    * INVERTED the nesting: row content survived — attribute-only
    * Projects and exprId binding keep the column sets honest — but a
    * Filter hoisted above a Project that dropped one of its referenced
    * columns failed to bind at execution: `SELECT b … WHERE <residual
    * on a> ORDER BY b` with `a` pruned away.) Filter/Project over
    * attributes preserve both ordering claims and the RangePartitioning
    * in either nesting; the original one also always binds.
    */
  private[plans] def restage(above: List[LogicalPlan],
      base: SparkPlan): SparkPlan =
    above.foldLeft(base) {
      case (child, pr: Project) => ProjectExec(pr.projectList, child)
      case (child, f: Filter) => FilterExec(f.condition, child)
      case (_, other) => throw new IllegalStateException(
        s"unpeelable node ${other.nodeName}")
    }
}

class OrderedScanStrategy(session: SparkSession) extends SparkStrategy {
  import OrderedScanStrategy.{peel, restage}

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: Sort if s.global && s.order.nonEmpty =>
      (s.order.head, peel(s.child, Nil)) match {
        case (first @ SortOrder(attr: AttributeReference,
            Ascending | Descending, _, _), Some((rel, above))) =>
          rel.scan match {
            case scan: ExtJsonScan
              if rel.output.exists(_.exprId == attr.exprId) &&
                s.order.forall(_.references.subsetOf(s.child.outputSet)) =>
              scan.orderedBandPartitions(attr.name) match {
                case Some(bands) if bands.nonEmpty =>
                  val desc = first.direction == Descending
                  val ordered =
                    OrderedBandScanExec(rel.output, s.order, scan,
                      if (desc) bands.reverse else bands,
                      // the read streams rows ASC in-band: only the
                      // single-ASC-NULLS-FIRST shape may claim the
                      // requested ordering verbatim (null ordering is
                      // vacuous — the proof is null-free — but the
                      // claim must still match the ask exactly)
                      claimOrdering = !desc && s.order.length == 1 &&
                        first.nullOrdering == NullsFirst)
                  val chain = restage(above, ordered)
                  if (ordered.claimOrdering) chain :: Nil
                  else SortExec(s.order, global = false, chain) :: Nil
                case _ => Nil
              }
            case _ => Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }
}

/** EXCHANGE-FREE grouped aggregation over a range-landed drop — the
  * time-series-rollup rung: a drop landed by
  * [[graft.sink.CorpusSink.landJsonlRangeIndexed]] on a key (a day
  * number, an id) and read with `rangeAggregation=true` aggregates
  * `GROUP BY key, …` in ONE stage: the band layout already clusters
  * equal keys into one partition (strict group disjointness — equal
  * keys never straddle bands), so partial and final aggregation run
  * back-to-back over [[OrderedBandScanExec]] with NO shuffle between
  * them. At 100 TB the ordinary plan's aggregation exchange — the whole
  * cost of a rollup after the scan — is gone. The physical pair comes
  * from Spark's own `AggUtils.planAggregateWithoutDistinct`, exactly
  * what the builtin strategy would plan, just over a child whose
  * partitioning claim satisfies the final aggregate's clustered
  * distribution.
  *
  * Opt-in PER READ (the `rangeAggregation` option) because it is a
  * mode CHOICE, not an approximation: the scan refuses pushed
  * aggregation partials so the Aggregate survives to this strategy
  * (the q161 storage-partitioned precedent — layout beats pushdown
  * when the layout covers the grouping), and with few wide bands the
  * band-parallel local aggregation trades parallelism for the
  * exchange. Sound only when the grouping set CONTAINS the band key as
  * a bare attribute (equal grouping tuples then share the key, hence
  * the band); unproven layouts and non-key groupings fall through to
  * Spark's ordinary aggregation. DISTINCT aggregates over ONE distinct
  * column set plan too (`AggUtils.planAggregateWithOneDistinct`): every
  * stage of the four-exec distinct pipeline clusters on a SUPERSET of
  * the grouping, which the band claim satisfies — `COUNT(DISTINCT x)
  * GROUP BY key` pays neither of its two ordinary exchanges, because
  * equal keys (hence equal (key, x) pairs) never straddle bands.
  */
class RangeAggStrategy(session: SparkSession) extends SparkStrategy {
  import OrderedScanStrategy.{peel, restage}
  import org.apache.spark.sql.catalyst.expressions.AttributeReference
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
  import org.apache.spark.sql.catalyst.planning.PhysicalAggregation

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PhysicalAggregation(groupingExprs, aggExprs, resultExprs, child)
        if groupingExprs.nonEmpty &&
          aggExprs.forall(_.isInstanceOf[AggregateExpression]) =>
      peel(child, Nil) match {
        case Some((rel, above)) =>
          rel.scan match {
            case scan: ExtJsonScan if scan.rangeAggregation =>
              // the band key: a grouping attribute whose layout the
              // sidecar proves into strictly-disjoint sorted groups
              val keyed = groupingExprs.collectFirst {
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
                  val aggs = aggExprs.map(_.asInstanceOf[AggregateExpression])
                  val (distinct, plain) = aggs.partition(_.isDistinct)
                  if (distinct.isEmpty)
                    AggUtils.planAggregateWithoutDistinct(
                      groupingExprs, aggs, resultExprs,
                      restage(above, bands))
                  else {
                    // ONE distinct column set (several functions may
                    // share it — the shape the optimizer's Expand
                    // rewrite leaves single): the whole four-exec
                    // distinct pipeline clusters on supersets of the
                    // grouping, which the band claim satisfies — the
                    // distinct rollup's BOTH exchanges are gone. More
                    // than one distinct set never reaches a strategy.
                    val sets = distinct.map(
                      _.aggregateFunction.children.filterNot(_.foldable)
                        .map(_.canonicalized)).distinct
                    // normalize floats exactly where Spark's own
                    // Aggregation strategy does: the partial group-by
                    // keys on the distinct expressions, and without the
                    // normalization 0.0/-0.0 (and NaN bit patterns)
                    // would dedup as DISTINCT values — a silent
                    // divergence from the engine's own answer. Nested
                    // float-bearing distinct types refuse (Spark
                    // normalizes them structurally; rare enough that
    // falling back beats replicating that machinery).
                    def floaty(dt: org.apache.spark.sql.types.DataType): Boolean = {
                      import org.apache.spark.sql.types._
                      dt match {
                        case DoubleType | FloatType => true
                        case st: StructType =>
                          st.fields.exists(f => floaty(f.dataType))
                        case at: ArrayType => floaty(at.elementType)
                        case mt: MapType =>
                          floaty(mt.keyType) || floaty(mt.valueType)
                        case _ => false
                      }
                    }
                    val distinctExprs = distinct.head.aggregateFunction
                      .children.filterNot(_.foldable)
                    if (sets.length != 1 || sets.head.isEmpty ||
                      distinctExprs.exists(e => floaty(e.dataType) &&
                        e.dataType != org.apache.spark.sql.types.DoubleType &&
                        e.dataType != org.apache.spark.sql.types.FloatType))
                      Nil
                    else {
                      import org.apache.spark.sql.catalyst.expressions.{EqualTo, If, IsNaN}
                      def norm(e: org.apache.spark.sql.catalyst.expressions.Expression) =
                        e.dataType match {
                          case org.apache.spark.sql.types.DoubleType =>
                            If(IsNaN(e), Literal(Double.NaN),
                              If(EqualTo(e, Literal(0.0d)), Literal(0.0d), e))
                          case org.apache.spark.sql.types.FloatType =>
                            If(IsNaN(e), Literal(Float.NaN),
                              If(EqualTo(e, Literal(0.0f)), Literal(0.0f), e))
                          case _ => e
                        }
                      val named = distinctExprs.map(e => norm(e) match {
                        case ne: org.apache.spark.sql.catalyst.expressions.NamedExpression => ne
                        case other =>
                          org.apache.spark.sql.catalyst.expressions
                            .Alias(other, e.toString)()
                      })
                      AggUtils.planAggregateWithOneDistinct(
                        groupingExprs, distinct, plain, distinctExprs,
                        named, resultExprs, restage(above, bands))
                    }
                  }
                case None => Nil
              }
            case _ => Nil
          }
        case None => Nil
      }
    case _ => Nil
  }
}

/** One GROUP = one partition; groups ordered by the requested direction.
  * `outputPartitioning` claims what the sidecar proved: group ranges are
  * strictly disjoint (equal first keys never straddle groups, so the
  * first key decides every cross-group comparison under the FULL
  * requested order), making `RangePartitioning(sortOrder)` honest for
  * ordered and clustered distributions alike. A one-file group reads
  * sequentially in offset order; a group of OVERLAPPING per-file sorted
  * bands (the append lifecycle) k-way heap-merges its file streams —
  * but only under `claimOrdering` (single ASC NULLS FIRST key), where
  * the merged stream IS the requested order; every other shape gets a
  * local SortExec above (the strategy adds it), which subsumes any
  * in-group merge — those groups just concatenate.
  */
case class OrderedBandScanExec(output: Seq[Attribute],
    sortOrder: Seq[SortOrder], @transient scan: ExtJsonScan,
    @transient groups: Seq[OrderedBandGroup],
    claimOrdering: Boolean) extends LeafExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def outputPartitioning: Partitioning =
    if (groups.length == 1) SinglePartition
    else RangePartitioning(sortOrder, groups.length)

  override def outputOrdering: Seq[SortOrder] =
    if (claimOrdering) sortOrder else Nil

  override def simpleStringWithNodeId(): String =
    s"OrderedBandScan(${sortOrder.mkString(", ")}, bands=${groups.length}" +
      s", merged=${groups.count(_.files.lengthCompare(1) > 0)})"

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = StructType(output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    // the merge comparator, bound to the scan output — claimOrdering
    // implies a single ASC key, so the generated ordering IS the full
    // requested order
    val ordering =
      if (claimOrdering)
        Some(new org.apache.spark.sql.catalyst.expressions.codegen
          .LazilyGeneratedOrdering(sortOrder, output))
      else None
    new OrderedBandRDD(session.sparkContext, scan.createReaderFactory(),
      groups.map(_.files), schema, ordering, longMetric("numOutputRows"))
  }
}

private final class BandPartition(override val index: Int,
    val files: Seq[Seq[ExtJsonInputPartition]]) extends Partition

/** The two stream shapes every band consumer shares — the ordered scan's
  * RDD and the range merge join's sides.
  */
private[plans] object BandStreams {

  /** One file's rows in file order: its splits chained, each reader
    * closed EAGERLY at exhaustion — a wide band chops into many splits
    * and one open stream per split held to task completion would
    * exhaust file descriptors; the completion listener stays as the
    * failure-path (task-killed mid-band) safety net, and Hadoop stream
    * close is idempotent.
    */
  def fileRows(factory: PartitionReaderFactory,
      splits: Seq[ExtJsonInputPartition],
      context: TaskContext): Iterator[InternalRow] =
    splits.iterator.flatMap { p =>
      val reader = factory.createReader(p)
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; reader.close() }
      context.addTaskCompletionListener[Unit](_ => closeOnce())
      new Iterator[InternalRow] {
        private var ready = false
        private var done = false
        override def hasNext: Boolean = {
          if (!ready && !done) {
            ready = reader.next()
            if (!ready) { done = true; closeOnce() }
          }
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          ready = false
          reader.get()
        }
      }
    }

  /** K-way merge of per-file sorted streams under `ord`. Each stream
    * gets its OWN projection (projections reuse their target buffer)
    * and every buffered head is a copy — one live copy per stream;
    * rows come out as UnsafeRows in `schema` order.
    */
  def merged(factory: PartitionReaderFactory,
      files: Seq[Seq[ExtJsonInputPartition]], schema: StructType,
      ord: Ordering[InternalRow],
      context: TaskContext): Iterator[InternalRow] = {
    final class Stream(it: Iterator[InternalRow]) {
      private val proj = UnsafeProjection.create(schema)
      var head: InternalRow = _
      def advance(): Boolean =
        it.hasNext && { head = proj(it.next()).copy(); true }
    }
    val pq = new java.util.PriorityQueue[Stream](files.length,
      (a: Stream, b: Stream) => ord.compare(a.head, b.head))
    files.foreach { splits =>
      val s = new Stream(fileRows(factory, splits, context))
      if (s.advance()) pq.add(s)
    }
    new Iterator[InternalRow] {
      override def hasNext: Boolean = !pq.isEmpty
      override def next(): InternalRow = {
        val s = pq.poll()
        val r = s.head
        if (s.advance()) pq.add(s)
        r
      }
    }
  }

  /** One SIDE's globally key-sorted stream: its disjoint groups in min
    * order, each group sequential (one file) or k-way merged (several).
    */
  def sideRows(factory: PartitionReaderFactory,
      groups: Seq[OrderedBandGroup], schema: StructType,
      ord: Ordering[InternalRow],
      context: TaskContext): Iterator[InternalRow] =
    groups.iterator.flatMap { g =>
      if (g.files.lengthCompare(1) <= 0)
        g.files.iterator.flatMap(fileRows(factory, _, context))
      else merged(factory, g.files, schema, ord, context)
    }
}

/** Reads each group's files; a file's splits stream SEQUENTIALLY in
  * offset order — byte order is row order for JSONL, so the
  * concatenation preserves the file's proven sortedness whatever byte
  * granularity the scan planned (block pruning may have cut mid-file
  * ranges; removal never reorders). Multi-file groups k-way merge when
  * an ordering is supplied (heads are COPIED UnsafeRows — readers reuse
  * their row objects, and a buffered head outlives its reader's next
  * advance), else concatenate.
  */
private final class OrderedBandRDD(
    sc: org.apache.spark.SparkContext,
    factory: PartitionReaderFactory,
    @transient groups: Seq[Seq[Seq[ExtJsonInputPartition]]],
    schema: StructType,
    ordering: Option[Ordering[InternalRow]],
    rowCount: SQLMetric)
    extends RDD[InternalRow](sc, Nil) {

  override protected def getPartitions: Array[Partition] =
    groups.indices.map(i => new BandPartition(i, groups(i))).toArray

  override def compute(split: Partition,
      context: TaskContext): Iterator[InternalRow] = {
    val files = split.asInstanceOf[BandPartition].files
    val out: Iterator[InternalRow] = ordering match {
      case Some(ord) if files.lengthCompare(1) > 0 =>
        BandStreams.merged(factory, files, schema, ord, context)
      case _ =>
        val proj = UnsafeProjection.create(schema)
        files.iterator.flatMap(BandStreams.fileRows(factory, _, context))
          .map(proj)
    }
    out.map { r => rowCount += 1; r }
  }
}
