package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.{Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, AttributeReference, BasePredicate, BoundReference, EqualTo, Expression, GenericInternalRow, JoinedRow, Predicate, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning, SinglePartition, UnknownPartitioning}
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.ingest.v2.{ExtJsonScan, FilterEval, OrderedBandGroup}

/** ZERO-exchange, ZERO-sort equi-join of RANGE-LANDED document drops
  * — the range-layout analogue of the storage-partitioned join: when the
  * zone-map sidecars prove every side's files internally sorted and
  * groupable into strictly-disjoint key bands on their join keys
  * ([[graft.sink.CorpusSink.landJsonlRangeIndexed]] writes exactly this
  * layout; co-band with its `bounds` parameter for aligned parallelism),
  * the equi-join — INNER, LEFT OUTER, LEFT SEMI, LEFT ANTI (the
  * decontamination shape: "drop every document whose key appears in the
  * benchmark drop", otherwise a full-shuffle anti-join), RIGHT OUTER
  * (planned as the mirrored LEFT OUTER with a final row-local
  * projection back to the declared attribute order — the preserved
  * side streams as the merge base, so ordering/partitioning claims
  * hold on the RIGHT key), or FULL OUTER
  * (the snapshot-diff shape: matched, left-only, and right-only rows in
  * one pass, otherwise a shuffle-and-sort of BOTH corpora) — plans as a
  * streamed MERGE JOIN over band-aligned partitions: each partition
  * reads the files whose key ranges overlap ITS range and nothing else.
  * At 100 TB the ordinary plan shuffles every corpus and sorts every
  * side; this plan reads each side once, in place, already ordered —
  * and whole one-sided key ranges prune at plan time: right-only ranges
  * for every left-typed join (no left row to emit), left-only ranges
  * for INNER/SEMI (no match possible), while OUTER/ANTI keep them as
  * right-empty partitions (their left rows are exactly the match-less
  * output) and FULL OUTER keeps every populated component (right-only
  * ranges are its null-extended output). A FULL OUTER step drops the
  * output's key-ordering and range-partitioning claims (right-only
  * rows carry a null left key) and nothing chains on top of it.
  *
  * The match admits the shapes real SQL leaves between a join and its
  * scans — none of which defeats the layout proof:
  *
  *  - an ALIAS-FREE Project (pure column selection/permutation — the
  *    residue V2ScanRelationPushDown leaves above a pruned scan) and a
  *    deterministic residual Filter on EITHER side: a pushed-only
  *    Filter preserves sortedness and band disjointness alike (the join
  *    needs no completeness, unlike the window's metadata path), so
  *    both re-stage INSIDE the merge partitions, before the merge;
  *  - a CONJUNCTIVE condition `l.k = r.k AND <residual>`: the merge
  *    runs on the provable band-key equality and evaluates the
  *    remaining conjuncts per candidate pair — TRUE joins, FALSE/NULL
  *    does not, uniformly across all four join types (Spark's own ON
  *    semantics; `NOT IN`'s null-tolerant `Or(=, isnull(=))` shape is
  *    not a conjunct of an EqualTo and correctly refuses);
  *  - a JOIN CHAIN `(A ⋈ B) ⋈ C` whose every equality binds the SAME
  *    base left key (by exprId): the chained merge streams the inner
  *    join's key-ordered output straight into the next merge — N
  *    co-landed drops join end-to-end with ZERO exchanges, where the
  *    ordinary plan pays a shuffle per hop. Alias-free Projects /
  *    deterministic Filters between the joins re-stage between steps.
  *
  * Partition construction is the cross-side overlap sweep over ALL
  * sides at once: every side's disjoint band groups, min-sorted
  * together, coalesce into components separated by strict key gaps
  * ACROSS ALL SIDES — so a key present anywhere in component i can
  * never find a join partner outside it (sound for ANY band layouts;
  * matching `bounds` just makes components fine-grained).
  *
  * The transformation is EXACT (key equality under null-free proven
  * keys — which also makes the null-key semantics of every left-typed
  * join vacuous), so like [[OrderedScanStrategy]] it needs no opt-in
  * conf; any unprovable condition falls through to Spark's own join
  * planning. A USER HINT on either side also refuses — a broadcast hint
  * must keep meaning broadcast. Float/double keys arrive wrapped in
  * normalization (`KnownFloatingPointNormalized`) by Spark's own rule
  * and fall through correctly: the raw layout's total order
  * distinguishes -0.0 from 0.0, which the normalized equality must not.
  */
class RangeMergeJoinStrategy(session: SparkSession) extends SparkStrategy
    with PredicateHelper {
  import RangeMergeJoinStrategy._

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: Join => matchChain(j) match {
      case Some(chain) => buildExec(chain) :: Nil
      case None => Nil
    }
    case _ => Nil
  }

  /** The chain matcher exposed for COMPOSING strategies: the band
    * window strategy accepts a provable merge-join chain as its ordered,
    * range-partitioned child (a running window over q185's
    * enrich+decontaminate chain would otherwise re-collapse the chain's
    * zero-exchange stream into one partition).
    */
  private[plans] def planChain(j: Join): Option[RangeMergeJoinExec] =
    matchChain(j).map(buildExec)

  /** Peel the operators a merge side may be separated from its scan by:
    * alias-free Projects and deterministic Filters (outermost-first in
    * the returned list). DYNAMIC-PRUNING conjuncts (the runtime filters
    * Spark injects expecting its own shuffle join) are DROPPED, not
    * re-staged: they are pruning hints, semantically redundant by
    * construction — Spark itself replaces an unusable one with `true`
    * (PlanDynamicPruningFilters), and the band alignment already prunes
    * one-sided ranges at plan time. Any OTHER plan-bearing expression
    * (a subquery) refuses the peel — it cannot evaluate row-local.
    */
  private def peelOps(p: LogicalPlan,
      acc: List[LogicalPlan]): (LogicalPlan, List[LogicalPlan]) = p match {
    case pr: Project
        if pr.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      peelOps(pr.child, pr :: acc)
    case f: Filter if f.condition.deterministic =>
      val (dpp, rest) = splitConjunctivePredicates(f.condition)
        .partition(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.DynamicPruning])
      if (rest.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])))
        (p, acc) // a true subquery: stop — the side will refuse
      else if (rest.isEmpty) peelOps(f.child, acc)
      else if (dpp.isEmpty) peelOps(f.child, f :: acc)
      else peelOps(f.child, Filter(rest.reduce(And), f.child) :: acc)
    case other => (other, acc)
  }

  private def peelSide(p: LogicalPlan): Option[Side] = {
    val (core, ops) = peelOps(p, Nil)
    core match {
      case rel: DataSourceV2ScanRelation => rel.scan match {
        case s: ExtJsonScan =>
          Some(Side(rel, s,
            ops.collect { case f: Filter => f.condition }, p.output))
        case _ => None
      }
      case _ => None
    }
  }

  /** Match a join (possibly a left-deep chain of joins) over peelable
    * range-landed scans. Every join's condition must contain one
    * provable band-key equality conjunct; for chained joins the
    * left-side key must be the SAME base attribute (exprId) — the
    * stream each step emits is ordered and range-partitioned on it.
    */
  private def matchChain(j: Join): Option[Chain] = j match {
    // RIGHT OUTER is the LEFT OUTER with sides swapped: re-match the
    // mirrored join (the merge then streams the PRESERVED side as its
    // base — ordered and range-partitioned on the right key) and keep
    // the original output attribute order; the exec's final projection
    // remaps the swapped stream layout to it. Right-semi/anti have no
    // SQL surface (Spark canonicalizes both to left), so this one arm
    // closes the outer-join family.
    case Join(l, r, RightOuter, Some(cond), hint) =>
      matchChain(Join(r, l, LeftOuter, Some(cond),
        JoinHint(hint.rightHint, hint.leftHint)))
        .map(_.copy(output = j.output))
    case Join(l, r, jt @ (Inner | LeftOuter | LeftSemi | LeftAnti |
        FullOuter), Some(cond), hint) if hint == JoinHint.NONE =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (!conjuncts.forall(c => c.deterministic && !c.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.PlanExpression[_]])))
        return None
      peelSide(r).flatMap { rSide =>
        val (lCore, lOps) = peelOps(l, Nil)
        val lOut = l.outputSet

        def orient(e: Expression): Option[(AttributeReference, AttributeReference)] =
          e match {
            case EqualTo(a: AttributeReference, b: AttributeReference) =>
              if (lOut.contains(a) && rSide.output.exists(_.exprId == b.exprId))
                Some((a, b))
              else if (lOut.contains(b) &&
                rSide.output.exists(_.exprId == a.exprId)) Some((b, a))
              else None
            case _ => None
          }

        def residualOf(chosen: Expression): Option[Expression] = {
          val rest = conjuncts.filterNot(_ eq chosen)
          if (rest.isEmpty) None else Some(rest.reduce(And))
        }

        def rightGroups(rk: AttributeReference): Option[Seq[OrderedBandGroup]] =
          if (rSide.rel.output.exists(_.exprId == rk.exprId))
            rSide.scan.orderedBandPartitions(rk.name).filter(_.nonEmpty)
          else None

        lCore match {
          case lj: Join =>
            // nothing chains ON TOP of a FULL OUTER step: its right-only
            // rows carry a NULL left key, so the stream is no longer
            // key-ordered/null-free — the contract every later merge
            // step relies on
            matchChain(lj).filterNot(
              _.steps.exists(_.joinType == FullOuter)).flatMap { inner =>
              conjuncts.iterator.flatMap { c =>
                orient(c).flatMap { case (lk, rk) =>
                  if (lk.exprId == inner.keyAttr.exprId &&
                    lk.dataType == rk.dataType)
                    rightGroups(rk).map(g =>
                      inner.copy(
                        steps = inner.steps :+ ChainStep(jt, rSide, g, rk,
                          residualOf(c), lOps),
                        output = j.output))
                  else None
                }
              }.nextOption()
            }
          case _ =>
            peelSide(l).flatMap { lSide =>
              conjuncts.iterator.flatMap { c =>
                orient(c).flatMap { case (lk, rk) =>
                  if (lk.dataType == rk.dataType &&
                    lSide.rel.output.exists(_.exprId == lk.exprId))
                    lSide.scan.orderedBandPartitions(lk.name)
                      .filter(_.nonEmpty).flatMap { lg =>
                        rightGroups(rk).map { rg =>
                          Chain(lk.dataType, lk, lSide, lg,
                            List(ChainStep(jt, rSide, rg, rk,
                              residualOf(c), Nil)),
                            j.output)
                        }
                      }
                  else None
                }
              }.nextOption()
            }
        }
      }
    case _ => None
  }
}

private[plans] object RangeMergeJoinStrategy {

  /** One relation side after peeling: the scan, the peeled residual
    * filter conjuncts (over the scan's raw output), and the side's
    * logical output (post alias-free projection).
    */
  final case class Side(rel: DataSourceV2ScanRelation,
      scan: ExtJsonScan, filters: Seq[Expression], output: Seq[Attribute])

  /** One chained join step: its type, right side + proven groups, the
    * right key, the residual condition (over prev-output ++ right
    * output), and the interstitial ops peeled between this join and the
    * previous one (outermost-first, as peeled).
    */
  final case class ChainStep(joinType: JoinType, side: Side,
      groups: Seq[OrderedBandGroup], rightKey: AttributeReference,
      residual: Option[Expression], pre: List[LogicalPlan])

  final case class Chain(keyType: DataType, keyAttr: AttributeReference,
      base: Side, baseGroups: Seq[OrderedBandGroup],
      steps: List[ChainStep], output: Seq[Attribute])

  private[plans] def buildExec(c: Chain): RangeMergeJoinExec = {
    val sides = MergeSideExec(c.base, c.keyAttr) +:
      c.steps.map(s => MergeSideExec(s.side, s.rightKey))
    val steps = c.steps.map { s =>
      MergeStepExec(s.joinType, s.residual,
        // peelOps accumulates by PREPENDING during the descent, so the
        // list is already innermost-first — exactly the application
        // order (a Filter below a Project must run before it, or its
        // referenced-but-projected-away columns would fail to bind)
        s.pre.map {
          case pr: Project => StreamProject(
            pr.projectList.map(_.asInstanceOf[AttributeReference]))
          case f: Filter => StreamFilter(f.condition)
          case other => throw new IllegalStateException(
            s"unpeelable interstitial ${other.nodeName}")
        })
    }
    val keepWhenEmpty =
      // FULL OUTER emits right-only rows too: every component with any
      // content anywhere must survive plan-time pruning (an empty base
      // side still yields the right side null-extended)
      if (c.steps.exists(_.joinType == FullOuter))
        Seq.fill(c.steps.length + 1)(true)
      else false +: c.steps.map(s =>
        s.joinType == LeftOuter || s.joinType == LeftAnti)
    val parts = RangeMergeJoinExec.alignN(c.keyType,
      c.baseGroups +: c.steps.map(_.groups), keepWhenEmpty)
    val keyInOutput = c.output.find(_.exprId == c.keyAttr.exprId)
      .getOrElse(c.keyAttr)
    RangeMergeJoinExec(c.keyType, c.output, sides, steps,
      SortOrder(keyInOutput, Ascending), parts)
  }
}

/** One merge side, serializable up to the transient scan: the scan's
  * raw output, the peeled filters over it, the side's logical output,
  * and the key's ordinal in both.
  */
final case class MergeSideExec(relOutput: Seq[Attribute],
    output: Seq[Attribute], filters: Seq[Expression],
    relKeyOrdinal: Int, outKeyOrdinal: Int,
    @transient scan: ExtJsonScan)

private[plans] object MergeSideExec {
  def apply(s: RangeMergeJoinStrategy.Side,
      key: AttributeReference): MergeSideExec =
    MergeSideExec(s.rel.output, s.output, s.filters,
      s.rel.output.indexWhere(_.exprId == key.exprId),
      s.output.indexWhere(_.exprId == key.exprId), s.scan)
}

/** Interstitial stream ops re-staged between chained merge steps —
  * exactly the peelable set: a deterministic filter and an alias-free
  * projection (both row-order- and claim-preserving).
  */
sealed trait StreamOp extends Serializable
final case class StreamFilter(cond: Expression) extends StreamOp
final case class StreamProject(out: Seq[Attribute]) extends StreamOp

final case class MergeStepExec(joinType: JoinType,
    residual: Option[Expression], preOps: Seq[StreamOp])

object RangeMergeJoinExec {

  /** The cross-side overlap sweep over N sides: every side's
    * strictly-disjoint, min-sorted groups coalesce into components
    * separated by strict key gaps across ALL sides. A component is
    * DROPPED at plan time when it cannot emit: base side empty (no left
    * rows), or a later side empty whose step is INNER/SEMI (its join
    * annuls the stream); OUTER/ANTI steps keep their side-empty
    * components — their left rows are exactly the match-less output.
    * Returns per-component, per-side group lists (side order = input).
    */
  private[plans] def alignN(dt: DataType,
      sides: Seq[Seq[OrderedBandGroup]],
      keepWhenEmpty: Seq[Boolean]): Seq[Seq[Seq[OrderedBandGroup]]] = {
    val n = sides.length
    val tagged: Seq[(Int, OrderedBandGroup)] =
      sides.zipWithIndex.flatMap { case (gs, i) => gs.map(i -> _) }
        .sortWith((x, y) =>
          FilterEval.compareInternal(dt, x._2.min, y._2.min) < 0)
    val out = Seq.newBuilder[Seq[Seq[OrderedBandGroup]]]
    val cur = Array.fill(n)(List.empty[OrderedBandGroup])
    var curMax: Any = null
    def flush(): Unit =
      if ((0 until n).forall(i => keepWhenEmpty(i) || cur(i).nonEmpty) &&
        (0 until n).exists(cur(_).nonEmpty))
        out += cur.toIndexedSeq.map(_.reverse)
    tagged.foreach { case (side, g) =>
      if (curMax != null && FilterEval.compareInternal(dt, g.min, curMax) > 0) {
        flush()
        (0 until n).foreach(cur(_) = Nil)
        curMax = null
      }
      cur(side) ::= g
      if (curMax == null ||
        FilterEval.compareInternal(dt, g.max, curMax) > 0) curMax = g.max
    }
    flush()
    out.result()
  }

  /** Back-compat 2-way alignment (property tests exercise it directly):
    * (left groups, right groups) per component.
    */
  private[plans] def align(dt: DataType, left: Seq[OrderedBandGroup],
      right: Seq[OrderedBandGroup], keepLeftOnly: Boolean = false)
      : Seq[(Seq[OrderedBandGroup], Seq[OrderedBandGroup])] =
    alignN(dt, Seq(left, right), Seq(false, keepLeftOnly))
      .map(p => (p(0), p(1)))
}

/** One aligned component = one partition; output rows stream in
  * base-key ASC order (the merge order), claimed via `outputOrdering`;
  * partitions own strictly-disjoint key ranges, claimed via
  * `RangePartitioning` on that key — both honest for the same reason
  * the ordered scan's claims are (equal keys never straddle
  * components). A chained plan folds its steps inside the SAME
  * partition: the inner merge's key-ordered stream feeds the next
  * step's left input directly — no materialization between steps.
  */
case class RangeMergeJoinExec(keyType: DataType,
    output: Seq[Attribute], sides: Seq[MergeSideExec],
    steps: Seq[MergeStepExec], leftKeyOrder: SortOrder,
    @transient parts: Seq[Seq[Seq[OrderedBandGroup]]])
    extends LeafExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def outputPartitioning: Partitioning =
    if (parts.isEmpty) UnknownPartitioning(0)
    else if (parts.length == 1) SinglePartition
    else if (steps.exists(_.joinType == FullOuter))
      // right-only rows carry a NULL left key — neither the range claim
      // nor the key ordering is honest for the full-outer stream
      UnknownPartitioning(parts.length)
    else RangePartitioning(Seq(leftKeyOrder), parts.length)

  override def outputOrdering: Seq[SortOrder] =
    if (steps.exists(_.joinType == FullOuter)) Nil else Seq(leftKeyOrder)

  override def simpleStringWithNodeId(): String =
    s"RangeMergeJoin(${steps.map(_.joinType).mkString("+")}, " +
      s"${leftKeyOrder.child}, partitions=${parts.length}" +
      (if (steps.exists(_.residual.isDefined)) ", residual" else "") +
      (if (sides.exists(_.filters.nonEmpty) ||
        steps.exists(_.preOps.nonEmpty)) ", restaged" else "") + ")"

  override protected def doExecute(): RDD[InternalRow] = {
    val factories = sides.map(_.scan.createReaderFactory())
    new RangeMergeChainRDD(sparkContext, keyType,
      sides.toArray, factories.toArray, steps.toArray, output,
      parts, longMetric("numOutputRows"))
  }

  /** A column-pruned clone for the band window's TOTALS pass: the chain
    * streams the same partitions and merges on the same keys, but every
    * side reads only the columns the pass folds — `needed` plus the
    * structural set (side keys, side filters, residuals, interstitial
    * stream filters). None when a side carries partition columns (the
    * reader's schema then stops mirroring the side output) — the caller
    * falls back to the full chain, never wrong.
    */
  private[plans] def narrowForTotals(
      needed: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Option[RangeMergeJoinExec] = {
    if (sides.exists(s => s.scan == null || s.scan.partCols.nonEmpty))
      return None
    val keep = scala.collection.mutable.Set.empty[
      org.apache.spark.sql.catalyst.expressions.ExprId]
    needed.foreach(a => keep += a.exprId)
    sides.foreach { s =>
      keep += s.relOutput(s.relKeyOrdinal).exprId
      s.filters.foreach(_.references.foreach(keep += _.exprId))
    }
    steps.foreach { st =>
      st.residual.foreach(_.references.foreach(keep += _.exprId))
      st.preOps.foreach {
        case StreamFilter(c) => c.references.foreach(keep += _.exprId)
        case _ => ()
      }
    }
    val nSides = sides.map { s =>
      val keyId = s.relOutput(s.relKeyOrdinal).exprId
      val relOut = s.relOutput.filter(a => keep(a.exprId))
      val out = s.output.filter(a => keep(a.exprId))
      MergeSideExec(relOut, out, s.filters,
        relOut.indexWhere(_.exprId == keyId),
        out.indexWhere(_.exprId == keyId),
        s.scan.pruneTo(relOut.map(_.name)))
    }
    val nSteps = steps.map { st =>
      st.copy(preOps = st.preOps.map {
        case StreamProject(o) => StreamProject(o.filter(a => keep(a.exprId)))
        case f => f
      })
    }
    Some(copy(output = output.filter(a => keep(a.exprId)),
      sides = nSides, steps = nSteps))
  }
}

private final class ChainPartition(override val index: Int,
    val groups: Seq[Seq[OrderedBandGroup]]) extends Partition

/** The streamed merge chain over one aligned component: each side's
  * groups concatenate (disjoint, min-ordered) with in-group k-way
  * merges where a side's own bands overlap — so every input arrives
  * key-sorted and null-free (the sidecar proof) and the classic
  * run-buffered merge applies, then the steps fold left-to-right
  * inside the partition.
  *
  * ROW-BUFFER CONTRACT: every iterator in the chain (side streams,
  * projections, and the join iterators' own output) promises only the
  * standard Spark row-iterator contract — a returned row stays valid
  * until the NEXT call on THAT iterator. The join iterators are safe
  * under that contract on both inputs: the single held left row is
  * always projected BEFORE its stream advances, right rows are copied
  * into the run buffer before the right stream advances, and each
  * iterator's output lives in its own projection buffer. No step
  * requires fresh-allocating readers.
  */
private final class RangeMergeChainRDD(
    sc: org.apache.spark.SparkContext, keyType: DataType,
    sides: Array[MergeSideExec], factories: Array[PartitionReaderFactory],
    steps: Array[MergeStepExec], outAttrs: Seq[Attribute],
    @transient parts: Seq[Seq[Seq[OrderedBandGroup]]],
    rowCount: SQLMetric)
    extends RDD[InternalRow](sc, Nil) {

  override protected def getPartitions: Array[Partition] =
    parts.indices.map(i => new ChainPartition(i, parts(i))).toArray

  private def toStruct(attrs: Seq[Attribute]): StructType =
    StructType(attrs.map(a => StructField(a.name, a.dataType, a.nullable)))

  private def cmpKeys(a: Any, b: Any): Int =
    FilterEval.compareInternal(keyType, a, b)

  override def compute(split: Partition,
      context: TaskContext): Iterator[InternalRow] = {
    val p = split.asInstanceOf[ChainPartition]

    def sideStream(i: Int): Iterator[InternalRow] = {
      val s = sides(i)
      val relSchema = toStruct(s.relOutput)
      val ord: Ordering[InternalRow] = new LazilyGeneratedOrdering(Seq(
        SortOrder(BoundReference(s.relKeyOrdinal, keyType,
          nullable = false), Ascending)))
      var it = BandStreams.sideRows(factories(i), p.groups(i), relSchema,
        ord, context)
      if (s.filters.nonEmpty) {
        val pred = Predicate.create(s.filters.reduce(And), s.relOutput)
        pred.initialize(split.index)
        it = it.filter(pred.eval)
      }
      if (s.output.map(_.exprId) != s.relOutput.map(_.exprId)) {
        val proj = UnsafeProjection.create(s.output.map { a =>
          val ix = s.relOutput.indexWhere(_.exprId == a.exprId)
          BoundReference(ix, a.dataType,
            a.nullable || s.relOutput(ix).nullable): Expression
        })
        it = it.map(proj)
      }
      it
    }

    var cur = sideStream(0)
    var attrs = sides(0).output
    var keyOrd = sides(0).outKeyOrdinal
    val keyExprId = attrs(keyOrd).exprId
    steps.zipWithIndex.foreach { case (st, k) =>
      st.preOps.foreach {
        case StreamFilter(c) =>
          val pred = Predicate.create(c, attrs)
          pred.initialize(split.index)
          cur = cur.filter(pred.eval)
        case StreamProject(out) =>
          val in = attrs
          val proj = UnsafeProjection.create(out.map { a =>
            val ix = in.indexWhere(_.exprId == a.exprId)
            BoundReference(ix, a.dataType,
              a.nullable || in(ix).nullable): Expression
          })
          cur = cur.map(proj)
          attrs = out
          keyOrd = attrs.indexWhere(_.exprId == keyExprId)
      }
      val right = sides(k + 1)
      val rs = sideStream(k + 1)
      val residual = st.residual.map { e =>
        val pr = Predicate.create(e, attrs ++ right.output)
        pr.initialize(split.index)
        pr
      }
      st.joinType match {
        case LeftSemi | LeftAnti =>
          cur = new ExistenceIter(cur, rs, anti = st.joinType == LeftAnti,
            keyOrd, right.outKeyOrdinal, residual,
            UnsafeProjection.create(toStruct(attrs)))
        case LeftOuter | Inner =>
          val outer = st.joinType == LeftOuter
          val outAttrs = attrs ++
            (if (outer) right.output.map(_.withNullability(true))
            else right.output)
          cur = new MatchIter(cur, rs, outer, keyOrd, right.outKeyOrdinal,
            right.output.length, residual,
            UnsafeProjection.create(toStruct(outAttrs)))
          attrs = outAttrs
        case FullOuter =>
          val outAttrs = attrs.map(_.withNullability(true)) ++
            right.output.map(_.withNullability(true))
          cur = new FullOuterIter(cur, rs, keyOrd, right.outKeyOrdinal,
            attrs.length, right.output.length, residual,
            UnsafeProjection.create(toStruct(outAttrs)))
          attrs = outAttrs
        case other => throw new IllegalStateException(
          s"unplannable merge join type $other")
      }
    }
    // a SWAPPED step (right outer planned as the mirrored left outer)
    // leaves the stream in swapped layout — remap to the exec's declared
    // output attribute order (row-local: every claim survives)
    if (attrs.map(_.exprId) != outAttrs.map(_.exprId)) {
      val in = attrs
      val proj = UnsafeProjection.create(outAttrs.map { a =>
        val ix = in.indexWhere(_.exprId == a.exprId)
        BoundReference(ix, a.dataType,
          a.nullable || in(ix).nullable): Expression
      })
      cur = cur.map(proj)
    }
    cur.map { row => rowCount += 1; row }
  }

  /** INNER / LEFT OUTER: the run-buffered streamed merge with optional
    * per-pair residual. Only the CURRENT right-key run is materialized
    * (copies — buffers must outlive their reader's advance); the left
    * side streams row by row, never copied: the active left row is
    * always consumed (projected) before its own stream advances.
    * Residual semantics are the ON clause's: TRUE emits the pair,
    * FALSE/NULL does not; OUTER emits (left, all-null right) for a
    * left row none of whose key-equal pairs passed — including every
    * row of left-only aligned components, whose right stream is empty.
    */
  private final class MatchIter(l: Iterator[InternalRow],
      r: Iterator[InternalRow], outer: Boolean, lKey: Int, rKey: Int,
      rWidth: Int, residual: Option[BasePredicate],
      proj: UnsafeProjection) extends Iterator[InternalRow] {
    private val joined = new JoinedRow
    private val nullRight = new GenericInternalRow(rWidth)
    private var lRow: InternalRow = if (l.hasNext) l.next() else null
    private var rRow: InternalRow = if (r.hasNext) r.next() else null
    private val run = new ArrayBuffer[InternalRow]
    private var runKey: Any = null
    private var runIdx = 0
    private var lActive = false
    private var anyMatch = false
    private var emitNull = false
    private var emitNullActive = false

    private def pairOk(rr: InternalRow): Boolean =
      residual.forall(_.eval(joined(lRow, rr)))

    /** Advance the left row while a run is loaded: equal keys stay on
      * the run (rescanning it), anything else releases it.
      */
    private def advanceWithinRun(): Unit = {
      lRow = if (l.hasNext) l.next() else null
      if (lRow != null && cmpKeys(lRow.get(lKey, keyType), runKey) == 0) {
        runIdx = 0; anyMatch = false
      } else { lActive = false; run.clear(); runKey = null }
    }

    private def findNext(): Boolean = {
      while (true) {
        if (emitNull || emitNullActive) return true
        if (lActive) {
          while (runIdx < run.length && !pairOk(run(runIdx))) runIdx += 1
          if (runIdx < run.length) return true
          // this left row exhausted the run; a residual may have failed
          // every pair — outer still owes the null-extended row
          if (outer && !anyMatch) { emitNullActive = true; return true }
          advanceWithinRun()
        } else if (lRow == null) return false
        else if (rRow == null) {
          // right exhausted: every remaining left row is match-less
          if (outer) { emitNull = true; return true }
          return false
        } else {
          val c = cmpKeys(lRow.get(lKey, keyType), rRow.get(rKey, keyType))
          if (c < 0) {
            if (outer) { emitNull = true; return true }
            lRow = if (l.hasNext) l.next() else null
          }
          else if (c > 0) rRow = if (r.hasNext) r.next() else null
          else {
            // build the equal-key run: COPIES — right rows come from
            // buffer-reusing readers and must outlive their advance
            run.clear()
            val first = rRow.copy()
            run += first
            runKey = first.get(rKey, keyType)
            rRow = if (r.hasNext) r.next() else null
            while (rRow != null &&
              cmpKeys(rRow.get(rKey, keyType), runKey) == 0) {
              run += rRow.copy()
              rRow = if (r.hasNext) r.next() else null
            }
            runIdx = 0
            lActive = true
            anyMatch = false
          }
        }
      }
      false
    }

    override def hasNext: Boolean = findNext()

    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException
      if (emitNull) {
        // project BEFORE advancing: the left stream may reuse its
        // row buffer, and l.next() would overwrite the row `joined`
        // still references
        val out = proj(joined(lRow, nullRight))
        emitNull = false
        lRow = if (l.hasNext) l.next() else null
        out
      } else if (emitNullActive) {
        val out = proj(joined(lRow, nullRight))
        emitNullActive = false
        advanceWithinRun()
        out
      } else {
        anyMatch = true
        val out = proj(joined(lRow, run(runIdx)))
        runIdx += 1
        out
      }
    }
  }

  /** FULL OUTER — the snapshot-diff shape: matched pairs stream like
    * INNER, match-less LEFT rows emit (l, null-right) in key position,
    * match-less RIGHT rows emit (null-left, r) in key position — both
    * sides read once, in place, already ordered (the ordinary plan
    * shuffles AND sorts both). With a residual, a pair failing it
    * leaves BOTH sides unmatched-so-far (SQL FULL OUTER ON semantics):
    * a left row none of whose key-equal pairs passed emits
    * null-extended, and each buffered right-run row no pair of which
    * passed emits null-extended when its run closes. Only the current
    * right-key run is materialized (copies + matched flags); the
    * output's left-key ordering claim is DROPPED by the exec —
    * right-only rows carry a null left key.
    */
  private final class FullOuterIter(l: Iterator[InternalRow],
      r: Iterator[InternalRow], lKey: Int, rKey: Int,
      lWidth: Int, rWidth: Int, residual: Option[BasePredicate],
      proj: UnsafeProjection) extends Iterator[InternalRow] {
    private val joined = new JoinedRow
    private val nullLeft = new GenericInternalRow(lWidth)
    private val nullRight = new GenericInternalRow(rWidth)
    private var lRow: InternalRow = if (l.hasNext) l.next() else null
    private var rRow: InternalRow = if (r.hasNext) r.next() else null
    private val run = new ArrayBuffer[InternalRow]
    private var matched: Array[Boolean] = _
    private var runKey: Any = null
    private var runIdx = 0
    private var lActive = false
    private var anyMatch = false
    private var flushingRun = false
    private var flushIdx = 0
    // what the pending emission is: 0 none, 1 matched pair, 2 left-null
    // for the ACTIVE left row (failed residuals, then advance within
    // run), 3 left-null for the streaming left row, 4 right-null for
    // the streaming right row, 5 right-null for run(flushIdx)
    private var kind = 0

    private def pairOk(rr: InternalRow): Boolean =
      residual.forall(_.eval(joined(lRow, rr)))

    private def advanceWithinRun(): Unit = {
      lRow = if (l.hasNext) l.next() else null
      if (lRow != null && cmpKeys(lRow.get(lKey, keyType), runKey) == 0) {
        runIdx = 0; anyMatch = false
      } else {
        // leaving the run: its unmatched rows owe null-extended output
        lActive = false
        flushingRun = true
        flushIdx = 0
      }
    }

    private def findNext(): Boolean = {
      while (kind == 0) {
        if (flushingRun) {
          while (flushIdx < run.length && matched(flushIdx)) flushIdx += 1
          if (flushIdx < run.length) { kind = 5; return true }
          flushingRun = false; run.clear(); runKey = null
        } else if (lActive) {
          while (runIdx < run.length && !pairOk(run(runIdx))) runIdx += 1
          if (runIdx < run.length) kind = 1
          else if (!anyMatch) kind = 2
          else advanceWithinRun()
        } else if (lRow == null) {
          if (rRow == null) return false
          kind = 4
        } else if (rRow == null) {
          kind = 3
        } else {
          val c = cmpKeys(lRow.get(lKey, keyType), rRow.get(rKey, keyType))
          if (c < 0) kind = 3
          else if (c > 0) kind = 4
          else {
            run.clear()
            val first = rRow.copy()
            run += first
            runKey = first.get(rKey, keyType)
            rRow = if (r.hasNext) r.next() else null
            while (rRow != null &&
              cmpKeys(rRow.get(rKey, keyType), runKey) == 0) {
              run += rRow.copy()
              rRow = if (r.hasNext) r.next() else null
            }
            matched = new Array[Boolean](run.length)
            runIdx = 0
            lActive = true
            anyMatch = false
          }
        }
      }
      true
    }

    override def hasNext: Boolean = findNext()

    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException
      val k = kind
      kind = 0
      k match {
        case 1 =>
          anyMatch = true
          matched(runIdx) = true
          val out = proj(joined(lRow, run(runIdx)))
          runIdx += 1
          out
        case 2 =>
          // project BEFORE advancing — the left stream may reuse its
          // row buffer (the MatchIter contract)
          val out = proj(joined(lRow, nullRight))
          advanceWithinRun()
          out
        case 3 =>
          val out = proj(joined(lRow, nullRight))
          lRow = if (l.hasNext) l.next() else null
          out
        case 4 =>
          val out = proj(joined(nullLeft, rRow))
          rRow = if (r.hasNext) r.next() else null
          out
        case _ =>
          val out = proj(joined(nullLeft, run(flushIdx)))
          flushIdx += 1
          out
      }
    }
  }

  /** LEFT SEMI / LEFT ANTI. Residual-free: no buffering at all — the
    * right stream only ever advances to the first row at-or-past the
    * current left key (duplicate left keys re-test the same right row),
    * and the left row is emitted alone on existence (semi) or absence
    * (anti) of a key match. With a residual: the key-equal right run
    * buffers (copies) and the verdict is "any pair passes" — duplicate
    * left keys re-test the same buffered run.
    */
  private final class ExistenceIter(l: Iterator[InternalRow],
      r: Iterator[InternalRow], anti: Boolean, lKey: Int, rKey: Int,
      residual: Option[BasePredicate],
      proj: UnsafeProjection) extends Iterator[InternalRow] {
    private val joined = new JoinedRow
    private var lRow: InternalRow = if (l.hasNext) l.next() else null
    private var rRow: InternalRow = if (r.hasNext) r.next() else null
    private val run = new ArrayBuffer[InternalRow]
    private var runKey: Any = null
    private var ready = false

    private def matchedFor(lk: Any): Boolean = residual match {
      case None =>
        while (rRow != null && cmpKeys(rRow.get(rKey, keyType), lk) < 0)
          rRow = if (r.hasNext) r.next() else null
        rRow != null && cmpKeys(rRow.get(rKey, keyType), lk) == 0
      case Some(pred) =>
        if (runKey == null || cmpKeys(runKey, lk) < 0) {
          run.clear(); runKey = null
          while (rRow != null && cmpKeys(rRow.get(rKey, keyType), lk) < 0)
            rRow = if (r.hasNext) r.next() else null
          if (rRow != null && cmpKeys(rRow.get(rKey, keyType), lk) == 0) {
            val first = rRow.copy()
            run += first
            runKey = first.get(rKey, keyType)
            rRow = if (r.hasNext) r.next() else null
            while (rRow != null &&
              cmpKeys(rRow.get(rKey, keyType), runKey) == 0) {
              run += rRow.copy()
              rRow = if (r.hasNext) r.next() else null
            }
          }
        }
        runKey != null && cmpKeys(runKey, lk) == 0 &&
          run.exists(rr => pred.eval(joined(lRow, rr)))
    }

    private def findNext(): Boolean = {
      while (!ready && lRow != null) {
        val matched = matchedFor(lRow.get(lKey, keyType))
        if (matched != anti) ready = true
        else lRow = if (l.hasNext) l.next() else null
      }
      ready && lRow != null
    }

    override def hasNext: Boolean = findNext()

    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException
      val out = proj(lRow)
      ready = false
      lRow = if (l.hasNext) l.next() else null
      out
    }
  }
}
