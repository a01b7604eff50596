package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.{Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BoundReference, EqualTo, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning, SinglePartition, UnknownPartitioning}
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.ingest.v2.{ExtJsonScan, FilterEval, OrderedBandGroup}

/** ZERO-exchange, ZERO-sort equi-join of two RANGE-LANDED document drops
  * — the range-layout analogue of the storage-partitioned join: when the
  * zone-map sidecars prove BOTH sides' files internally sorted and
  * groupable into strictly-disjoint key bands on their join keys
  * ([[graft.sink.CorpusSink.landJsonlRangeIndexed]] writes exactly this
  * layout; co-band with its `bounds` parameter for aligned parallelism),
  * the equi-join — INNER, LEFT OUTER, LEFT SEMI, or LEFT ANTI (the
  * decontamination shape: "drop every document whose key appears in the
  * benchmark drop", otherwise a full-shuffle anti-join) — plans as a
  * streamed MERGE JOIN over band-aligned partitions: each partition
  * reads the left and right files whose key ranges overlap ITS range
  * and nothing else. At 100 TB the ordinary plan shuffles both corpora
  * and sorts both sides; this plan reads each side once, in place,
  * already ordered — and whole one-sided key ranges prune at plan time:
  * right-only ranges always (no left row to emit), left-only ranges for
  * INNER/SEMI (no match possible), while OUTER/ANTI keep them as
  * right-empty partitions (their left rows are exactly the match-less
  * output).
  *
  * Partition construction is the cross-side overlap sweep: both sides'
  * disjoint band groups, min-sorted together, coalesce into components
  * separated by strict key gaps ACROSS BOTH SIDES — so a key present
  * anywhere in component i can never find a join partner outside it
  * (the alignment is sound for ANY two band layouts; matching `bounds`
  * just makes components fine-grained).
  *
  * The transformation is EXACT (key equality under null-free proven
  * keys — which also makes the null-key semantics of every left-typed
  * join vacuous), so like [[OrderedScanStrategy]] it needs no opt-in
  * conf; any unprovable condition falls through to Spark's own join
  * planning. A USER HINT on either side also refuses — a broadcast hint
  * must keep meaning broadcast.
  */
class RangeMergeJoinStrategy(session: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(lRel: DataSourceV2ScanRelation,
        rRel: DataSourceV2ScanRelation,
        jt @ (Inner | LeftOuter | LeftSemi | LeftAnti),
        Some(EqualTo(a: AttributeReference, b: AttributeReference)), hint)
        if hint == JoinHint.NONE =>
      (lRel.scan, rRel.scan) match {
        case (ls: ExtJsonScan, rs: ExtJsonScan) =>
          // orient the equality to (left key, right key) — the
          // RELATIONS never swap (left-typed joins are asymmetric)
          val oriented =
            if (lRel.outputSet.contains(a) && rRel.outputSet.contains(b))
              Some((a, b))
            else if (lRel.outputSet.contains(b) && rRel.outputSet.contains(a))
              Some((b, a))
            else None
          oriented match {
            case Some((lk, rk)) if lk.dataType == rk.dataType =>
              (ls.orderedBandPartitions(lk.name),
                rs.orderedBandPartitions(rk.name)) match {
                case (Some(lg), Some(rg)) if lg.nonEmpty && rg.nonEmpty =>
                  // LeftOuter/LeftAnti emit rows for match-less left
                  // ranges, so left-only components must be KEPT for
                  // them; right-only components never emit in any
                  // left-typed join
                  val parts = RangeMergeJoinExec.align(
                    lk.dataType, lg, rg,
                    keepLeftOnly = jt == LeftOuter || jt == LeftAnti)
                  RangeMergeJoinExec(jt, lRel.output, rRel.output,
                    lk.dataType,
                    lRel.output.indexWhere(_.exprId == lk.exprId),
                    rRel.output.indexWhere(_.exprId == rk.exprId),
                    SortOrder(lk, Ascending),
                    ls, rs, parts) :: Nil
                case _ => Nil
              }
            case _ => Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }
}

object RangeMergeJoinExec {

  /** The cross-side overlap sweep: both sides' strictly-disjoint,
    * min-sorted groups coalesce into components separated by strict key
    * gaps across BOTH sides; one-sided components drop (no inner rows —
    * the plan-time prune). Returns (left groups, right groups) per
    * component, each side's groups in key order.
    */
  private[plans] def align(dt: DataType, left: Seq[OrderedBandGroup],
      right: Seq[OrderedBandGroup],
      keepLeftOnly: Boolean = false): Seq[(Seq[OrderedBandGroup], Seq[OrderedBandGroup])] = {
    val tagged: Seq[(Boolean, OrderedBandGroup)] =
      (left.map(true -> _) ++ right.map(false -> _))
        .sortWith((x, y) =>
          FilterEval.compareInternal(dt, x._2.min, y._2.min) < 0)
    val out = Seq.newBuilder[(Seq[OrderedBandGroup], Seq[OrderedBandGroup])]
    var curL = List.empty[OrderedBandGroup]
    var curR = List.empty[OrderedBandGroup]
    var curMax: Any = null
    def flush(): Unit =
      if (curL.nonEmpty && (curR.nonEmpty || keepLeftOnly))
        out += ((curL.reverse, curR.reverse))
    tagged.foreach { case (isLeft, g) =>
      if (curMax != null && FilterEval.compareInternal(dt, g.min, curMax) > 0) {
        flush()
        curL = Nil; curR = Nil; curMax = null
      }
      if (isLeft) curL ::= g else curR ::= g
      if (curMax == null ||
        FilterEval.compareInternal(dt, g.max, curMax) > 0) curMax = g.max
    }
    flush()
    out.result()
  }
}

/** One aligned component = one partition; output rows stream in left-key
  * ASC order (the merge order), claimed via `outputOrdering`; partitions
  * own strictly-disjoint key ranges, claimed via `RangePartitioning` on
  * the left key — both honest for the same reason the ordered scan's
  * claims are (equal keys never straddle components).
  */
case class RangeMergeJoinExec(joinType: JoinType,
    leftOutput: Seq[Attribute],
    rightOutput: Seq[Attribute], keyType: DataType,
    leftKeyOrdinal: Int, rightKeyOrdinal: Int, leftKeyOrder: SortOrder,
    @transient leftScan: ExtJsonScan, @transient rightScan: ExtJsonScan,
    @transient parts: Seq[(Seq[OrderedBandGroup], Seq[OrderedBandGroup])])
    extends LeafExecNode {

  override def output: Seq[Attribute] = joinType match {
    case LeftSemi | LeftAnti => leftOutput
    case LeftOuter => leftOutput ++ rightOutput.map(_.withNullability(true))
    case _ => leftOutput ++ rightOutput
  }

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def outputPartitioning: Partitioning =
    if (parts.isEmpty) UnknownPartitioning(0)
    else if (parts.length == 1) SinglePartition
    else RangePartitioning(Seq(leftKeyOrder), parts.length)

  override def outputOrdering: Seq[SortOrder] = Seq(leftKeyOrder)

  override def simpleStringWithNodeId(): String =
    s"RangeMergeJoin($joinType, ${leftKeyOrder.child}, " +
      s"partitions=${parts.length})"

  override protected def doExecute(): RDD[InternalRow] = {
    val lSchema = StructType(leftOutput.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val rSchema = StructType(rightOutput.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    val outSchema = StructType(output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    // per-side in-group merge comparators, bound by ordinal (no attrs —
    // serializes cleanly to the executors)
    def keyOrd(ordinal: Int): Ordering[InternalRow] =
      new LazilyGeneratedOrdering(Seq(SortOrder(
        BoundReference(ordinal, keyType, nullable = false), Ascending)))
    new RangeMergeJoinRDD(session.sparkContext, joinType,
      leftScan.createReaderFactory(), rightScan.createReaderFactory(),
      parts, lSchema, rSchema, outSchema, keyType,
      leftKeyOrdinal, rightKeyOrdinal,
      keyOrd(leftKeyOrdinal), keyOrd(rightKeyOrdinal),
      longMetric("numOutputRows"))
  }
}

private final class RangeJoinPartition(override val index: Int,
    val left: Seq[OrderedBandGroup], val right: Seq[OrderedBandGroup])
    extends Partition

/** The streamed inner merge join over one aligned component: each side's
  * groups concatenate (disjoint, min-ordered) with in-group k-way merges
  * where a side's own bands overlap — so both inputs arrive key-sorted
  * and null-free (the sidecar proof), and the classic run-buffered merge
  * applies. Only the CURRENT right-key run is materialized (copies —
  * readers reuse their row objects); the left side streams row by row,
  * never copied: the active left row is held only until its own reader
  * advances.
  */
private final class RangeMergeJoinRDD(
    sc: org.apache.spark.SparkContext, joinType: JoinType,
    lFactory: PartitionReaderFactory, rFactory: PartitionReaderFactory,
    @transient parts: Seq[(Seq[OrderedBandGroup], Seq[OrderedBandGroup])],
    lSchema: StructType, rSchema: StructType, outSchema: StructType,
    keyType: DataType, lKey: Int, rKey: Int,
    lOrd: Ordering[InternalRow], rOrd: Ordering[InternalRow],
    rowCount: SQLMetric)
    extends RDD[InternalRow](sc, Nil) {

  override protected def getPartitions: Array[Partition] =
    parts.indices.map(i =>
      new RangeJoinPartition(i, parts(i)._1, parts(i)._2)).toArray

  override def compute(split: Partition,
      context: TaskContext): Iterator[InternalRow] = {
    val p = split.asInstanceOf[RangeJoinPartition]
    val l = BandStreams.sideRows(lFactory, p.left, lSchema, lOrd, context)
    val r = BandStreams.sideRows(rFactory, p.right, rSchema, rOrd, context)
    val proj = UnsafeProjection.create(outSchema)
    val base: Iterator[InternalRow] = joinType match {
      case LeftSemi => new ExistenceIter(l, r, anti = false, proj)
      case LeftAnti => new ExistenceIter(l, r, anti = true, proj)
      case LeftOuter => new MatchIter(l, r, outer = true, proj)
      case _ => new MatchIter(l, r, outer = false, proj)
    }
    base.map { row => rowCount += 1; row }
  }

  private def cmpKeys(a: Any, b: Any): Int =
    FilterEval.compareInternal(keyType, a, b)

  /** INNER / LEFT OUTER: the run-buffered streamed merge. Only the
    * CURRENT right-key run is materialized (copies — readers reuse
    * their row objects); the left side streams row by row, never
    * copied: the active left row is held only until its own reader
    * advances. Outer additionally emits (left, all-null right) for
    * match-less left rows — including every row of left-only aligned
    * components, whose right stream is simply empty.
    */
  private final class MatchIter(l: Iterator[InternalRow],
      r: Iterator[InternalRow], outer: Boolean,
      proj: UnsafeProjection) extends Iterator[InternalRow] {
    private val joined = new JoinedRow
    private val nullRight = new GenericInternalRow(rSchema.length)
    private var lRow: InternalRow = if (l.hasNext) l.next() else null
    private var rRow: InternalRow = if (r.hasNext) r.next() else null
    private val run = new ArrayBuffer[InternalRow]
    private var runKey: Any = null
    private var runIdx = 0
    private var lActive = false
    private var emitNull = false

    private def findNext(): Boolean = {
      while (true) {
        if (emitNull) return true
        if (lActive) {
          if (runIdx < run.length) return true
          // this left row exhausted the run: advance it, and stay on
          // the run while equal keys keep coming
          lRow = if (l.hasNext) l.next() else null
          if (lRow != null && cmpKeys(lRow.get(lKey, keyType), runKey) == 0)
            runIdx = 0
          else { lActive = false; run.clear(); runKey = null }
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
          }
        }
      }
      false
    }

    override def hasNext: Boolean = findNext()

    override def next(): InternalRow = {
      if (!hasNext) throw new NoSuchElementException
      if (emitNull) {
        joined(lRow, nullRight)
        emitNull = false
        lRow = if (l.hasNext) l.next() else null
      } else {
        joined(lRow, run(runIdx))
        runIdx += 1
      }
      proj(joined)
    }
  }

  /** LEFT SEMI / LEFT ANTI: no run buffer at all — the right stream
    * only ever advances to the first row at-or-past the current left
    * key (duplicate left keys re-test the same right row), and the left
    * row is emitted alone on existence (semi) or absence (anti) of a
    * key match. Zero copies either side.
    */
  private final class ExistenceIter(l: Iterator[InternalRow],
      r: Iterator[InternalRow], anti: Boolean,
      proj: UnsafeProjection) extends Iterator[InternalRow] {
    private var lRow: InternalRow = if (l.hasNext) l.next() else null
    private var rRow: InternalRow = if (r.hasNext) r.next() else null
    private var ready = false

    private def findNext(): Boolean = {
      while (!ready && lRow != null) {
        val lk = lRow.get(lKey, keyType)
        while (rRow != null && cmpKeys(rRow.get(rKey, keyType), lk) < 0)
          rRow = if (r.hasNext) r.next() else null
        val matched = rRow != null &&
          cmpKeys(rRow.get(rKey, keyType), lk) == 0
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
