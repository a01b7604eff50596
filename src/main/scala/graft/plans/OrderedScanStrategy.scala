package graft.plans

import org.apache.spark.{Partition, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, NullsFirst, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
import org.apache.spark.sql.catalyst.plans.physical.{Partitioning, RangePartitioning, SinglePartition}
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.ingest.v2.{ExtJsonInputPartition, ExtJsonScan}

/** EXCHANGE-FREE global `ORDER BY` over a range-landed document drop —
  * the planner rung the zone-map `sorted` proof exists for: when the
  * sidecar proves the scan's surviving files form strictly-disjoint,
  * internally-sorted key bands
  * ([[graft.sink.CorpusSink.landJsonlRangeIndexed]] writes exactly this
  * layout), a global single-key ascending sort IS the layout — the
  * strategy replaces `Sort(global)` over the scan with
  * [[OrderedBandScanExec]], one sequential reader per band, claiming
  * `RangePartitioning` + per-partition ordering. Spark then plans NO
  * SortExec and NO range Exchange: at 100 TB the difference between a
  * metadata decision and the single largest shuffle a sorted
  * materialization pays. The transformation is EXACT (band order ∘ file
  * order = global order; pushed filters only remove rows), so unlike the
  * approximate similarity-join strategy it needs no opt-in conf — any
  * unprovable condition falls through to the ordinary sort.
  *
  * Scope, deliberately narrow and provable:
  *  - single ASC NULLS FIRST key (the sorted proof is null-free, so
  *    nulls-first vs -last is vacuous; DESC would need a reversed read);
  *  - the key resolves to a TOP-LEVEL scan output column with fresh
  *    sidecar proofs on every planned file (ExtJsonScan
  *    .orderedBandPartitions holds the full gate list);
  *  - `Sort + Limit` shapes never reach here — Spark's own
  *    TakeOrderedAndProject plans them first, composing with the scan's
  *    pushed top-N and the sorted-scan early exit instead.
  */
class OrderedScanStrategy(session: SparkSession) extends SparkStrategy {

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: Sort if s.global =>
      (s.order, s.child) match {
        case (Seq(so @ SortOrder(attr: AttributeReference, Ascending,
            NullsFirst, _)), rel: DataSourceV2ScanRelation) =>
          rel.scan match {
            case scan: ExtJsonScan
              if rel.output.exists(_.exprId == attr.exprId) =>
              scan.orderedBandPartitions(attr.name) match {
                case Some(bands) if bands.nonEmpty =>
                  OrderedBandScanExec(rel.output, Seq(so), scan, bands) :: Nil
                case _ => Nil
              }
            case _ => Nil
          }
        case _ => Nil
      }
    case _ => Nil
  }
}

/** One band = one partition, read sequentially in offset order; bands in
  * key order. `outputPartitioning` claims what the sidecar proved:
  * ranges are strictly disjoint (equal keys never straddle bands), so
  * `RangePartitioning(sortOrder)` is honest for both ordered and
  * clustered distributions, and `outputOrdering` carries the in-band
  * proof — consumers requiring a global sort get it for free.
  */
case class OrderedBandScanExec(output: Seq[Attribute],
    sortOrder: Seq[SortOrder], @transient scan: ExtJsonScan,
    @transient bands: Seq[Seq[ExtJsonInputPartition]]) extends LeafExecNode {

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override def outputPartitioning: Partitioning =
    if (bands.length == 1) SinglePartition
    else RangePartitioning(sortOrder, bands.length)

  override def outputOrdering: Seq[SortOrder] = sortOrder

  override def simpleStringWithNodeId(): String =
    s"OrderedBandScan(${sortOrder.mkString(", ")}, bands=${bands.length})"

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = StructType(output.map(a =>
      StructField(a.name, a.dataType, a.nullable)))
    new OrderedBandRDD(session.sparkContext, scan.createReaderFactory(),
      bands, schema, longMetric("numOutputRows"))
  }
}

private final class BandPartition(override val index: Int,
    val splits: Seq[ExtJsonInputPartition]) extends Partition

/** Reads each band's splits SEQUENTIALLY in offset order — byte order is
  * row order for JSONL, so the concatenation preserves the file's proven
  * sortedness whatever byte granularity the scan planned (block pruning
  * may have cut mid-file ranges; removal never reorders).
  */
private final class OrderedBandRDD(
    sc: org.apache.spark.SparkContext,
    factory: PartitionReaderFactory,
    @transient bands: Seq[Seq[ExtJsonInputPartition]],
    schema: StructType,
    rowCount: SQLMetric)
    extends RDD[InternalRow](sc, Nil) {

  override protected def getPartitions: Array[Partition] =
    bands.indices.map(i => new BandPartition(i, bands(i))).toArray

  override def compute(split: Partition,
      context: TaskContext): Iterator[InternalRow] = {
    val proj = UnsafeProjection.create(schema)
    split.asInstanceOf[BandPartition].splits.iterator.flatMap { p =>
      val reader = factory.createReader(p)
      context.addTaskCompletionListener[Unit](_ => reader.close())
      new Iterator[InternalRow] {
        private var ready = false
        private var done = false
        override def hasNext: Boolean = {
          if (!ready && !done) {
            ready = reader.next()
            done = !ready
          }
          ready
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          ready = false
          rowCount += 1
          reader.get()
        }
      }
    }.map(proj)
  }
}
