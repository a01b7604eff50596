package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-k row buffer: the `k` smallest (key, id) pairs under
  * (key asc, id asc), kept as a size-capped binary max-heap (worst pair
  * at the root, evicted on overflow). EXACT at any scale and
  * merge-order-independent by construction: min-k of a union is a
  * function of the operands' min-ks — `minK(A ∪ B) = minK(minK(A) ∪
  * minK(B))` — so partial buffers compose associatively and
  * commutatively with no estimation regime at all (the contrast with
  * [[TopKSketch]], whose exactness is conditional on capacity).
  *
  * Keys are doubles internally; long keys convert exactly up to 2^53
  * (the ANN distance ranges this serves), and the heap's total order is
  * (key, id) so equal keys — the planted-duplicate case — break ties by
  * id deterministically.
  */
final class TopKRowsBuffer(val k: Int) extends Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  // parallel arrays, heap-ordered by (key desc, id desc) from the root —
  // the WORST retained pair sits at index 0 for O(log k) eviction
  val keys = new Array[Double](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  private def worse(k1: Double, i1: Long, k2: Double, i2: Long): Boolean =
    k1 > k2 || (k1 == k2 && i1 > i2)

  private def swap(a: Int, b: Int): Unit = {
    val tk = keys(a); keys(a) = keys(b); keys(b) = tk
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(keys(i), ids(i), keys(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && worse(keys(l), ids(l), keys(m), ids(m))) m = l
      if (r < size && worse(keys(r), ids(r), keys(m), ids(m))) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  def add(key: Double, id: Long): Unit =
    if (size < k) {
      keys(size) = key; ids(size) = id; size += 1
      siftUp(size - 1)
    } else if (worse(keys(0), ids(0), key, id)) {
      keys(0) = key; ids(0) = id
      siftDown()
    }

  def mergeIn(other: TopKRowsBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.keys(i), other.ids(i)); i += 1 }
  }

  /** The retained pairs sorted ascending by (key, id). */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(i => (keys(i), ids(i))).toArray
      .sortBy { case (key, id) => (key, id) }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(size)
    var i = 0
    while (i < size) { out.writeDouble(keys(i)); out.writeLong(ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TopKRowsBuffer {
  def deserialize(k: Int, bytes: Array[Byte]): TopKRowsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKRowsBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { b.add(in.readDouble(), in.readLong()); i += 1 }
    b
  }
}

/** `graft_topk_rows(key, id, k)` — exact bounded-heap top-k-rows-per-group
  * aggregate: the `k` SMALLEST (key, id) pairs of the group under
  * (key asc, id asc), as `array<struct<key, id: bigint>>` sorted
  * ascending. The billion-group form of "rank per group, keep rank <= k":
  * the window formulation sorts EVERY candidate of a group through one
  * task and ships them all into the Exchange, while this aggregation
  * ships a k-entry buffer per group between partial and final — map-side
  * partials prune candidates before they ever reach the shuffle. Unlike
  * [[TopKAgg]]'s space-saving sketch there is NO approximation regime:
  * min-k composes exactly under any merge order, so the output is always
  * the same rows the window would rank 1..k (ties broken by id — the
  * ANN family's planted-duplicate contract). Descending rankings negate
  * the key. `key` may be bigint (exact to 2^53 — every ANN distance
  * here) or double; null key or id contributes nothing.
  */
case class TopKRowsAgg(
    key: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRowsBuffer] {

  require(k >= 1, s"graft_topk_rows: k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(key, id)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKRowsAgg =
    copy(key = newChildren(0), id = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (key.dataType != LongType && key.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_rows requires a bigint or double key, got ${key.dataType.catalogString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_rows requires a bigint id, got ${id.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  private def longKey: Boolean = key.dataType == LongType

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", key.dataType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKRowsBuffer = new TopKRowsBuffer(k)

  override def update(buffer: TopKRowsBuffer, input: InternalRow): TopKRowsBuffer = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null) {
      val kd = if (longKey) kv.asInstanceOf[Long].toDouble
        else kv.asInstanceOf[Double]
      buffer.add(kd, iv.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKRowsBuffer, input: TopKRowsBuffer): TopKRowsBuffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: TopKRowsBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (kd, id) =>
      InternalRow(if (longKey) kd.toLong else kd, id)
    }.toArray[Any])

  override def serialize(buffer: TopKRowsBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TopKRowsBuffer =
    TopKRowsBuffer.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_topk_rows"
}
