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
  * Keys are stored SORTABLE-ENCODED as longs: a bigint key is the value
  * itself (exact at ANY magnitude — xxhash64-derived keys included, no
  * 2^53 double funnel), a double key is its IEEE bits with the sign-fold
  * transform `bits ^ ((bits >> 63) & Long.MaxValue)` after
  * `doubleToLongBits` NaN canonicalization — signed-long order on the
  * encoding IS `java.lang.Double.compare` order (-0.0 < +0.0, every NaN
  * equal and greater than +Inf), exactly Spark's double ordering, so the
  * aggregate stays row-identical to the window formulation even on NaN
  * keys. The total order is (key, id), so equal keys — the
  * planted-duplicate case — break ties by id deterministically.
  */
final class TopKRowsBuffer(val k: Int) extends Serializable {
  require(k >= 1, s"k must be >= 1, got $k")

  // parallel arrays, heap-ordered by (key desc, id desc) from the root —
  // the WORST retained pair sits at index 0 for O(log k) eviction.
  // keys hold the sortable encoding (see class doc).
  val keys = new Array[Long](k)
  val ids = new Array[Long](k)
  var size: Int = 0

  private def worse(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
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

  def add(key: Long, id: Long): Unit =
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

  /** The retained pairs sorted ascending by (encoded key, id). */
  def sorted: Array[(Long, Long)] =
    (0 until size).map(i => (keys(i), ids(i))).toArray
      .sortBy { case (key, id) => (key, id) }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(size)
    var i = 0
    while (i < size) { out.writeLong(keys(i)); out.writeLong(ids(i)); i += 1 }
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
    while (i < n) { b.add(in.readLong(), in.readLong()); i += 1 }
    b
  }

  /** Double → sortable long: signed-long order on the result equals
    * `java.lang.Double.compare` order (sign fold; NaN canonicalized
    * greatest). Involution together with [[sortableToDouble]].
    */
  def doubleToSortable(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    bits ^ ((bits >> 63) & Long.MaxValue)
  }

  def sortableToDouble(s: Long): Double =
    java.lang.Double.longBitsToDouble(s ^ ((s >> 63) & Long.MaxValue))
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
  * the key. `key` may be bigint (exact at any magnitude — the buffer
  * stores longs, never a double funnel) or double (NaN orders greatest,
  * like Spark's own double ordering); null key or id contributes
  * nothing.
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
      val enc = if (longKey) kv.asInstanceOf[Long]
        else TopKRowsBuffer.doubleToSortable(kv.asInstanceOf[Double])
      buffer.add(enc, iv.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKRowsBuffer, input: TopKRowsBuffer): TopKRowsBuffer = {
    buffer.mergeIn(input)
    buffer
  }

  override def eval(buffer: TopKRowsBuffer): Any =
    new GenericArrayData(buffer.sorted.map { case (enc, id) =>
      InternalRow(if (longKey) enc else TopKRowsBuffer.sortableToDouble(enc), id)
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
