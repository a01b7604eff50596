package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe over a 64-bit hash column:
  * `graft_bloom_contains(h, bloomBytes)` — true iff `h` MIGHT be in the
  * set the filter was built from (no false negatives; false positives at
  * the filter's configured rate).
  *
  * This is the broadcast-set prefilter a 100 TB pipeline uses to avoid
  * shuffling the big side of a semi/anti-join against a SMALL keyset (a
  * benchmark-suite shingle set, a known-dup fingerprint list): probe the
  * filter map-side at the scan, shuffle only the hits, and let the exact
  * join downstream erase the false positives — the composed result is
  * EXACT while the corpus-side shuffle shrinks from "every posting" to
  * "postings that might match". Same role as Spark's own runtime
  * `BloomFilterMightContain` row-group filter, available as a declarative
  * function with a caller-built filter.
  *
  * The serialized filter rides the plan as a binary LITERAL, parsed once
  * at plan construction into the expression's constant [[BloomRef]] state
  * and surfaced to codegen as a reference object (same pattern as
  * [[BpeEncode]]'s merge table): one driver-side build, one task-side
  * deserialize, a few cache-friendly word probes per row. Size bound:
  * ~9.6 bits/item at 1% fpp — a 1M-shingle benchmark suite is ~1.2 MB of
  * plan literal, far under broadcast-join territory.
  */
case class BloomContains(child: Expression, bloom: BloomRef)
    extends UnaryExpression {

  override def prettyName: String = "graft_bloom_contains"
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains requires a bigint argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    bloom.contains(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter is added ONCE as a codegen reference object;
    // the per-row code is a single virtual call inside whole-stage codegen
    val ref = ctx.addReferenceObj("bloomRef", bloom, classOf[BloomRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

/** Serializable carrier for a built Bloom filter: ships the compact wire
  * bytes, deserializes lazily once per JVM that probes it. Equality is
  * over the bytes so plan canonicalization / reuse sees two probes of the
  * same filter as the same expression.
  */
final class BloomRef(val bytes: Array[Byte]) extends Serializable {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  def contains(h: Long): Boolean = filter.mightContainLong(h)

  override def equals(other: Any): Boolean = other match {
    case o: BloomRef => java.util.Arrays.equals(bytes, o.bytes)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
}

object BloomRef {

  /** Wire bytes of a driver-built filter (the literal argument of
    * `graft_bloom_contains`).
    */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }
}
