package graft.ingest.v2

import java.time.{Instant, LocalDate, OffsetDateTime}

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-driven Mongo-extended-JSON line parser (SURVEY.md §2 S1) — the
  * decode kernel behind [[ExtJsonDataSource]].
  *
  * Two reading modes fall out of ONE schema-driven rule, mirroring how the
  * MongoDB Spark connector presents BSON under a user schema
  * (reference behavior: `collection.aggregate([{$project: …}])` decoded
  * per-field, `/root/reference/dags/includes/user_table.py:26-53`):
  *
  *  - schema field is the WRAPPER STRUCT type ([[graft.schema.Bson.oidType]]
  *    / `dateType`) → the wrapper is materialized as-is and the downstream
  *    transform layer decodes it (the hermetic raw mode every TableSpec
  *    uses today);
  *  - schema field is an ATOMIC type where the document carries a wrapper
  *    object → the parser unwraps in place: `{"$oid": …}` → STRING,
  *    `{"$date": "ISO"}` / `{"$date": {"$numberLong": "ms"}}` → TIMESTAMP
  *    or DATE, `{"$numberLong|$numberInt|$numberDouble|$numberDecimal": …}`
  *    → the target numeric. This is the decoded mode filter pushdown needs:
  *    a timestamp comparison on a decoded column is a plain v1 Filter.
  *
  * Field skipping is REAL `$project` semantics: a document field absent
  * from the (pruned) schema is `skipChildren()`-ed — Jackson never
  * tokenizes its subtree into values, so pruned columns cost token
  * traversal, not materialization.
  *
  * Malformed lines follow the builtin JSON source's PERMISSIVE default:
  * any unparseable line or uncoercible field yields an ALL-NULL row
  * (absent fields alone are fine — they become typed nulls for the T4
  * default chain).
  */
/** @param headLimits per-ROOT-field array truncation (`items -> 1`):
  *   the first k elements materialize, the rest are token-skipped — the
  *   [[ArrayHeadProjection]] contract, sound only because the rewrite
  *   proved every plan-side use of the field is a fixed ordinal below k
  *   (or a null check, which truncation never changes). Like pruned
  *   columns, skipped elements are NOT validated — the same documented
  *   permissive-mode property column pruning already has.
  */
final class ExtJsonParser(schema: StructType,
    headLimits: Map[String, Int] = Map.empty) extends Serializable {

  @transient private lazy val factory = new JsonFactory()
  private val width = schema.length

  /** name→ordinal per struct level, built once per distinct StructType
    * (identity-keyed: the same nested StructType instance recurs per row).
    */
  @transient private lazy val indexCache =
    new java.util.IdentityHashMap[StructType, Map[String, Int]]()

  private def fieldIndex(st: StructType, name: String): Int = {
    var m = indexCache.get(st)
    if (m == null) {
      m = st.fieldNames.zipWithIndex.toMap
      indexCache.put(st, m)
    }
    m.getOrElse(name, -1)
  }

  /** Parse one JSONL line from a byte range; all-null row if malformed. */
  def parse(bytes: Array[Byte], offset: Int, length: Int): InternalRow = {
    val p = factory.createParser(bytes, offset, length)
    try {
      val t = p.nextToken()
      if (t != JsonToken.START_OBJECT) allNull()
      else convertStruct(p, schema, root = true)
    } catch {
      case scala.util.control.NonFatal(_) => allNull()
    } finally p.close()
  }

  private def allNull(): InternalRow = new GenericInternalRow(width)

  /** Cursor is ON START_OBJECT; consumes through its END_OBJECT. */
  private def convertStruct(p: JsonParser, st: StructType,
      root: Boolean = false): InternalRow = {
    val values = new Array[Any](st.length)
    var t = p.nextToken()
    while (t == JsonToken.FIELD_NAME) {
      val name = p.currentName()
      p.nextToken()
      val idx = fieldIndex(st, name)
      if (idx < 0) p.skipChildren()
      else {
        val dt = st.fields(idx).dataType
        values(idx) =
          if (root && headLimits.contains(name) &&
            p.currentToken() == JsonToken.START_ARRAY)
            dt match {
              case ArrayType(et, _) => convertArrayHead(p, et, headLimits(name))
              case other => convert(p, other)
            }
          else convert(p, dt)
      }
      t = p.nextToken()
    }
    require(t == JsonToken.END_OBJECT, s"unterminated object, got $t")
    new GenericInternalRow(values)
  }

  /** Cursor ON START_ARRAY: materialize the first `k` elements, token-
    * skip the rest (skipChildren is a no-op on scalar tokens, which the
    * loop's nextToken has already consumed).
    */
  private def convertArrayHead(p: JsonParser, et: DataType, k: Int): Any = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var n = 0
    while (p.nextToken() != JsonToken.END_ARRAY) {
      if (n < k) buf += convert(p, et) else p.skipChildren()
      n += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Cursor is ON the value's first token; consumes the whole value. */
  private def convert(p: JsonParser, dt: DataType): Any =
    p.currentToken() match {
      case JsonToken.VALUE_NULL => null
      case JsonToken.START_OBJECT =>
        dt match {
          case st: StructType => convertStruct(p, st) // raw wrapper mode
          case atomic => convertWrapper(p, atomic)
        }
      case JsonToken.START_ARRAY =>
        dt match {
          case ArrayType(et, _) =>
            val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
            while (p.nextToken() != JsonToken.END_ARRAY) buf += convert(p, et)
            new GenericArrayData(buf.toArray)
          case other => fail(s"array for $other")
        }
      case tok => convertAtomic(p, tok, dt)
    }

  private def convertAtomic(p: JsonParser, tok: JsonToken, dt: DataType): Any =
    (dt, tok) match {
      case (StringType, _) if tok.isScalarValue => UTF8String.fromString(p.getText)
      case (BooleanType, JsonToken.VALUE_TRUE) => true
      case (BooleanType, JsonToken.VALUE_FALSE) => false
      case (IntegerType, JsonToken.VALUE_NUMBER_INT) => p.getIntValue
      case (LongType, JsonToken.VALUE_NUMBER_INT) => p.getLongValue
      case (FloatType, t) if isNumber(t) => p.getFloatValue
      case (DoubleType, t) if isNumber(t) => p.getDoubleValue
      case (d: DecimalType, t) if isNumber(t) => decimal(p.getText, d)
      case (TimestampType, JsonToken.VALUE_STRING) => isoMicros(p.getText)
      case (DateType, JsonToken.VALUE_STRING) =>
        LocalDate.parse(p.getText).toEpochDay.toInt
      case (BinaryType, JsonToken.VALUE_STRING) =>
        java.util.Base64.getDecoder.decode(p.getText)
      case (d, t) => fail(s"token $t for $d")
    }

  private def isNumber(t: JsonToken): Boolean =
    t == JsonToken.VALUE_NUMBER_INT || t == JsonToken.VALUE_NUMBER_FLOAT

  /** Cursor ON START_OBJECT with an ATOMIC target: extended-JSON wrapper.
    * Mongo extended-JSON v2 spec wrappers; anything else is malformed.
    */
  private def convertWrapper(p: JsonParser, dt: DataType): Any = {
    require(p.nextToken() == JsonToken.FIELD_NAME, "empty wrapper object")
    val key = p.currentName()
    p.nextToken()
    val out = (key, dt) match {
      case ("$oid", StringType) => UTF8String.fromString(p.getText)
      case ("$date", _) =>
        val micros = p.currentToken() match {
          case JsonToken.VALUE_STRING => isoMicros(p.getText) // relaxed
          case JsonToken.START_OBJECT => // canonical {"$numberLong": "ms"}
            require(p.nextToken() == JsonToken.FIELD_NAME &&
              p.currentName() == "$numberLong", "canonical $date needs $numberLong")
            p.nextToken()
            val ms = p.getText.toLong
            require(p.nextToken() == JsonToken.END_OBJECT, "unterminated $date")
            Math.multiplyExact(ms, 1000L)
          case t => fail(s"token $t inside $$date")
        }
        dt match {
          case TimestampType => micros
          case DateType =>
            Math.floorDiv(micros, 86400L * 1000000L).toInt
          case StringType => // undecoded passthrough
            UTF8String.fromString(
              Instant.EPOCH.plusNanos(Math.multiplyExact(micros, 1000L)).toString)
          case other => fail(s"$$date for $other")
        }
      case ("$numberLong", LongType) => p.getText.toLong
      case ("$numberInt", IntegerType) => p.getText.toInt
      case ("$numberLong", IntegerType) => Math.toIntExact(p.getText.toLong)
      case ("$numberDouble", DoubleType) => p.getText.toDouble
      case ("$numberDouble", FloatType) => p.getText.toFloat
      case ("$numberDecimal", d: DecimalType) => decimal(p.getText, d)
      case (k, d) => fail(s"wrapper $k for $d")
    }
    require(p.nextToken() == JsonToken.END_OBJECT, "unterminated wrapper")
    out
  }

  private def decimal(text: String, d: DecimalType): Decimal = {
    val dec = Decimal(new java.math.BigDecimal(text))
    require(dec.changePrecision(d.precision, d.scale), s"decimal overflow: $text")
    dec
  }

  /** ISO-8601 instant → epoch micros ("2022-11-02T08:15:30Z", fractional
    * seconds, or an explicit offset).
    */
  private def isoMicros(s: String): Long = {
    val inst =
      try Instant.parse(s)
      catch { case _: java.time.format.DateTimeParseException =>
        OffsetDateTime.parse(s).toInstant
      }
    Math.addExact(Math.multiplyExact(inst.getEpochSecond, 1000000L),
      inst.getNano / 1000L)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed extended JSON: $msg")
}
