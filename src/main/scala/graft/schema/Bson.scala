package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.types._

/** Mongo extended-JSON wrapper handling (SURVEY.md §7.4.7): `$oid` and
  * `$date` wrapper structs as they appear in extended-JSON exports, decoded
  * to `StringType` / `TimestampType` before the transform layer runs.
  */
object Bson {

  /** Schema of `{"$oid": "63e1f0…"}`. */
  val oidType: DataType = StructType(Seq(StructField("$oid", StringType)))

  /** Schema of relaxed-form `{"$date": "2022-11-02T08:15:30Z"}` — what
    * `mongoexport` emits by default for in-range dates.
    */
  val dateType: DataType = StructType(Seq(StructField("$date", StringType)))

  /** Schema of canonical-form `{"$date": {"$numberLong": "1667376930000"}}`
    * — `mongoexport --jsonFormat=canonical`, and what relaxed mode falls
    * back to for pre-1970/far-future dates. The export format is per-file:
    * a spec targeting canonical dumps swaps this type into its source
    * schema and decodes with [[tsCanonical]]; the transform layer above is
    * unchanged.
    */
  val dateTypeCanonical: DataType = StructType(Seq(StructField("$date",
    StructType(Seq(StructField("$numberLong", StringType))))))

  /** 24-hex ObjectId string out of the wrapper. */
  def oid(c: Column): Column = c.getField("$oid")

  /** UTC timestamp out of the relaxed wrapper (ISO-8601 instant; session
    * timezone is pinned to UTC by GraftSession).
    */
  def ts(c: Column): Column = c.getField("$date").cast(TimestampType)

  /** UTC timestamp out of the canonical wrapper (epoch milliseconds). */
  def tsCanonical(c: Column): Column =
    org.apache.spark.sql.functions.timestamp_millis(
      c.getField("$date").getField("$numberLong").cast(LongType))
}
