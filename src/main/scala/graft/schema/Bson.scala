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

  /** Schema of `{"$date": "2022-11-02T08:15:30Z"}`. */
  val dateType: DataType = StructType(Seq(StructField("$date", StringType)))

  /** 24-hex ObjectId string out of the wrapper. */
  def oid(c: Column): Column = c.getField("$oid")

  /** UTC timestamp out of the wrapper (ISO-8601 instant; session timezone
    * is pinned to UTC by GraftSession).
    */
  def ts(c: Column): Column = c.getField("$date").cast(TimestampType)
}
