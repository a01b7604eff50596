package graft.core

import org.apache.spark.sql.{functions, DataFrame, SparkSession}

/** Loader for the driver-provided deterministic testdata
  * (`/root/testdata/sf*` — see TESTDATA.md). One parquet file per table.
  *
  * All engine queries read through here so that column pruning and filter
  * pushdown reach the parquet scan (verify with `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema` must reflect the query).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS) — read as raw int64 nanos
    * (legacy.parquet.nanosAsLong in [[GraftSession]]) and truncated here to
    * micros, the finest precision Spark's TimestampType carries. The cast
    * happens in the scan projection (still codegen'd, still column-pruned).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // floor division, not `div` (which truncates toward zero): pre-epoch
        // nanos must round DOWN to match native nanosecond-floor semantics
        raw.withColumn("ts", functions.timestamp_micros(
          functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
