package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query inventory.
  *
  * The driver hash-compares our results against DuckDB running the same SQL,
  * so every aggregate over a floating-point column must be *order-insensitive
  * bit-exact*. All money/measure columns in the testdata are clean 2-decimal
  * doubles, so `cast(decimal(18,2)) -> SUM (exact) -> cast(double)` yields the
  * identical double in any engine and any aggregation order. Plain
  * `SUM(double)` would differ in the low bits between Spark's partial
  * aggregation tree and DuckDB's scan order.
  */
object QueryHelpers {

  /** Exact, order-insensitive sum of a clean 2-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact average: exact decimal sum divided by exact count, one final
    * IEEE-754 division identical in every engine.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB SQL spelling of [[dsum]]. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  /** DuckDB SQL spelling of [[davg]]. */
  def davgSql(col: String): String =
    s"${dsumSql(col)} / COUNT($col)"
}
