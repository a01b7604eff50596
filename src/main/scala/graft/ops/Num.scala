package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared integer column arithmetic. */
object Num {

  /** Floor division of a long column by a positive constant. Spark's `div`
    * (and plain `/` + truncation) rounds toward ZERO, which puts negative
    * values (pre-epoch timestamps, negative cents) in the wrong bucket;
    * `pmod` is non-negative, so subtracting it always rounds DOWN. The
    * intermediate `/` is a double division of exact longs whose quotient is
    * an exact integer — representable as long as |x/d| < 2^53.
    */
  def floorDiv(x: Column, d: Long): Column = {
    require(d > 0, "divisor must be positive")
    ((x - pmod(x, lit(d))) / lit(d)).cast("long")
  }

  /** Floor modulus (always in [0, d)) — alias for `pmod` against a
    * constant, named to pair with [[floorDiv]]:
    * `x == floorDiv(x,d)*d + floorMod(x,d)` for every long x.
    */
  def floorMod(x: Column, d: Long): Column = pmod(x, lit(d))
}
