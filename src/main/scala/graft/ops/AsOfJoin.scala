package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to every left row the single most recent right row
  * at or before the left row's time, per key. The canonical time-series /
  * feature-store lookup (latest account state at event time, latest price
  * at trade time) that Spark has no native operator for.
  *
  * The naive formulation is an equi-key join with a time inequality and an
  * argmax: Spark executes that as a SortMergeJoin producing EVERY
  * (left, qualifying-right) pair before the per-left-row top-1 — with r
  * right rows per key, an O(l·r)-pair blowup that is the join's actual cost
  * at scale. This composition instead UNIONS the two sides and runs one
  * keyed window with a running last-non-null carry:
  *
  *   1. tag right rows (side 0) and left rows (side 1), union by name;
  *   2. one window partitioned by key, ordered by (time, side, tiebreak),
  *      running frame `rowsBetween(unboundedPreceding, currentRow)`;
  *   3. `last(rightPayload, ignoreNulls = true)` over that frame — at each
  *      left row this is exactly the latest right row with
  *      `rightTime <= leftTime` (right sorts before left on time ties, so
  *      the match is inclusive);
  *   4. keep left rows, drop the ones with no prior right row (inner
  *      as-of).
  *
  * Cost: ONE hash shuffle of (key, time, payload) plus an O(n log n)
  * per-partition sort — no pair materialization, no range join. Ties on
  * `rightTime` within a key resolve to the greatest `tiebreak`
  * (deterministic output; mirrors `ORDER BY time DESC, tiebreak DESC
  * LIMIT 1` semantics).
  */
object AsOfJoin {

  /** @param rightCols right columns to carry onto the left row; returned as
    *   fields of a single `asof` struct column appended to the left schema.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      tiebreak: String, rightCols: Seq[String]): DataFrame = {
    // Null right keys/times can never satisfy the SQL contract
    // (`rightKey = leftKey AND rightTime <= leftTime` is UNKNOWN on null),
    // but the asc-nulls-first window order would treat a null-time right
    // row as "older than everything" and carry it into every left row of
    // its key — drop them before the union. (Null LEFT keys/times already
    // fall out: their partitions hold no surviving right rows, so the
    // inner filter below removes them, same as the equi-join would.)
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), col(tiebreak).as("__tb"),
        struct(rightCols.map(col): _*).as("__rp"))
    val leftCols = left.columns.toSeq
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(r.schema("__tb").dataType).as("__tb"),
      lit(null).cast(r.schema("__rp").dataType).as("__rp"),
      struct(leftCols.map(col): _*).as("__lp"))
    val u = r
      .withColumn("__lp", lit(null).cast(l.schema("__lp").dataType))
      .unionByName(l)
    // Running frame, not the default range frame: with a row frame the
    // carry at a left row can only see rows sorted before it, which the
    // (time, side, tiebreak) order makes exactly the <= right rows.
    // tiebreak NULLS FIRST: the LAST right row in the frame wins, so a
    // null-tiebreak right row must sort before its non-null time-twins —
    // mirroring `ORDER BY time DESC, tiebreak DESC NULLS LAST LIMIT 1`
    // (a null tiebreak wins only when it is the sole candidate)
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__asof", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__asof").isNotNull)
      .select((leftCols.map(c => col(s"__lp.$c").as(c)) :+
        col("__asof").as("asof")): _*)
  }
}
