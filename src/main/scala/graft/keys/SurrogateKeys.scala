package graft.keys

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Surrogate-key generation and reconciliation (SURVEY.md §2 T6/Q7/Q8).
  *
  * Semantics match the reference's `assign_new_pk_to_df`
  * (`/root/reference/dags/includes/utils.py:5-39`): every incoming row whose
  * business key already has an id keeps that id; rows with new keys receive
  * contiguous ids `max(existing.id) + 1, + 2, …` assigned in business-key
  * order. The reference does this with one Postgres round trip per row
  * (N+1); here it is ONE left-outer hash join plus numbering of the new
  * subset — the single biggest algorithmic win of the rebuild.
  *
  * Both variants filter-split the joined batch into known/new FIRST, so
  * matched rows never shuffle into any numbering step — they flow straight
  * through at full parallelism. Only the numbering of the new subset
  * differs:
  *  - [[reconcile]] — the new subset goes through an unpartitioned
  *    `row_number` window: ONE task, but only over the novel keys. Right
  *    whenever per-batch novelty is bounded (the reference's daily deltas),
  *    regardless of how large `existing` or the known subset is.
  *  - [[reconcileAtScale]] — same result, but new-key numbering uses
  *    [[GlobalIndex]] (range shuffle + two-pass zipWithIndex), so even a
  *    first-load batch of billions of new keys never serializes. This is
  *    what full loads use.
  *
  * Ordering: new keys are numbered by `keyCol` first, then every remaining
  * orderable column as a deterministic tiebreaker — duplicate business keys
  * (legal for non-unique reconcile keys) still get reproducible ids, and
  * both variants assign identical ids on identical input.
  */
object SurrogateKeys {

  private val maxIdCol = "__graft_max_id"

  /** `existing` projected to (key, id) with the current max id attached as a
    * literal-per-row column via a 1-row broadcast cross join — keeps the
    * whole computation one lazy plan (no driver-side collect between the
    * max-lookup and the join, unlike the reference's two queries).
    */
  private def existingKeyed(existing: DataFrame, keyCol: String, idCol: String): (DataFrame, DataFrame) = {
    val keyed = existing.select(col(keyCol), col(idCol))
    val maxId = existing.agg(coalesce(max(col(idCol)), lit(0L)).cast("long").as(maxIdCol))
    (keyed, maxId)
  }

  private def orderable(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case StringType | BooleanType | DateType | TimestampType | BinaryType => true
    case _ => false
  }

  /** Total-order sort key for numbering: the business key first, then every
    * remaining orderable column as a deterministic tiebreaker. GlobalIndex
    * requires a total order (ties split across range-partition boundaries
    * are sample-dependent), and the window variant needs the same order so
    * the two variants agree run-to-run.
    */
  private def totalOrder(df: DataFrame, keyCol: String): Seq[Column] =
    col(keyCol) +: df.schema.fields.toSeq
      .filter(f => f.name != keyCol && !f.name.startsWith("__graft") &&
        orderable(f.dataType))
      .map(f => col(f.name))

  /** Reconcile `incoming` against `existing(keyCol, idCol)`; returns
    * `incoming`'s columns plus `idCol`. See object doc for the id contract.
    */
  def reconcile(existing: DataFrame, incoming: DataFrame, keyCol: String,
      idCol: String = "id"): DataFrame = {
    val (keyed, maxId) = existingKeyed(existing, keyCol, idCol)
    val joined = incoming.join(keyed, Seq(keyCol), "left_outer")
    val known = joined.filter(col(idCol).isNotNull)
    val fresh = joined.filter(col(idCol).isNull).drop(idCol)
      .crossJoin(broadcast(maxId))
    // Unpartitioned window over the NEW subset only: new keys — one task,
    // ordered by key — get max+1, max+2, … exactly like the reference's
    // `last_pk+i`. Known rows are unioned back untouched and never shuffle.
    val w = Window.orderBy(totalOrder(fresh, keyCol): _*)
    val numbered = fresh
      .withColumn(idCol, col(maxIdCol) + row_number().over(w))
      .drop(maxIdCol)
    known.unionByName(numbered)
  }

  /** [[reconcile]] with [[GlobalIndex]] numbering for the new-key subset —
    * no single-task window anywhere; safe for unbounded novelty (full
    * loads).
    */
  def reconcileAtScale(existing: DataFrame, incoming: DataFrame, keyCol: String,
      idCol: String = "id"): DataFrame = {
    val (keyed, maxId) = existingKeyed(existing, keyCol, idCol)
    val joined = incoming.join(keyed, Seq(keyCol), "left_outer")
    val known = joined.filter(col(idCol).isNotNull)
    val fresh = joined.filter(col(idCol).isNull).drop(idCol)
      .crossJoin(broadcast(maxId))
    val numbered = GlobalIndex
      .withGlobalIndex(fresh, totalOrder(fresh, keyCol), "__graft_rn")
      .withColumn(idCol, col(maxIdCol) + col("__graft_rn"))
      .drop("__graft_rn", maxIdCol)
    known.unionByName(numbered)
  }
}
