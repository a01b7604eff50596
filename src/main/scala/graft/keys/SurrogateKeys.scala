package graft.keys

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key generation and reconciliation (SURVEY.md §2 T6/Q7/Q8).
  *
  * Semantics match the reference's `assign_new_pk_to_df`
  * (`/root/reference/dags/includes/utils.py:5-39`): every incoming row whose
  * business key already has an id keeps that id; rows with new keys receive
  * contiguous ids `max(existing.id) + 1, + 2, …` assigned in business-key
  * order. The reference does this with one Postgres round trip per row
  * (N+1); here it is ONE left-outer hash join plus a window — the single
  * biggest algorithmic win of the rebuild.
  *
  * Two variants:
  *  - [[reconcile]] — fully declarative; the new-key subset goes through an
  *    unpartitioned `row_number` window (one task for the NEW rows only —
  *    matched rows never enter the window). Right whenever the per-batch
  *    novelty is bounded (the reference's daily deltas), regardless of how
  *    large `existing` is.
  *  - [[reconcileAtScale]] — same result, but new-key numbering uses
  *    [[GlobalIndex]] (range shuffle + two-pass zipWithIndex), so even a
  *    first-load batch of billions of new keys never serializes.
  */
object SurrogateKeys {

  private val isNewCol = "__graft_is_new"
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

  /** Reconcile `incoming` against `existing(keyCol, idCol)`; returns
    * `incoming`'s columns plus `idCol`. See object doc for the id contract.
    */
  def reconcile(existing: DataFrame, incoming: DataFrame, keyCol: String,
      idCol: String = "id"): DataFrame = {
    val (keyed, maxId) = existingKeyed(existing, keyCol, idCol)
    val joined = incoming
      .join(keyed, Seq(keyCol), "left_outer")
      .crossJoin(broadcast(maxId))
      .withColumn(isNewCol, col(idCol).isNull)
    // Window partitioned by the new/known flag: known rows keep their id and
    // ignore their partition's numbering; new rows — one partition, ordered
    // by key — get max+1, max+2, … exactly like the reference's `last_pk+i`.
    val w = Window.partitionBy(col(isNewCol)).orderBy(col(keyCol))
    joined
      .withColumn(idCol,
        when(col(isNewCol), col(maxIdCol) + row_number().over(w))
          .otherwise(col(idCol)))
      .drop(isNewCol, maxIdCol)
  }

  /** [[reconcile]] with [[GlobalIndex]] numbering for the new-key subset —
    * no single-task window anywhere; safe for unbounded novelty.
    */
  def reconcileAtScale(existing: DataFrame, incoming: DataFrame, keyCol: String,
      idCol: String = "id"): DataFrame = {
    val (keyed, maxId) = existingKeyed(existing, keyCol, idCol)
    val joined = incoming.join(keyed, Seq(keyCol), "left_outer")
    val known = joined.filter(col(idCol).isNotNull)
    val fresh = joined.filter(col(idCol).isNull).drop(idCol)
      .crossJoin(broadcast(maxId))
    val numbered = GlobalIndex
      .withGlobalIndex(fresh, Seq(col(keyCol)), "__graft_rn")
      .withColumn(idCol, col(maxIdCol) + col("__graft_rn"))
      .drop("__graft_rn", maxIdCol)
    known.unionByName(numbered)
  }
}
