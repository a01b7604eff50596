package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Insert/update split on a unique business key — the in-engine half of the
  * reference's `INSERT … ON CONFLICT` upsert (SURVEY.md §2 Q5): rows whose
  * key already exists in the target are updates, the rest are inserts.
  *
  * One left-outer join against the (deduplicated) key set, then a flag —
  * NOT a semi join unioned with an anti join, which would scan and shuffle
  * `incoming` twice. At scale this is a single hash shuffle on the key (or
  * a broadcast when the key set is small, chosen by the planner/AQE).
  */
object UpsertSplit {

  val opCol = "op"
  val opInsert = "insert"
  val opUpdate = "update"

  /** Returns `incoming` plus an `op` column ∈ {insert, update}. */
  def split(incoming: DataFrame, existingKeys: DataFrame, keyCol: String): DataFrame = {
    val marker = "__graft_hit"
    val keys = existingKeys.select(col(keyCol)).distinct()
      .withColumn(marker, lit(true))
    incoming
      .join(keys, Seq(keyCol), "left_outer")
      .withColumn(opCol, when(col(marker).isNotNull, lit(opUpdate)).otherwise(lit(opInsert)))
      .drop(marker)
  }

  /** The insert half only — new keys (left anti). */
  def inserts(incoming: DataFrame, existingKeys: DataFrame, keyCol: String): DataFrame =
    incoming.join(existingKeys.select(keyCol), Seq(keyCol), "left_anti")

  /** The update half only — known keys (left semi). */
  def updates(incoming: DataFrame, existingKeys: DataFrame, keyCol: String): DataFrame =
    incoming.join(existingKeys.select(keyCol), Seq(keyCol), "left_semi")
}
