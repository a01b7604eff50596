package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two keyed snapshots: which
  * rows were inserted, deleted, or had any compared column change. The
  * upstream of every incremental pipeline (the reference's daily update
  * consumes pre-computed deltas; this computes them when the source can
  * only provide full snapshots).
  *
  * One full outer join on the key (a single co-partitioned shuffle of both
  * snapshots); change detection uses null-safe comparison (`<=>`) per
  * compared column, so null→value and value→null transitions count as
  * updates — a plain `=!=` would silently miss them.
  */
object Diff {

  /** Output: key columns + `op` ∈ {insert, update, delete}; unchanged rows
    * are not emitted. `compareCols` defaults to every non-key column
    * shared by both snapshots.
    *
    * Null-KEYED rows follow SQL equi-join semantics: they match nothing,
    * so a null-keyed row in the old snapshot reports `delete` and one in
    * the new snapshot reports `insert` (a null-keyed row present in both
    * reports one of each) — consistent with how any keyed MERGE would
    * treat them.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, keys: Seq[String],
      compareCols: Seq[String] = Nil): DataFrame = {
    val cmp =
      if (compareCols.nonEmpty) compareCols
      else oldSnap.columns.filterNot(keys.contains)
        .intersect(newSnap.columns.filterNot(keys.contains)).toSeq
    // presence FLAGS, not key-null tests, decide which side matched: a row
    // whose key VALUE is null never equi-joins, and testing the key for
    // null would misread it as "the other side was absent" (a null-keyed
    // deleted row would surface as an insert)
    val o = oldSnap.select((keys ++ cmp).map(c => col(c).as(s"o_$c")) :+
      lit(true).as("__o_present"): _*)
    val n = newSnap.select((keys ++ cmp).map(c => col(c).as(s"n_$c")) :+
      lit(true).as("__n_present"): _*)
    val cond = keys.map(k => col(s"o_$k") === col(s"n_$k")).reduce(_ && _)
    val changed = cmp.map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, cond, "full_outer")
      .withColumn("op",
        when(col("__o_present").isNull, lit("insert"))
          .when(col("__n_present").isNull, lit("delete"))
          .when(changed, lit("update")))
      .where(col("op").isNotNull)
      .select(keys.map(k =>
        coalesce(col(s"n_$k"), col(s"o_$k")).as(k)) :+ col("op"): _*)
  }
}
