package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.keys.GlobalIndex

/** Sequence packing — the concat-and-chunk step that turns a token-counted
  * corpus into fixed-size training sequences: documents are laid out in a
  * deterministic total order, their token streams conceptually concatenated,
  * and the concatenation cut every `maxTokens` tokens. Every document gets
  * the sequence id and in-sequence offset where it STARTS (a document whose
  * tokens cross a cut simply spans into the following sequence — the
  * standard packing semantic; no padding, no document ever dropped).
  *
  * The cumulative token position comes from [[GlobalIndex.withRunningSum]]
  * (range shuffle + two light passes), NOT from an unpartitioned window — a
  * `sum().over(Window.orderBy(...))` would pull the whole corpus through one
  * task, which is exactly the scale failure this operator exists to avoid.
  */
object Packing {

  /** Append `seq_id` (0-based chunk index) and `seq_offset` (token offset
    * of the document's first token inside that chunk) for the layout order
    * given by `sortCols`. `tokenCol` must be integral token counts.
    */
  def packSequences(df: DataFrame, sortCols: Seq[Column], tokenCol: String,
      maxTokens: Long): DataFrame = {
    require(maxTokens > 0, "maxTokens > 0")
    val withCum = GlobalIndex.withRunningSum(
      df.withColumn(tokenCol, col(tokenCol).cast("long")),
      sortCols, tokenCol, "__cum")
    // exclusive prefix = first-token position of this document
    val start = col("__cum") - col(tokenCol)
    withCum
      .withColumn("seq_id", Num.floorDiv(start, maxTokens))
      .withColumn("seq_offset", Num.floorMod(start, maxTokens))
      .drop("__cum")
  }
}
