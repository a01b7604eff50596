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

  /** Sliding-window context chunks — the PER-DOCUMENT sequence prep
    * ([[packSequences]] packs ACROSS documents; this windows WITHIN one):
    * the token stream is cut into windows of `chunkSize` tokens advancing
    * by `stride` (overlap = chunkSize − stride, the lookback context each
    * training example keeps). Every token lands in at least one chunk; the
    * final chunk may be short (no padding). Output: `idCol`, `chunk_idx`
    * (0-based), `chunk_text`, `n_chunk_tokens`.
    *
    * Map-only plan (split → bounded explode): chunk count per document is
    * ⌈(n−chunkSize)/stride⌉+1, so output size is the input's token mass ×
    * chunkSize/stride — a constant factor, never quadratic. No shuffle
    * until a consumer groups or joins.
    */
  /** Window k's token slice (1-based start k·stride+1, length chunkSize). */
  private def chunkAt(toks: Column, k: Column, chunkSize: Int, stride: Int): Column =
    slice(toks, (k.cast("int") * stride + 1), lit(chunkSize))

  def slidingChunks(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize (a stride past the window would drop tokens)")
    val toks = split(col(textCol), " ", -1)
    val n = size(toks)
    // number of windows: 1 when the doc fits; else first window + one per
    // stride advance, integer-ceil((n - chunkSize) / stride) of them
    val m = when(n <= chunkSize, lit(1L)).otherwise(
      floor((n - lit(chunkSize) + lit(stride) - 1).cast("double") / lit(stride))
        .cast("long") + 1L)
    docs
      .select(col(idCol), toks.as("__toks"), m.as("__m"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0L), col("__m") - 1L)).as("__k"))
      .select(col(idCol), col("__k").as("chunk_idx"),
        array_join(chunkAt(col("__toks"), col("__k"), chunkSize, stride), " ")
          .as("chunk_text"),
        size(chunkAt(col("__toks"), col("__k"), chunkSize, stride))
          .as("n_chunk_tokens"))
  }

  /** Content-defined chunking at token granularity — the rsync/LBFS/
    * storage-dedup boundary rule re-expressed for text: a chunk ends after
    * any token whose content hash lands in a 1-in-16 bucket (md5 hex
    * prefix '0'), so boundaries derive from CONTENT, not position, and a
    * single insertion only perturbs its own chunk — the chunking
    * re-synchronizes at the next boundary, unlike fixed windows
    * ([[slidingChunks]]) where one shift invalidates every later chunk.
    * Returns the cross-corpus duplicate-chunk table: one row per chunk
    * digest occurring ≥ 2 times, with occurrence and distinct-document
    * counts — the candidate table chunk-level dedup or delta-storage
    * consumes.
    *
    * Scale shape: boundary flags and chunk assembly are windows/aggs
    * partitioned by document (chunk text never crosses a document
    * boundary before being reduced to its 32-char digest map-side); the
    * only corpus-wide shuffle moves (digest, doc_id). The md5-hex-prefix
    * boundary rule is engine-portable — the DuckDB oracle recomputes the
    * identical chunking with string functions only.
    */
  def contentDefinedChunks(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), " ", -1)).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val flagged = toks.withColumn("b",
      when(substring(md5(col("tok")), 1, 1) === "0", 1L).otherwise(0L))
    val assigned = flagged.withColumn("chunk_idx",
      coalesce(sum(col("b"))
        .over(byDoc.rowsBetween(org.apache.spark.sql.expressions
          .Window.unboundedPreceding, -1)), lit(0L)))
    val chunks = assigned.groupBy("doc_id", "chunk_idx")
      .agg(
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok")))).as("digest"),
        count(lit(1)).as("n_tokens"))
    chunks.groupBy("digest")
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("n_tokens")).as("n_tokens"))
      .where(col("n_occ") >= 2)
  }
}
