package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring span dedup — the ExactSubstr operator of "Deduplicating
  * Training Data Makes Language Models Better" (Lee et al., 2022) /
  * RefinedWeb: when the SAME `w`-token span occurs more than once across
  * the corpus, every occurrence except the canonical first is REMOVED from
  * its document (the document survives with the span cut out), unlike the
  * whole-document dedup family ([[Dedup]]/[[NearDup]]) which keeps or
  * drops documents wholesale. Lee et al. build a corpus-wide suffix array —
  * inherently single-machine; the distributed re-expression is fixed-width
  * window hashing: every length-`w` token window is hashed, windows with
  * ≥2 occurrences flag all-but-first, flagged windows merge into maximal
  * covered intervals (gaps-and-islands), and covered token positions are
  * cut. Overlapping/adjacent duplicated windows coalesce, so a shared
  * 50-token run is excised as ONE span, and any shared run of ≥ w tokens
  * is always detected (its first w-window is a duplicate).
  *
  * Scale shape: the occurrence table shuffles (hash8, doc_id, pos) — 24
  * bytes per window position, never text. The only stages that move token
  * text are the per-document interval merge and the final reassembly, both
  * partitioned by doc_id (bounded by the largest single document, the same
  * unit any per-document transform carries). A pathological window value
  * repeated millions of times funnels its occurrence rows (24 B each)
  * through one row_number task — the same hot-key exposure NearDup bounds
  * with a df cap; here the canonical-first contract needs the full group,
  * and the rows are fixed-width, so 10^6 occurrences ≈ 24 MB: acceptable.
  *
  * Determinism: the canonical occurrence is the lexicographic minimum of
  * (doc_id, pos), so output is independent of partitioning and retry.
  */
object SpanDedup {

  /** Remove every non-canonical occurrence of any duplicated `w`-token
    * span. Output: one row per input document — `idCol`, rewritten
    * `textCol` (tokens joined by single spaces; empty string if everything
    * was cut), `n_kept`/`n_dropped` token counts.
    *
    * Tokenization is single-space split ([[TextAnalysis.tokens]]'s
    * convention), positions are 1-based.
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    require(w >= 2, s"span width must be >= 2, got $w")
    require(docs.columns.contains(idCol) && docs.columns.contains(textCol),
      s"missing $idCol/$textCol in [${docs.columns.mkString(",")}]")

    // each HOF stage is its own projection: nesting the interpreted
    // higher-order chains inline re-evaluates the subtree per element
    // (see TestAnalysis scaladocs / verify-skill gotcha)
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ", -1).as("t"))

    val winT = "array<struct<pos:int,h:bigint>>"
    val wins = base.select(col("doc_id"),
      when(size(col("t")) >= w,
        transform(sequence(lit(1), size(col("t")) - (w - 1)),
          i => struct(i.as("pos"),
            xxhash64(concat_ws(" ", slice(col("t"), i, lit(w)))).as("h"))))
        .otherwise(lit(null).cast(winT)).as("wins"))

    val occ = wins.select(col("doc_id"), explode(col("wins")).as("o"))
      .select(col("doc_id"), col("o.pos").as("pos"), col("o.h").as("h"))

    // all-but-first occurrence of every window value; shuffle carries
    // (h, doc_id, pos) only
    val byH = Window.partitionBy("h")
      .orderBy(col("doc_id").asc, col("pos").asc)
    val flagged = occ.withColumn("rn", row_number().over(byH))
      .where(col("rn") > 1)
      .select(col("doc_id"), col("pos"), (col("pos") + w).as("e"))

    // merge overlapping/adjacent [pos, pos+w) intervals per document
    // (gaps-and-islands): an island starts where pos exceeds the running
    // max end of everything before it
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val islands = flagged
      .withColumn("mx",
        max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("isl", sum(
        when(col("mx").isNull || col("pos") > col("mx"), 1).otherwise(0))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val intervals = islands.groupBy("doc_id", "isl")
      .agg(min("pos").as("s"), max("e").as("e"))

    // covered positions (merged intervals are disjoint — no distinct
    // needed); bounded by total flagged-window mass, not corpus size
    val dropPos = intervals.select(col("doc_id"),
      explode(sequence(col("s"), col("e") - 1)).as("pos"))

    val toks = base.select(col("doc_id"),
      posexplode(col("t")).as(Seq("p0", "tok")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("tok"))

    val kept = toks.join(dropPos, Seq("doc_id", "pos"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok"))).as("text"),
        count(lit(1)).as("n_kept"))

    base.select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
