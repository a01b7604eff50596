package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2 Q5/Q6 + the LLM-pipeline dedup
  * family). Exact-dup operators live here; near-dup (MinHash/SimHash) in
  * [[graft.ops.NearDup]].
  */
object Dedup {

  /** Keyed keep-first dedup: one surviving row per key, chosen as the first
    * under `order` — the deterministic form of `dropDuplicates(keys)`
    * (whose survivor is whichever row a task happens to see first; fine for
    * the reference's ON CONFLICT DO NOTHING semantics, useless for
    * reproducible pipelines).
    *
    * Plan: window partitioned BY KEY — a plain hash shuffle on the dedup
    * key, each group sorted independently; no global sort, no skew beyond
    * what the key distribution itself carries.
    *
    * Ref: `DO NOTHING` keep-first (`loanoffers_table.py:69-70`) +
    * within-batch pre-dedup required for multi-row ON CONFLICT (SURVEY
    * §7.4.6).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val rn = "__graft_dedup_rn"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Exact content dedup via canonical-form fingerprint (md5 of lowercased,
    * whitespace-collapsed text): keep the first document (per `order`) of
    * every fingerprint group. The shuffle key is the 32-char hash, never the
    * document text — at 100 TB the shuffle moves hashes + survivor payloads,
    * not 2× the corpus.
    */
  def exactByFingerprint(df: DataFrame, textCol: String, order: Seq[Column]): DataFrame = {
    val fp = "__graft_fp"
    keepFirst(
      df.withColumn(fp, TextAnalysis.fingerprint(col(textCol))),
      Seq(fp), order).drop(fp)
  }

  /** The historical side of [[incrementalByFingerprint]]: the corpus
    * reduced to its distinct canonical fingerprints. Persist this as the
    * corpus's dedup index — it is what future batches join against, so the
    * full historical text is never re-read, re-hashed, or re-shuffled.
    */
  def fingerprintIndex(df: DataFrame, textCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct()

  /** Incremental exact dedup — the production shape for a corpus that
    * grows by batches: admit only new-batch rows whose fingerprint is
    * absent from the existing index ([[fingerprintIndex]] schema: fp),
    * after within-batch keep-first. Cost scales with the BATCH (hashed
    * map-only) plus one anti-join against the index on the 32-char hash;
    * re-running whole-corpus dedup (q20) per batch would re-shuffle the
    * entire history every day.
    */
  def incrementalByFingerprint(newBatch: DataFrame, textCol: String,
      existingFps: DataFrame, order: Seq[Column]): DataFrame = {
    val fp = "__graft_fp"
    keepFirst(
      newBatch.withColumn(fp, TextAnalysis.fingerprint(col(textCol))),
      Seq(fp), order)
      .join(existingFps.select(col("fp").as(fp)), Seq(fp), "left_anti")
      .drop(fp)
  }
}
