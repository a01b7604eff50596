package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the oracle-checked query inventory.
  *
  * The driver hash-compares our results against DuckDB running the same SQL,
  * so every aggregate over a floating-point column must be *order-insensitive
  * bit-exact*. All money/measure columns in the testdata are clean 2-decimal
  * doubles, so `cast(decimal(18,2)) -> SUM (exact) -> cast(double)` yields the
  * identical double in any engine and any aggregation order. Plain
  * `SUM(double)` would differ in the low bits between Spark's partial
  * aggregation tree and DuckDB's scan order.
  */
object QueryHelpers {

  /** Exact, order-insensitive sum of a clean 2-decimal double column. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact average: exact decimal sum divided by exact count, one final
    * IEEE-754 division identical in every engine.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB SQL spelling of [[dsum]]. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  /** DuckDB SQL spelling of [[davg]]. */
  def davgSql(col: String): String =
    s"${dsumSql(col)} / COUNT($col)"

  /** The DuckDB replay of [[graft.functions.HashEmbedKernel]] as a CTE
    * chain ending in `e(doc_id, j, x)` — one row per (document, output
    * dim) with the signed hashed-embedding component. ONE definition for
    * every oracle that needs the kernel's exact integer recipe (q118,
    * q120): the rolling bucket hash mod 2^40 → `buckets`, the two-round
    * square-and-add sign mix, and the signed occurrence sum must stay in
    * lockstep with the native kernel in a single place. `e` is
    * MATERIALIZED: multiply-referenced CTEs re-inline per reference in
    * DuckDB (the trigram-KN precedent).
    */
  def hashEmbedCtes(buckets: Int, outDim: Int, seed: Int,
      source: String = "documents"): String =
    s"toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM $source), " +
      "feats AS (SELECT doc_id, list_concat(t, " +
      "  [array_to_string(t[i:i+1], ' ') for i in range(1, len(t))]) AS fs FROM toks), " +
      "f AS (SELECT doc_id, unnest(fs) AS s FROM feats), " +
      "h AS (SELECT doc_id, " +
      "  (list_reduce(list_transform(string_split(s, ''), " +
      "    c -> CAST(ascii(c) AS BIGINT)), " +
      s"    (a, c) -> (a * 31 + c) % 1099511627776)) % $buckets AS b FROM f), " +
      "sg AS (SELECT b, j, CASE WHEN " +
      "  ((((h2 % 1048576) * (h2 % 1048576) + h2) % 1099511627776) // 1048576) % 2 = 0 " +
      "  THEN 1 ELSE -1 END AS sgn FROM (" +
      "  SELECT b, j, ((h0 % 1048576) * (h0 % 1048576) + h0) % 1099511627776 AS h2 FROM (" +
      s"  SELECT b, j, (b * 1048573 + j * 8191 + $seed) % 1099511627776 AS h0 " +
      s"  FROM (SELECT unnest(range($buckets)) AS b), (SELECT unnest(range($outDim)) AS j)))), " +
      "e AS MATERIALIZED (SELECT h.doc_id, sg.j, " +
      "  CAST(SUM(sg.sgn) AS BIGINT) AS x " +
      "  FROM h JOIN sg ON sg.b = h.b GROUP BY h.doc_id, sg.j)"
}
