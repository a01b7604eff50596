package graft.schema

import java.sql.Date

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's per-field transform vocabulary (SURVEY.md §2.2 T3–T12) as
  * reusable column functions. Each is a thin composition of built-in
  * Catalyst expressions — no UDFs anywhere in the flatten path.
  */
object Xform {

  /** The reference's sentinel default date (`datetime(1990, 1, 1)` —
    * `user_table.py:83-84`), landed as a DATE column.
    */
  val sentinelDate: Column = lit(Date.valueOf("1990-01-01"))

  /** T4 — boolean default-fill: `.get(field, False)`. */
  def bool(c: Column): Column = coalesce(c, lit(false))

  /** T4 — date default-fill + landing cast: `.get(field, datetime(1990,1,1))`
    * on a Mongo `$date` wrapper, landed as DATE (the target DDL type).
    */
  def date(c: Column): Column = coalesce(Bson.ts(c).cast("date"), sentinelDate)

  /** T4 (invoices/cashflow variant) — `status` defaulting to Python `False`
    * on a varchar column: through the reference's pandas CSV staging the
    * landed value is the STRING "False" (`invoices_table.py:100`,
    * `cashflow_events_table.py:68`) — reproduced faithfully.
    */
  def strFalse(c: Column): Column = coalesce(c, lit("False"))

  /** T7 — complex value carried to varchar. The reference stringifies via
    * Python `str()` (repr, e.g. `['admin', 'trader']`); the engine lands
    * canonical JSON (`["admin","trader"]`) — a deliberate, documented
    * normalization (repr is not round-trippable).
    */
  def json(c: Column): Column = to_json(c)

  /** T8 — head-of-array field extraction with default
    * (`safe_list_get(products, 0, {}).get(f, default)` —
    * `trades_table.py:17-21`). `try_element_at` (not `element_at`): under
    * ANSI semantics out-of-range access must yield null, which then takes
    * the default. Also covers T10 (empty-array default rows): an empty
    * array yields null for every field, so the same `coalesce` chain
    * produces the reference's explicit else-branch defaults
    * (`agribusiness_table.py:73-78`).
    */
  def head(arr: Column, field: String): Column =
    try_element_at(arr, lit(1)).getField(field)

  /** T8 + T4 for booleans/dates inside array heads. */
  def headBool(arr: Column, field: String): Column = bool(head(arr, field))
  def headDate(arr: Column, field: String): Column =
    coalesce(head(arr, field).getField("$date").cast("timestamp").cast("date"),
      sentinelDate)

  /** T9 — the reference's degenerate "first referrer": `str(list)[0]`, i.e.
    * the first CHARACTER of the stringified list (`agribusiness_table.py:63`)
    * — "[" for any present list, null when the field is absent. Faithful
    * reproduction via the engine's stringification.
    */
  def firstCharOfStringified(c: Column): Column = substring(to_json(c), 1, 1)
}
