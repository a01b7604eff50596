package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import QueryHelpers._

/** Relational operator inventory over the driver testdata, one named query per
  * operator family from SURVEY.md §2 (T = scalar transform, Q = relational),
  * plus the standard relational surface the engine exposes beyond the
  * reference (joins, grouped aggregation, windows, set ops, rollup).
  *
  * Each query is paired (in [[oracle]]) with the DuckDB SQL the driver runs
  * over the same parquet tables; column names match exactly.
  *
  * Scale notes are given per query: the plans are declarative so Catalyst
  * handles pushdown/pruning; the only materialization decisions we make by
  * hand are broadcast hints for dimension tables.
  */
object Relational {

  private val disc1 = lit(1.0).cast(DecimalType(18, 2))

  /** T1 — projection / column pruning, pushed to the parquet scan
    * (ref: `$project` in dags/includes/user_table.py:26-53).
    */
  private def q01Project(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** T2 — predicate filter pushed to the scan
    * (ref: `$match` in dags/includes/loanapplication_table.py:27-31).
    */
  private def q02Filter(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1998-01-01") &&
        col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))

  /** Grouped aggregation (TPC-H Q1 shape): map-side partial agg, one shuffle
    * on the (low-cardinality) group key. Exact decimal sums — see
    * [[QueryHelpers]].
    */
  private def q03AggGroupBy(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val discPrice = l.col("l_extendedprice").cast(DecimalType(18, 2)) *
      (disc1 - l.col("l_discount").cast(DecimalType(18, 2)))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** Join fact->dim then aggregate by segment. No broadcast hint on
    * customer: an explicit `broadcast()` is honored regardless of size, and
    * at ~15M rows (100 TB SF) it would OOM. Below the 64 MB
    * autoBroadcastJoinThreshold Spark still picks a broadcast hash join on
    * its own; above it, AQE falls back to shuffle join — the scale-safe
    * default.
    */
  private def q04JoinAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))

  /** Multi-way join (TPC-H Q5 shape): lineitem |><| orders |><| customer
    * |><| nation |><| region; the fact-fact join shuffles on orderkey.
    * Only the genuinely tiny dims (nation: 25 rows, region: 5 rows at any
    * SF) carry a broadcast hint; customer is left unhinted so the planner
    * (helped by AQE) can pick broadcast below the threshold and shuffle
    * join at scale. Filters pushed below the joins by Catalyst.
    */
  private def q05MultiJoin(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val revenue = l.col("l_extendedprice").cast(DecimalType(18, 2)) *
      (disc1 - l.col("l_discount").cast(DecimalType(18, 2)))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(revenue).cast("double").as("revenue"))
  }

  /** Q2+top-k — global sort + limit. Spark runs TakeOrderedAndProject: no full
    * global sort materialization, per-partition top-k then merge.
    */
  private def q06TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** Q5/Q6 — distinct (dedup on full row): hash aggregate, partial then final. */
  private def q07Distinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus")
      .distinct()

  /** Q8 — partitioned window function (row_number): one shuffle on the
    * partition key; per-partition sort only, never a global sort.
    * (The reference's contiguous-PK assignment is the global-window variant —
    * see graft.keys.SurrogateKeys for the scalable two-pass form.)
    */
  private def q08WindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_nationkey")
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
  }

  /** Q1 — unwind/explode (ref: `$unwind` loanapplication_table.py:33-35):
    * Catalyst Generate node, no shuffle.
    */
  private def q09Explode(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"), explode(col("embedding")).as("val"))

  /** Anti join — "new keys" half of the upsert split (SURVEY §2 Q5):
    * customers that have no orders. Broadcast anti join at this scale; at
    * 100 TB, shuffle hash anti join on the key.
    */
  private def q10AntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** EXISTS / IN — the left-semi complement of q10: customers WITH at
    * least one urgent order, emitted once regardless of how many match.
    * A semi join shuffles only keys from the probe side's perspective and
    * never duplicates rows — the scale-safe spelling of `IN (subquery)`
    * (an inner join + distinct would multiply then re-shuffle to dedup).
    */
  private def q84SemiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")

  /** T4 — default-fill / null coalesce (ref: `.get(field, default)`
    * user_table.py:62-84), materialized here via the nulls a left join
    * produces: per-customer order stats with zero defaults.
    */
  private def q11Coalesce(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("spend"))
    Tables.customer(s, d)
      .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(
        col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("total_spend"))
  }

  /** Rollup — hierarchical aggregate (engine extension; Spark Expand node,
    * single shuffle). Goes through SQL because the Dataset `rollup`/`cube`
    * API trips Spark 4.1's ambiguous-self-join check (the Expand node
    * duplicates the grouping attributes); `GROUP BY ROLLUP` compiles to the
    * identical plan without the false positive.
    */
  private def q12Rollup(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
    val nat = broadcast(Tables.nation(s, d))
    val reg = broadcast(Tables.region(s, d))
    // Unique view name per call: a fixed name races when two sessions/threads
    // build this query concurrently (last registration wins for both).
    val view = s"graft_q12_base_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    sup.join(nat, col("s_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "s_acctbal")
      .createOrReplaceTempView(view)
    // spark.sql analyzes eagerly, so the view can be dropped as soon as the
    // DataFrame exists — otherwise every invocation leaks a catalog entry
    try s.sql(
      s"""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
         |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         |FROM $view GROUP BY ROLLUP (r_name, n_name)""".stripMargin)
    finally s.catalog.dropTempView(view)
  }

  /** Q3 — scalar min/max/count (ref: `SELECT id ORDER BY id DESC LIMIT 1`,
    * utils.py:13-20, replaced by an agg that needs no sort).
    */
  private def q13MinMax(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(
        max(col("o_orderkey")).as("max_key"),
        min(col("o_orderkey")).as("min_key"),
        count(lit(1)).as("n_rows"))

  /** T3/T4/T8/T10 — nested-struct flatten, null-struct defaults, and
    * head-of-array extraction (the reference's per-document flatten loop,
    * `user_table.py:56-87` / `trades_table.py:69-74`), demonstrated
    * hash-checkably by building nested documents from testdata columns and
    * flattening them back with the [[graft.schema.Xform]] vocabulary.
    * Map-only plan — flattening never shuffles.
    */
  private def q15FlattenDefaults(s: SparkSession, d: String): DataFrame = {
    val nested = Tables.customer(s, d).select(
      col("c_custkey"),
      when(col("c_custkey") % 3 =!= 0,
        struct(col("c_name").as("name"), col("c_nationkey").as("nk"))).as("info"),
      when(col("c_custkey") % 4 =!= 0,
        array(struct(col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))))
        .otherwise(array().cast("array<struct<bal:double,seg:string>>"))
        .as("items"))
    nested.select(
      col("c_custkey"),
      coalesce(col("info.name"), lit("unknown")).as("name"),
      coalesce(col("info.nk"), lit(-1L)).as("nk"),
      coalesce(try_element_at(col("items"), lit(1)).getField("bal"), lit(0.0)).as("bal0"),
      coalesce(try_element_at(col("items"), lit(1)).getField("seg"), lit("NONE")).as("seg0"))
  }

  /** Set operations — EXCEPT: building-segment customers that never placed an
    * urgent order. Spark plans left-anti after dedup.
    */
  private def q14Except(s: SparkSession, d: String): DataFrame = {
    val building = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"))
    building.except(urgent)
  }

  /** Skew-immune two-phase salted aggregation ([[graft.ops.Salt]]): groups
    * lineitem by return flag — a 3-value key whose hot groups each hold a
    * third of the table, the shape where one reducer gets crushed at
    * scale — via (key, salt) partials merged per key. Value-identical to
    * the plain GROUP BY the oracle runs: salting changes the plan, never
    * the result.
    */
  private def q33SaltedAgg(s: SparkSession, d: String): DataFrame =
    graft.ops.Salt.saltedCountSum(
      Tables.lineitem(s, d).select(col("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("price")),
      keys = Seq("l_returnflag"), sumCols = Seq("qty", "price"), factor = 8)
      .select(col("l_returnflag"), col("n_rows"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("sum_price").cast("double").as("sum_price"))

  /** Pivot (cross-tab): order counts per status × priority. The pivot
    * VALUES ARE DECLARED, not discovered — an undeclared pivot runs an
    * extra distinct-collect job over the pivot column and makes the output
    * schema data-dependent, both wrong at scale. With declared values this
    * is one ordinary hash aggregation (single shuffle), each pivot cell a
    * conditional count.
    */
  private def q56Pivot(s: SparkSession, d: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      // pivot emits the raw value as the column name; normalize to
      // identifier-safe names shared with the oracle, and fill the
      // empty-cell nulls to 0 (SQL conditional counts yield 0, not null)
      .withColumnsRenamed(prios.map(p => p -> ("n_" + p.substring(0, 1))).toMap)
      .na.fill(0L, prios.map(p => "n_" + p.substring(0, 1)))
  }

  /** Share-of-total: each nation's revenue as a fraction of the grand
    * total — the scalar-broadcast pattern: the grand total is a no-key
    * aggregate broadcast to every row (PlanSpec's cartesian guard
    * explicitly allows scalar builds), never a one-partition window.
    * Numerator and denominator are exact decimal sums; ONE double
    * division at the end is engine-identical.
    */
  private def q57ShareOfTotal(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("nrev"))
    val total = rev.agg(sum(col("nrev")).as("trev"))
    rev.crossJoin(total)
      .select(col("c_nationkey"),
        col("nrev").cast("double").as("nation_rev"),
        (col("nrev").cast("double") / col("trev").cast("double")).as("share"))
  }

  /** Intersect: customers holding BOTH an urgent and a low-priority order
    * (the set-op dual of q14's except; plans as a left-semi aggregate
    * join, one shuffle per side).
    */
  private def q58Intersect(s: SparkSession, d: String): DataFrame = {
    def byPrio(p: String) = Tables.orders(s, d)
      .filter(col("o_orderpriority") === p)
      .select(col("o_custkey").as("k"))
    byPrio("1-URGENT").intersect(byPrio("5-LOW"))
  }

  /** Full CUBE over (status, priority): all four grouping combinations in
    * one pass — the Expand-node dual of q12's ROLLUP. SQL form for the
    * same reason as q12 (the Dataset cube API false-positives Spark
    * 4.1.2's ambiguous-self-join check via the Expand node).
    */
  private def q71Cube(s: SparkSession, d: String): DataFrame = {
    val view = s"graft_q71_base_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .createOrReplaceTempView(view)
    try s.sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |FROM $view GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)
    finally s.catalog.dropTempView(view)
  }

  /** LAG: per customer, whole days since their previous order — the
    * keyed-window navigation function (inter-arrival analysis). The window
    * partitions by customer, so tasks scale with the keyspace; ties on
    * order date break by order key for a deterministic previous row.
    * Integer day gaps keep the oracle hash exact (raw dates never emitted
    * — engine timestamp affinities differ).
    */
  private def q72Lag(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        lag(col("o_orderdate"), 1).over(w).as("__prev"))
      .where(col("__prev").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), col("__prev")).as("days_since_prev"))
  }

  /** UNPIVOT/melt: the four lineitem measures to long (metric, value) form,
    * re-aggregated per metric. The Expand node emits one row per measure,
    * map-only; the lone shuffle is the 4-group final agg. The wide→long
    * reshape is the inverse of q56's pivot.
    */
  private def q76Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "val")
      .groupBy("metric")
      .agg(count(lit(1)).as("n"), dsum(col("val")).as("total"))

  /** The distribution-rank window family: quartile (NTILE), PERCENT_RANK,
    * CUME_DIST of every customer's balance within their nation. The
    * compound order (balance, custkey) is a total order, so every rank —
    * including NTILE's positional split — is deterministic, and both
    * fractions are single IEEE divisions of exact integer ranks.
    */
  private def q77RankFamily(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  /** GROUPING SETS with explicit grouping markers: the non-hierarchical
    * member of the q12/q71 family — an arbitrary set list (both-dims, each
    * dim alone) that neither ROLLUP nor CUBE expresses, with `GROUPING()`
    * bits distinguishing "grouped-out" from a genuine NULL key. SQL form
    * for the same Spark 4.1.2 Expand-node reason as q12/q71.
    */
  private def q79GroupingSets(s: SparkSession, d: String): DataFrame = {
    val view = s"graft_q79_base_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.orders(s, d)
      .select("o_orderstatus", "o_orderpriority", "o_totalprice")
      .createOrReplaceTempView(view)
    try s.sql(
      s"""SELECT o_orderstatus, o_orderpriority,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
         |  COUNT(*) AS n_orders,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         |FROM $view GROUP BY GROUPING SETS (
         |  (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority))""".stripMargin)
    finally s.catalog.dropTempView(view)
  }

  /** Trailing-3 moving window frame (`ROWS BETWEEN 2 PRECEDING AND CURRENT
    * ROW`): per customer in (date, key) order, the rolling order-value sum
    * and mean. The frame sum stays decimal (exact at any frame alignment);
    * the mean divides by the frame's own row count, so heads of groups
    * average over 1 and 2 rows — the standard warm-up semantics.
    */
  private def q82Rolling(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
    val dec = sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        dec.cast("double").as("mov3_sum"),
        (dec.cast("double") / count(lit(1)).over(w).cast("double"))
          .as("mov3_avg"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_cube" -> q71Cube _,
    "q72_lag" -> q72Lag _,
    "q76_unpivot" -> q76Unpivot _,
    "q77_rank_family" -> q77RankFamily _,
    "q79_grouping_sets" -> q79GroupingSets _,
    "q82_rolling" -> q82Rolling _,
    "q84_semi_join" -> q84SemiJoin _,
    "q56_pivot" -> q56Pivot _,
    "q57_share_of_total" -> q57ShareOfTotal _,
    "q58_intersect" -> q58Intersect _,
    "q01_project" -> q01Project _,
    "q02_filter" -> q02Filter _,
    "q03_agg_groupby" -> q03AggGroupBy _,
    "q04_join_agg" -> q04JoinAgg _,
    "q05_multi_join" -> q05MultiJoin _,
    "q06_topk" -> q06TopK _,
    "q07_distinct" -> q07Distinct _,
    "q08_window_rank" -> q08WindowRank _,
    "q09_explode" -> q09Explode _,
    "q10_anti_join" -> q10AntiJoin _,
    "q11_coalesce" -> q11Coalesce _,
    "q12_rollup" -> q12Rollup _,
    "q13_minmax" -> q13MinMax _,
    "q14_except" -> q14Except _,
    "q15_flatten_defaults" -> q15FlattenDefaults _,
    "q33_salted_agg" -> q33SaltedAgg _)

  val oracle: Map[String, String] = Map(
    "q79_grouping_sets" ->
      ("SELECT o_orderstatus, o_orderpriority, " +
        "CAST(GROUPING(o_orderstatus) AS INT) AS g_status, " +
        "CAST(GROUPING(o_orderpriority) AS INT) AS g_prio, " +
        "COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price " +
        "FROM orders GROUP BY GROUPING SETS (" +
        "(o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority))"),
    "q82_rolling" ->
      ("SELECT o_orderkey, o_custkey, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov3_sum, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) " +
        "  / CAST(COUNT(*) OVER w AS DOUBLE) AS mov3_avg " +
        "FROM orders WINDOW w AS (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate, o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"),
    // UNION ALL spelling (portable; DuckDB's UNPIVOT clause would also work)
    "q76_unpivot" ->
      ("SELECT metric, COUNT(*) AS n, " +
        "CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total FROM (" +
        "SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem " +
        "UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem " +
        "UNION ALL SELECT 'l_discount', l_discount FROM lineitem " +
        "UNION ALL SELECT 'l_tax', l_tax FROM lineitem) GROUP BY metric"),
    "q77_rank_family" ->
      ("SELECT c_custkey, c_nationkey, c_acctbal, " +
        "CAST(NTILE(4) OVER w AS INT) AS quartile, " +
        "PERCENT_RANK() OVER w AS pr, " +
        "CUME_DIST() OVER w AS cd " +
        "FROM customer WINDOW w AS (PARTITION BY c_nationkey " +
        "ORDER BY c_acctbal, c_custkey)"),
    "q71_cube" ->
      ("SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price " +
        "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"),
    "q72_lag" ->
      ("SELECT o_orderkey, o_custkey, " +
        "CAST(datediff('day', prev_date, o_orderdate) AS INT) AS days_since_prev " +
        "FROM (SELECT o_orderkey, o_custkey, o_orderdate, " +
        "  LAG(o_orderdate) OVER (PARTITION BY o_custkey " +
        "  ORDER BY o_orderdate, o_orderkey) AS prev_date FROM orders) " +
        "WHERE prev_date IS NOT NULL"),
    "q56_pivot" ->
      ("SELECT o_orderstatus, " +
        "COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_1, " +
        "COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_2, " +
        "COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_3, " +
        "COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_4, " +
        "COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_5 " +
        "FROM orders GROUP BY o_orderstatus"),
    "q57_share_of_total" ->
      ("WITH rev AS (SELECT c_nationkey, " +
        "  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS nrev " +
        "  FROM orders JOIN customer ON o_custkey = c_custkey " +
        "  GROUP BY c_nationkey), " +
        "t AS (SELECT SUM(nrev) AS trev FROM rev) " +
        "SELECT c_nationkey, CAST(nrev AS DOUBLE) AS nation_rev, " +
        "CAST(nrev AS DOUBLE) / CAST(trev AS DOUBLE) AS share FROM rev, t"),
    "q58_intersect" ->
      ("SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT' " +
        "INTERSECT " +
        "SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '5-LOW'"),
    "q01_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
    "q02_filter" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_date " +
        "FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderpriority = '1-URGENT'"),
    "q03_agg_groupby" ->
      ("SELECT l_returnflag, l_linestatus, " +
        s"${dsumSql("l_quantity")} AS sum_qty, " +
        s"${dsumSql("l_extendedprice")} AS sum_base_price, " +
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price, " +
        s"${davgSql("l_quantity")} AS avg_qty, " +
        "COUNT(*) AS count_order " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    "q04_join_agg" ->
      ("SELECT c_mktsegment, COUNT(*) AS n_orders, " +
        s"${dsumSql("o_totalprice")} AS revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"),
    "q05_multi_join" ->
      ("SELECT n_name, CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY n_name"),
    "q06_topk" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"),
    "q07_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q08_window_rank" ->
      ("SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (" +
        "SELECT c_nationkey, c_custkey, c_acctbal, " +
        "ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn " +
        "FROM customer) WHERE rn <= 3"),
    "q09_explode" ->
      "SELECT vec_id, UNNEST(embedding) AS val FROM embeddings WHERE vec_id < 50",
    "q10_anti_join" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT')"),
    "q84_semi_join" ->
      ("SELECT c_custkey, c_name FROM customer " +
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
        "AND o_orderpriority = '1-URGENT')"),
    "q11_coalesce" ->
      ("SELECT c_custkey, COALESCE(cnt, 0) AS n_orders, COALESCE(spend, 0.0) AS total_spend " +
        "FROM customer LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt, " +
        s"${dsumSql("o_totalprice")} AS spend FROM orders GROUP BY o_custkey) " +
        "ON c_custkey = o_custkey"),
    "q12_rollup" ->
      ("SELECT r_name, n_name, COUNT(*) AS n_suppliers, " +
        s"${dsumSql("s_acctbal")} AS total_bal " +
        "FROM supplier JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY ROLLUP (r_name, n_name)"),
    "q13_minmax" ->
      ("SELECT MAX(o_orderkey) AS max_key, MIN(o_orderkey) AS min_key, " +
        "COUNT(*) AS n_rows FROM orders"),
    "q14_except" ->
      ("SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING' " +
        "EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'"),
    "q15_flatten_defaults" ->
      ("WITH nested AS (SELECT c_custkey, " +
        "CASE WHEN c_custkey % 3 <> 0 THEN struct_pack(name := c_name, nk := c_nationkey) END AS info, " +
        "CASE WHEN c_custkey % 4 <> 0 THEN [struct_pack(bal := c_acctbal, seg := c_mktsegment)] " +
        "ELSE [] END AS items FROM customer) " +
        "SELECT c_custkey, COALESCE(info.name, 'unknown') AS name, " +
        "COALESCE(info.nk, -1) AS nk, " +
        "COALESCE(items[1].bal, 0.0) AS bal0, " +
        "COALESCE(items[1].seg, 'NONE') AS seg0 FROM nested"),
    // plain GROUP BY: the salted two-phase plan must be value-identical
    "q33_salted_agg" ->
      ("SELECT l_returnflag, COUNT(*) AS n_rows, " +
        s"${dsumSql("l_quantity")} AS sum_qty, " +
        s"${dsumSql("l_extendedprice")} AS sum_price " +
        "FROM lineitem GROUP BY l_returnflag"))
}
