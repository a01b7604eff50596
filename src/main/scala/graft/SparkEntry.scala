package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{DocOps, EventOps, JoinOps, KeyOps, MediaOps, Relational, SimOps, StatOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (one entry per SURVEY.md §2
  * operator / engine-extension op); `oracleSql` holds the DuckDB-equivalent
  * SQL for each hash-checkable query (column names aligned with the Spark
  * result).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q05_multi_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ KeyOps.queries ++ TextOps.queries ++ SimOps.queries ++
      EventOps.queries ++ MediaOps.queries ++ JoinOps.queries ++
      StatOps.queries ++ DocOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ KeyOps.oracle ++ TextOps.oracle ++ SimOps.oracle ++
      EventOps.oracle ++ MediaOps.oracle ++ JoinOps.oracle ++
      StatOps.oracle ++ DocOps.oracle
}
