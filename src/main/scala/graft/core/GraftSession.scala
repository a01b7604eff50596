package graft.core

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the engine.
  *
  * Defaults are tuned for correctness-at-scale first:
  *  - AQE on (runtime re-plan, skew-join splitting, dynamic coalesce) so the
  *    same declarative plan that passes at sf0.01 survives a 100x scale-up.
  *  - shuffle partitions sized to the local core count for tests; on a real
  *    cluster this is expected to be overridden (or left to AQE coalescing).
  *  - UTC session timezone everywhere — the reference's data model is
  *    millisecond UTC timestamps (see SURVEY.md §1.3).
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      // custom codegen'd expressions (graft_dot — see graft.functions)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // spark.sql.objectHashAggregate.sortBased.fallbackThreshold stays at
      // its 128 default DELIBERATELY, measured: raising it to 8192 changed
      // graft_topk timings by nothing at our group counts (sketch buffers
      // are capacity-bounded), while the same knob governs every
      // collect_list/collect_set aggregation — whose per-group buffers are
      // UNBOUNDED — so a session-wide raise trades a real OOM hazard for
      // no measured win. Revisit per-query if a many-group sketch workload
      // ever shows the sort fallback in its profile.
      // testdata's events.parquet carries TIMESTAMP(NANOS) (pandas-written);
      // Spark has no nanos timestamp type, so read the raw int64 and let
      // Tables.events convert (div 1000 → micros). Without this flag the
      // scan itself throws PARQUET_TYPE_ILLEGAL.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // storage-partitioned joins/aggregations over co-partitioned
      // document drops (the doc scan reports KeyGroupedPartitioning when
      // asked — reportPartitioning option): inert for every other scan
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = builder(s"local[$cores]", math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
