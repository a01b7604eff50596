package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main. Prints exactly ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Methodology (fixes the round-1/2 harness defects):
  *  - the measured action is a `noop`-format write, which fully evaluates
  *    every output column; `.count()` would let Catalyst prune all columns
  *    and benchmark little more than parquet footer reads.
  *  - one discarded warm-up pass per query (JIT + parquet footer cache),
  *    then `measuredRuns` timed passes; the reported time is the minimum
  *    (least-noise estimator for a cold-cache-free steady state).
  *  - a failing query is NOT recorded as a fast time: it is reported in an
  *    "errors" object, excluded from the total, and flips the exit code.
  *  - the session comes from [[graft.core.GraftSession]] so bench and
  *    verify run under identical configs (UTC timezone, AQE, thresholds).
  */
object Bench {

  private val measuredRuns = 3

  private def runOnce(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val allRuns = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // SPARK_GRAFT_BENCH_ONLY=q45_asof_join,q52_dedup_clusters runs just the
    // named queries — a single-query re-run takes seconds instead of the
    // ~7-minute full registry, which is what adjudicating a noise-vs-
    // regression question actually needs (run the suspect 2-3 times).
    // Unknown names fail loudly rather than silently benching nothing.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { sel =>
      val unknown = sel -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(",")}")
    }
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }

    for ((name, fn) <- selected) {
      try {
        runOnce(fn(spark, sfDir)) // warm-up, discarded (JIT + parquet footer cache)
        val runs = (1 to measuredRuns).map { _ =>
          // Queries that persist() intermediate state (inverted shingle
          // indexes, MinHash signatures, IVF corpora) would otherwise reuse
          // the cache blocks left behind by the warm-up / previous pass —
          // CacheManager matches canonicalized plans across invocations.
          // Clearing here makes every measured pass pay for its own index
          // construction, so the reported time is the true end-to-end cost.
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          runOnce(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = runs.min
        // every raw pass is reported too: single-query numbers on this
        // shared box can swing several-fold run-to-run, and a reader
        // adjudicating a regression needs the spread, not just the min
        allRuns(name) = runs
        spark.catalog.clearCache()
      } catch {
        case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
          errors(name) = msg
          System.err.println(s"[bench] FAILED $name — $msg")
      }
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    // median per query alongside the min: the min is the steady-state
    // estimator, but a regression gate wants the run-to-run center — on a
    // shared box single runs can swing several-fold, and a future verdict
    // comparing medians is robust to one lucky/unlucky pass
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val medians = allRuns.map { case (k, v) => k -> median(v) }
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val ms = medians.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val rs = allRuns.map { case (k, v) =>
      s"${jstr(k)}:${v.mkString("[", ",", "]")}" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val medianTotal = medians.values.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","median_total":$medianTotal,"queries":$qs,"medians":$ms,"runs":$rs,"errors":$es,"sf":${jstr(sfDir)}}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
