package graft

/** Plan-inspection utility: print the formatted physical plan (and
  * optionally run) a registered query. Usage:
  *
  *   sbt "runMain graft.Explain q47_range_join /root/testdata/sf0.01 [run]"
  *
  * `run` additionally executes the query with a noop write so AQE's final
  * adaptive plan (broadcast conversions, coalesced partitions) is printed
  * too — the static plan alone understates what actually executes.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val doRun = args.length > 2 && args(2) == "run"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (doRun) {
      df.write.format("noop").mode("overwrite").save()
      println("=== final adaptive plan ===")
      println(df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
