package graft.tools

/** Dump `.explain("formatted")` for a list of registered queries into
  * per-query files — the optimization round's plan-evidence collector
  * (plans/r20/<query>_{before,after}.txt). Diagnostic only; never invoked
  * by the driver.
  *
  * Usage:
  *   sbt "runMain graft.tools.ExplainMany <sfDir> <outDir> <suffix> q1 q2 ..."
  * writes <outDir>/<q>_<suffix>.txt for each query.
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainMany <sfDir> <outDir> <suffix> <query> [query...]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[explain] wrote $name")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
