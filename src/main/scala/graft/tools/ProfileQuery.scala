package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Optimization-round instrumentation (guide §1: measure first): run named
  * queries once warm + once measured under a SparkListener and print the
  * per-JOB wall-time breakdown, so "q144 takes 3 s" decomposes into "which
  * of its ~20 sequential driver actions cost what". Diagnostic only — never
  * invoked by the driver; Bench methodology is untouched.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileQuery <sfDir> q144_opq_pq_saved [more...]"
  */
object ProfileQuery {

  private final case class JobRow(id: Int, desc: String, start: Long,
      var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQuery <sfDir> <query> [query...]")
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.LinkedHashMap.empty[Int, JobRow]
    // stageId -> jobId from each job's announced stages, so a stage of a
    // concurrent or late-finishing job is credited to ITS job rather
    // than the most recently started one (the concurrent-driver-action
    // lifecycle queries overlap jobs deliberately)
    val stageJob = mutable.HashMap.empty[Int, Int]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.lastOption.map(_.name))
          .getOrElse("")
        jobs(e.jobId) = JobRow(e.jobId, desc, e.time)
        e.stageInfos.foreach(si => stageJob(si.stageId) = e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          stageJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
          }
        }
    }

    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warm-up (JIT + codegen cache + parquet footers), discarded
      spark.catalog.clearCache()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()

      jobs.clear()
      stageJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain (public API has no wait)
      spark.sparkContext.removeSparkListener(listener)

      val rows = jobs.values.toSeq
      val jobSum = rows.map(j => math.max(0L, j.end - j.start)).sum / 1e3
      println(f"\n=== $name wall=${wall}%.3f s jobs=${rows.size} jobSum=${jobSum}%.3f s (gap=${wall - jobSum}%.3f s driver-side) ===")
      for (j <- rows) {
        val dur = math.max(0L, j.end - j.start) / 1e3
        println(f"  job ${j.id}%4d ${dur}%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
