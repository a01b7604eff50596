package graft.tools

/** Dev probe: print shuffle-exchange counts and join keys for the queries
  * named on the command line (or a built-in default list). Not part of the
  * driver contract; used to choose PlanSpec pin values honestly.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q73_lm_score", "q74_repetition", "q75_semantic_dedup",
      "q76_unpivot", "q77_rank_family", "q78_winnow_pairs",
      "q79_grouping_sets", "q80_cohort_retention", "q81_funnel",
      "q82_rolling")
    val spark = graft.core.GraftSession.local(8)
    for (n <- names) {
      val qe = graft.SparkEntry.queries(n)(spark, sf)
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
        .queryExecution
      val s = "Exchange (hash|range)partitioning".r
        .findAllIn(qe.executedPlan.toString).size
      val joins = qe.sparkPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
          s"${j.nodeName}(keys=${j.leftKeys.size})"
      }
      println(s"PROBE $n shuffles=$s joins=[${joins.mkString(",")}]")
    }
    spark.stop()
  }
}
