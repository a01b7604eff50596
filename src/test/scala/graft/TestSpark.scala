package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = graft.core.GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
}
