package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Salt

/** Salting must change the plan (spreading hot keys), never the result. */
class SaltSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** 90% of rows on one hot key — the aggregation-skew shape. */
  private def skewed = (1 to 1000).map { i =>
    val k = if (i % 10 == 0) s"cold_${i % 97}" else "hot"
    (k, i.toLong, (i % 7).toString)
  }.toDF("k", "v", "tag")

  test("saltedCountSum equals the unsalted groupBy") {
    val salted = Salt.saltedCountSum(skewed, Seq("k"), Seq("v"), factor = 8)
      .as[(String, Long, Long)].collect().toSet
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedCountSum spreads the hot key across salt partials") {
    val others = skewed.columns.filterNot(_ == "k").map(col).toSeq
    val salts = skewed.filter(col("k") === "hot")
      .select(Salt.saltExpr(8, others).as("s"))
      .distinct().as[Int].collect()
    assert(salts.length > 4, s"hot key used only ${salts.length} salts of 8")
    assert(salts.forall(s => s >= 0 && s < 8))
  }

  test("saltedJoin inner equals the plain join") {
    val right = Seq(("hot", "H"), ("cold_1", "C1"), ("cold_5", "C5"))
      .toDF("k", "label")
    val salted = Salt.saltedJoin(skewed, right, Seq("k"), factor = 4)
      .select("k", "v", "label").as[(String, Long, String)].collect().sorted
    val plain = skewed.join(right, Seq("k"))
      .select("k", "v", "label").as[(String, Long, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin left_outer keeps unmatched left rows exactly once") {
    val right = Seq(("cold_1", "C1")).toDF("k", "label")
    val salted = Salt.saltedJoin(skewed, right, Seq("k"), 4, "left_outer")
    assert(salted.count() == 1000)
    assert(salted.filter(col("label").isNull).count() ==
      skewed.filter(col("k") =!= "cold_1").count())
  }

  test("salt is deterministic across evaluations") {
    val c = Seq(col("v"), col("tag"))
    val a = skewed.select(Salt.saltExpr(16, c).as("s")).as[Int].collect()
    val b = skewed.select(Salt.saltExpr(16, c).as("s")).as[Int].collect()
    assert(a.toSeq == b.toSeq)
  }
}
