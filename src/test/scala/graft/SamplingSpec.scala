package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Stratified top-k sampling: the filter-and-refine path must equal the
  * naive full-window argsort exactly — including groups smaller than k
  * (whole group returned) and groups forced through the shortfall
  * fallback — and stay invariant to partitioning.
  */
class SamplingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def naive(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val h = pmod(pmod(col("id"), lit(1000000L)) * 435761L, lit(1000000L))
    val w = Window.partitionBy("g").orderBy(h.asc, col("id").asc)
    df.where(col("g").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("id", "g", "rank")
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Int)].collect().toSet

  test("equals the naive window argsort on random grouped data") {
    val rnd = new scala.util.Random(314)
    for (trial <- 1 to 3) {
      val rows = (1 to 5000).map(_ =>
        (rnd.nextLong().abs % 1000000L, s"g${rnd.nextInt(6)}"))
        .distinct
      val df = rows.toDF("id", "g").repartition(7)
      val got = Sampling.stratifiedTopK(df, "g", "id", k = 40)
      assert(asSet(got) == asSet(naive(df, 40)), s"trial $trial")
    }
  }

  test("groups smaller than k return their whole membership, ranked") {
    // g_small has 3 rows < k=5 -> all 3, ranks 1..3 (the shortfall path)
    val df = ((1L to 100L).map((_, "big")) ++ Seq((7L, "small"), (8L, "small"),
      (9L, "small")) ++ Seq((5L, null.asInstanceOf[String]))).toDF("id", "g")
    val got = Sampling.stratifiedTopK(df, "g", "id", k = 5)
    assert(asSet(got) == asSet(naive(df, 5)))
    assert(got.where(col("g") === "small").count() == 3)
    assert(got.where(col("g") === "big").count() == 5)
    assert(got.where(col("g").isNull).count() == 0)
  }

  test("result is invariant to input partitioning and rerun-identical") {
    val rows = (1 to 3000).map(i => (i.toLong * 13L, s"g${i % 4}"))
    val a = asSet(Sampling.stratifiedTopK(rows.toDF("id", "g").repartition(3), "g", "id", 25))
    val b = asSet(Sampling.stratifiedTopK(rows.toDF("id", "g").repartition(17), "g", "id", 25))
    assert(a == b && a.nonEmpty)
  }
}
