package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Quantiles

/** Grouped-quantile semantics: exact interpolation at rank p*(n-1) (the
  * definition shared with the DuckDB oracle), and the sketch path staying
  * within its rank-error bound.
  */
class QuantilesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("exactQuantiles interpolates at rank p*(n-1)") {
    // group a: 5 values [10,20,30,40,50] -> p25 at rank 1.0 = 20 exactly,
    //   p50 = 30, p75 at rank 3.0 = 40
    // group b: 4 values [1,2,3,10] -> p25 at rank 0.75 = 1.75,
    //   p50 at rank 1.5 = 2.5, p75 at rank 2.25 = 3 + 0.25*7 = 4.75
    val df = (Seq(10, 20, 30, 40, 50).map(("a", _)) ++
      Seq(1, 2, 3, 10).map(("b", _))).toDF("g", "v")
    val got = Quantiles
      .exactQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.75))
      .orderBy("g")
      .as[(String, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 20.0, 30.0, 40.0, 5L),
      ("b", 1.75, 2.5, 4.75, 4L)))
  }

  test("single-value and two-value groups") {
    val df = Seq(("solo", 7), ("pair", 0), ("pair", 100)).toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, Seq("g"), "v", Seq(0.5))
      .orderBy("g").as[(String, Double, Long)].collect().toSeq
    assert(got == Seq(("pair", 50.0, 2L), ("solo", 7.0, 1L)))
  }

  test("approxQuantiles stays within rank error of exact on skewed data") {
    // long-tailed values, one group; accuracy 10000 on 2000 rows => the
    // sketch answer's rank must be within n/accuracy = 0.2 ranks, i.e. an
    // adjacent order statistic at worst
    val vals = (1 to 2000).map(i => ("g", i * i))
    val df = vals.toDF("g", "v")
    val exact = Quantiles.exactQuantiles(df, Seq("g"), "v", Seq(0.5))
      .select("p50").as[Double].head()
    val approx = Quantiles.approxQuantiles(df, Seq("g"), "v", Seq(0.5))
      .select("p50").as[Double].head()
    val sorted = vals.map(_._2.toDouble).sorted
    val rankOfApprox = sorted.indexWhere(_ >= approx)
    val rankOfExact = sorted.indexWhere(_ >= exact)
    assert(math.abs(rankOfApprox - rankOfExact) <= 1,
      s"approx=$approx exact=$exact")
  }
}
