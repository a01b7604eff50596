package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Exact-moments statistics: agreement with the textbook definitions,
  * partition-order invariance (the property Spark's running-double
  * covar_pop/corr lacks), and boundary-exact histogram binning.
  */
class StatsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val xs = Seq(1.00, 2.50, 3.25, 10.00, 7.75, 4.50)
  private val ys = Seq(2.00, 4.75, 6.25, 21.00, 15.25, 9.50)

  private def expectedCovCorr: (Double, Double) = {
    val n = xs.size.toDouble
    val mx = xs.sum / n
    val my = ys.sum / n
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / n
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / n
    val vy = ys.map(y => (y - my) * (y - my)).sum / n
    (cov, cov / math.sqrt(vx * vy))
  }

  test("covarCorr matches the textbook population definitions") {
    val df = xs.zip(ys).map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val got = Stats.covarCorr(df, Seq("g"), "x", "y")
      .select("n_rows", "covar_pop", "corr")
      .as[(Long, Double, Double)].head()
    val (cov, corr) = expectedCovCorr
    assert(got._1 == xs.size.toLong)
    assert(math.abs(got._2 - cov) < 1e-9, s"covar ${got._2} vs $cov")
    assert(math.abs(got._3 - corr) < 1e-12, s"corr ${got._3} vs $corr")
  }

  test("covarCorr is bit-identical across partition layouts") {
    val rows = (1 to 999).map(i => ("g", (i % 97) + 0.25, ((i * 7) % 89) + 0.5))
    def run(parts: Int): (Double, Double) = {
      val df = rows.toDF("g", "x", "y").repartition(parts)
      Stats.covarCorr(df, Seq("g"), "x", "y")
        .select("covar_pop", "corr").as[(Double, Double)].head()
    }
    val one = run(1)
    assert(run(7) == one && run(32) == one) // == on doubles: BIT equality
  }

  test("perfectly linear data gives corr exactly 1") {
    val df = (1 to 50).map(i => ("g", i.toDouble, 3.0 * i)).toDF("g", "x", "y")
    val corr = Stats.covarCorr(df, Seq("g"), "x", "y")
      .select("corr").as[Double].head()
    assert(math.abs(corr - 1.0) < 1e-12)
  }

  test("histogram bins boundary values exactly") {
    // width 10.00: 9.99 -> bin 0, 10.00 -> bin 1 (no double-division drift)
    val df = Seq(0.00, 9.99, 10.00, 10.01, 19.99, 20.00, 25.50)
      .map(("r", _)).toDF("r", "v")
    val got = Stats.histogram(df, "v", binWidth = 10.0)
      .orderBy("bin").as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((0L, 0.0, 2L), (1L, 10.0, 3L), (2L, 20.0, 2L)))
  }

  test("histogram floors negative values into the lower bin") {
    // floor semantics: -0.01 belongs to [-10, 0), -10.00 to [-10, 0),
    // -10.01 to [-20, -10) — truncation-toward-zero would misplace all
    val df = Seq(-0.01, -9.99, -10.00, -10.01, 5.00)
      .map(("r", _)).toDF("r", "v")
    val got = Stats.histogram(df, "v", binWidth = 10.0)
      .orderBy("bin").as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((-2L, -20.0, 1L), (-1L, -10.0, 3L), (0L, 0.0, 1L)))
  }

  test("histogram counts partition the input") {
    val df = TestSpark.spark.read
      .parquet(s"${TestSpark.sf}/orders.parquet")
    val h = Stats.histogram(df, "o_totalprice", binWidth = 20000.0)
    assert(h.agg(sum("n_rows")).as[Long].head() == df.count())
    // bin_lo is always bin * width
    val bad = h.where(col("bin_lo") =!= col("bin") * lit(20000.0)).count()
    assert(bad == 0)
  }
}
