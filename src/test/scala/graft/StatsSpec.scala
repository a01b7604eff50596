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

  test("madProfile: hand-computed median, MAD, and outlier count") {
    // values 1..9 plus a wild 1000: median 5.5, deviations
    // {4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5} -> MAD 2.5;
    // 3*MAD = 7.5, only 994.5 exceeds it
    val df = ((1 to 9).map(v => ("g", v)) :+ (("g", 1000)))
      .toDF("g", "v")
    val out = graft.ops.Stats.madProfile(df, Seq("g"), "v", k = 3.0)
      .select("g", "med", "mad", "n_rows", "n_outliers")
      .as[(String, Double, Double, Long, Long)].collect().toSeq
    assert(out == Seq(("g", 5.5, 2.5, 10L, 1L)))
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

  test("approx_count_distinct stays within 3·rsd of the exact count (q67's gate)") {
    // high-cardinality synthetic column across several group sizes and rsd
    // settings — the bound q67 plants as its oracle-checked boolean. HLL++
    // is deterministic on a fixed input set, so these are regression pins,
    // not flaky statistical tests.
    val df = (1 to 60000).map(i => (s"g${i % 3}", s"user_${i % 20011}"))
      .toDF("g", "u")
    for (rsd <- Seq(0.01, 0.05, 0.10)) {
      val rows = df.groupBy("g")
        .agg(countDistinct(col("u")).as("exact"),
          approx_count_distinct(col("u"), rsd).as("approx"))
        .as[(String, Long, Long)].collect()
      for ((g, exact, approx) <- rows) {
        val rel = math.abs(approx - exact).toDouble / exact
        assert(rel <= 3 * rsd, s"group $g rsd $rsd: approx $approx vs $exact (rel $rel)")
      }
    }
  }

  test("approx-distinct partial merge is partition-order invariant") {
    // the sketch merge (register-wise max) must give the same answer no
    // matter how rows are split across partitions — the property that makes
    // the one-shuffle plan safe at any parallelism
    val df = (1 to 30000).map(i => s"k${i % 7919}").toDF("u")
    val base = df.agg(approx_count_distinct(col("u"), 0.05)).as[Long].head()
    for (parts <- Seq(1, 5, 32)) {
      val got = df.repartition(parts)
        .agg(approx_count_distinct(col("u"), 0.05)).as[Long].head()
      assert(got == base, s"parts=$parts")
    }
  }

  test("keySkewProfile: exact shares, null keys excluded, rank tiebreak") {
    import graft.ops.Checks
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c") ++
      Seq(null, null).map(_.asInstanceOf[String]))
      .toDF("k")
    val out = Checks.keySkewProfile(df, "k", topK = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getInt(4)))
    // total non-null rows = 9, distinct keys = 3
    assert(out.toSeq == Seq(("a", 5L, 5.0 / 9.0, 3L, 1),
      ("b", 3L, 3.0 / 9.0, 3L, 2)))
  }
}
