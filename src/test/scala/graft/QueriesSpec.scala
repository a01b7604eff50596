package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + targeted assertions for the declared query inventory at sf0.001.
  * Full value-level verification is the driver's DuckDB oracle (and
  * tools/check_correctness.py locally); these tests guard plan validity and
  * a few known invariants so `sbt test` catches regressions fast.
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark.{sf, spark}

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name analyzes and executes") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q105 exactness invariant: per-language distinct tokens < capacity") {
    // q105's oracle hash-exactness relies on the sketch's never-evict
    // regime: every language's distinct-token count (generator vocabulary
    // + the planted hot_<lang> term) must stay under the hard-coded
    // capacity 64. If the test-data generator's vocabulary ever grows past
    // it, fail HERE at the named invariant — not at the oracle hash with a
    // confusing count diff far from the cause.
    import org.apache.spark.sql.functions._
    val maxDistinct = graft.core.Tables.documents(spark, sf)
      .select(col("lang"),
        explode(graft.ops.TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("lang").agg(countDistinct(col("term")).as("nd"))
      .agg(max(col("nd"))).head().getLong(0)
    assert(maxDistinct + 1 < 64, // +1 for the planted hot_<lang> token
      s"per-language vocabulary ($maxDistinct distinct tokens + 1 planted) " +
        "no longer fits q105's capacity-64 exact regime — raise the " +
        "capacity in q105TopkTerms or shrink the generator vocabulary")
  }

  test("weighted graft_topk ranks a count table exactly under capacity") {
    // the 4-arg form over a pre-aggregated (item, weight) table, through
    // Spark's full partial/merge path: exact (weight-sum desc, item asc)
    // top-2 per group; null and non-positive weights contribute nothing
    import spark.implicits._
    val rows = Seq(
      ("g1", "a", Some(5L)), ("g1", "b", Some(7L)), ("g1", "a", Some(4L)),
      ("g1", "c", Some(9L)), ("g1", "d", None), ("g1", "e", Some(0L)),
      ("g2", "x", Some(2L)), ("g2", "y", Some(2L))).toDF("g", "term", "w")
    rows.repartition(8).createOrReplaceTempView("wtopk_in")
    val r = spark.sql(
      "SELECT g, graft_topk(term, w, 2, 16) AS tk FROM wtopk_in GROUP BY g")
      .selectExpr("g", "tk[0].item", "tk[0].cnt",
        "tk[1].item", "tk[1].cnt")
      .as[(String, String, Long, String, Long)].collect().toSet
    assert(r == Set(
      ("g1", "a", 9L, "c", 9L), // a=5+4 ties c=9; item asc puts a first
      ("g2", "x", 2L, "y", 2L)))
  }

  test("graft_topk never misses the heavy hitter, even past capacity") {
    // estimation regime (capacity 2 << 101 distinct), exercised through
    // Spark's full partial/serialize/merge path across 32 partitions: the
    // planted majority item (60% of the stream) must surface at rank 1
    // with its count an overestimate bounded by err — the space-saving
    // guarantee the sketch exists for, beyond q105's exact regime
    import spark.implicits._
    val n = 20000
    val rnd = new scala.util.Random(3)
    val stream = (1 to n).map(i =>
      if (rnd.nextDouble() < 0.6) "hot" else s"cold_${rnd.nextInt(100)}")
    val trueHot = stream.count(_ == "hot").toLong
    val r = stream.toDF("term").repartition(32)
      .selectExpr("graft_topk(term, 1, 2) AS tk")
      .selectExpr("tk[0].item AS item", "tk[0].cnt AS cnt")
      .as[(String, Long)].collect()
    assert(r.length == 1)
    assert(r.head._1 == "hot")
    assert(r.head._2 >= trueHot && r.head._2 <= n.toLong)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  test("q03 groups by returnflag x linestatus") {
    val rows = SparkEntry.queries("q03_agg_groupby")(spark, sf).collect()
    assert(rows.length >= 1 && rows.length <= 6)
    val cnt = rows.map(_.getAs[Long]("count_order")).sum
    assert(cnt == TestSpark.spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("q12 drops its temp view after building the plan (no catalog leak)") {
    SparkEntry.queries("q12_rollup")(spark, sf).collect()
    SparkEntry.queries("q12_rollup")(spark, sf).collect()
    val leftover = spark.catalog.listTables().collect()
      .count(_.name.startsWith("graft_q12"))
    assert(leftover == 0)
  }

  test("q13 minmax returns one row with max >= min") {
    val r = SparkEntry.queries("q13_minmax")(spark, sf).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("max_key") >= r(0).getAs[Long]("min_key"))
  }

  test("q90 leakage split keeps every near-dup pair on one side") {
    import org.apache.spark.sql.functions.col
    val split = SparkEntry.queries("q90_leakage_split")(spark, sf)
    val sides = split.select("doc_id", "side")
    // same pair graph q90 derives its cluster labels from
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = ops.NearDup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, minJaccard = 0.8)
    val straddling = pairs
      .join(sides.select(col("doc_id").as("i"), col("side").as("si")), "i")
      .join(sides.select(col("doc_id").as("j"), col("side").as("sj")), "j")
      .filter(col("si") =!= col("sj"))
    assert(straddling.count() == 0)
    val bySide = split.groupBy("side").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySide.getOrElse("train", 0L) > 0L)
    assert(bySide.getOrElse("val", 0L) > 0L)
  }

  test("q92 bm25 scores are positive, sorted desc, tiebroken by id") {
    val r = SparkEntry.queries("q92_bm25")(spark, sf).collect()
    assert(r.length == 10)
    val pairs = r.map(x => (x.getAs[Double]("score"), x.getAs[Long]("doc_id")))
    assert(pairs.forall(_._1 > 0.0))
    assert(pairs.zip(pairs.tail).forall { case ((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2) })
    assert(r.forall(x => (1L to 3L).contains(x.getAs[Long]("n_terms"))))
  }

  test("q96 epoch order: dense 1..2N positions, full permutation per epoch") {
    val r = SparkEntry.queries("q96_epoch_order")(spark, sf).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("epoch"),
        x.getAs[Long]("position")))
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(r.length == 2 * n)
    assert(r.map(_._3).sorted.toSeq == (1L to 2 * n))
    val byEpoch = r.groupBy(_._2)
    assert(byEpoch.keySet == Set(0L, 1L))
    // each epoch covers every document exactly once
    assert(byEpoch(0L).map(_._1).toSet == byEpoch(1L).map(_._1).toSet)
    assert(byEpoch(0L).length == n)
    // epochs are contiguous blocks in the order
    assert(byEpoch(0L).map(_._3).max < byEpoch(1L).map(_._3).min)
    // the epochs genuinely reshuffle: epoch 1 must not be epoch 0, nor any
    // cyclic ROTATION of it (an additive epoch offset mod 1e6 — the bug
    // class — shifts the order without reshuffling it)
    val perm0 = byEpoch(0L).sortBy(_._3).map(_._1).toSeq
    val perm1 = byEpoch(1L).sortBy(_._3).map(_._1).toSeq
    assert(perm0 != perm1)
    val start = perm0.indexOf(perm1.head)
    assert(start >= 0 && (perm0.drop(start) ++ perm0.take(start)) != perm1,
      "epoch 1 is a cyclic rotation of epoch 0 — not an independent shuffle")
  }

  test("q101 interleave: any prefix of the stream is source-balanced") {
    val r = SparkEntry.queries("q101_interleave")(spark, sf).collect()
      .map(x => (x.getAs[Long]("position"), x.getAs[String]("source")))
      .sortBy(_._1)
    val nSources = r.map(_._2).distinct.length
    assert(r.map(_._1).toSeq == (1L to r.length))
    // within every full round (one doc from each source while all sources
    // still have docs), each source appears exactly once; rounds are only
    // "full" while the SMALLEST source still has documents — total/nSources
    // would overcount under size skew
    val fullRounds = r.groupBy(_._2).values.map(_.size).min
    for (k <- 0 until math.min(fullRounds, 5)) {
      val window = r.slice(k * nSources, (k + 1) * nSources).map(_._2)
      assert(window.distinct.length == nSources, s"round $k: $window")
    }
  }

  test("q06 topk is sorted desc and limited") {
    val r = SparkEntry.queries("q06_topk")(spark, sf).collect()
    assert(r.length == 10)
    val prices = r.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }
}
