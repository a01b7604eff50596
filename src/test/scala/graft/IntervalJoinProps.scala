package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.ExtendedJson
import graft.ingest.v2.ZoneMaps
import graft.plans.RangeIntervalJoinExec

/** Randomized differential sweep for the interval-overlap sweep join:
  * random points (banded on k) and random intervals (banded on s, e
  * zone-indexed, widths from zero through several band spans, nullable
  * e, duplicate endpoints) are landed and joined on
  * `s ⊙ k AND k ⊙ e` in all strictness combinations plus LEFT OUTER
  * and residual forms; every result is checked multiset-exact against
  * the answer computed directly from the generated rows, the plan is
  * asserted to be the sweep exec (zero shuffle, no nested loop), and
  * the output's point-key ordering claim is verified on the collected
  * stream. Refusal pins: an unindexed e (no width bound) and a
  * dialed-down active-set cap both fall through to Spark's own
  * nested-loop plan — and that plan's answer matches too.
  */
class IntervalJoinProps extends AnyFunSuite {
  import TestSpark.spark

  private val pSchema = StructType(Seq(
    StructField("k", LongType), StructField("pv", StringType)))
  private val iSchema = StructType(Seq(
    StructField("s", LongType), StructField("e", LongType),
    StructField("iv", StringType)))

  private def genPoints(rnd: scala.util.Random, tag: String, pool: Int,
      maxFiles: Int): (String, Seq[(Long, String)]) = {
    val root = Files.createTempDirectory(s"graft_ivp$tag").toString
    val all = Seq.newBuilder[(Long, String)]
    var uid = 0
    (0 until 1 + rnd.nextInt(maxFiles)).foreach { f =>
      val keys = Seq.fill(1 + rnd.nextInt(14))(rnd.nextInt(pool).toLong)
        .sorted
      val rows = keys.map { k => uid += 1; (k, s"p$f-$uid") }
      all ++= rows
      Files.write(Paths.get(root, f"f$f%02d.jsonl"),
        (rows.map { case (k, v) => s"""{"k": $k, "pv": "$v"}""" }
          .mkString("\n") + "\n").getBytes("UTF-8"))
    }
    (root, all.result())
  }

  /** Intervals: files sorted on s; e = s + width (0..maxW), ~1 in 5
    * null (omitted — matches nothing).
    */
  private def genIntervals(rnd: scala.util.Random, tag: String, pool: Int,
      maxFiles: Int, maxW: Int)
      : (String, Seq[(Long, Option[Long], String)]) = {
    val root = Files.createTempDirectory(s"graft_ivi$tag").toString
    val all = Seq.newBuilder[(Long, Option[Long], String)]
    var uid = 0
    (0 until 1 + rnd.nextInt(maxFiles)).foreach { f =>
      val ss = Seq.fill(1 + rnd.nextInt(10))(rnd.nextInt(pool).toLong)
        .sorted
      val rows = ss.map { s =>
        uid += 1
        val e = if (rnd.nextInt(5) == 0) None
          else Some(s + rnd.nextInt(maxW + 1).toLong)
        (s, e, s"i$f-$uid")
      }
      all ++= rows
      Files.write(Paths.get(root, f"g$f%02d.jsonl"),
        (rows.map {
          case (s, Some(e), v) => s"""{"s": $s, "e": $e, "iv": "$v"}"""
          case (s, None, v) => s"""{"s": $s, "iv": "$v"}"""
        }.mkString("\n") + "\n").getBytes("UTF-8"))
    }
    (root, all.result())
  }

  private def planIsSweep(df: DataFrame, ctx: String): Unit = {
    val ns = TestPlans.executedNodes(df)
    assert(ns.exists(_.isInstanceOf[RangeIntervalJoinExec]) &&
      !ns.exists(_.isInstanceOf[ShuffleExchangeLike]) &&
      !ns.exists(_.nodeName.contains("NestedLoop")),
      s"$ctx: must plan the sweep: " + ns.map(_.nodeName).mkString(", "))
  }

  test("randomized interval layouts: sweep join matches the direct answer") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val pool = 20 + rnd.nextInt(60)
      val maxW = 1 + rnd.nextInt(pool)
      val (pDir, pRows) = genPoints(rnd, s"p$seed", pool, 4)
      val (iDir, iRows) = genIntervals(rnd, s"i$seed", pool, 3, maxW)
      ZoneMaps.build(spark, pDir, pSchema, Seq("k"))
      ZoneMaps.build(spark, iDir, iSchema, Seq("s", "e"))
      val p = ExtendedJson.read(spark, pSchema, pDir,
        Map("zoneMaps" -> "true"))
      val iv = ExtendedJson.read(spark, iSchema, iDir,
        Map("zoneMaps" -> "true"))
      val ctx = s"seed=$seed pool=$pool w=$maxW " +
        s"p=${pRows.size} i=${iRows.size}"

      def direct(sOk: (Long, Long) => Boolean, eOk: (Long, Long) => Boolean)
          : Seq[(Long, String, Long, Long, String)] =
        for {
          (k, pv) <- pRows
          (s, eo, ivv) <- iRows
          e <- eo.toSeq
          if sOk(s, k) && eOk(k, e)
        } yield (k, pv, s, e, ivv)

      // all four strictness combinations
      val combos = Seq(
        (iv("s") <= p("k") && p("k") <= iv("e"),
          (a: Long, b: Long) => a <= b, (a: Long, b: Long) => a <= b),
        (iv("s") < p("k") && p("k") <= iv("e"),
          (a: Long, b: Long) => a < b, (a: Long, b: Long) => a <= b),
        (iv("s") <= p("k") && p("k") < iv("e"),
          (a: Long, b: Long) => a <= b, (a: Long, b: Long) => a < b),
        (p("k") >= iv("s") && iv("e") > p("k"), // flipped operand order
          (a: Long, b: Long) => a <= b, (a: Long, b: Long) => a < b))
      combos.foreach { case (cond, sOk, eOk) =>
        val df = p.join(iv, cond)
        planIsSweep(df, ctx)
        val got = df.collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), r.getLong(3), r.getString(4))).toSeq
        // the stream is point-key ordered (the exec's claim)
        assert(got.map(_._1) == got.map(_._1).sorted, s"$ctx ordering")
        assert(got.sorted == direct(sOk, eOk).sorted, s"$ctx multiset")
      }

      // LEFT OUTER: match-less points survive null-extended
      val lo = p.join(iv,
        iv("s") <= p("k") && p("k") <= iv("e"), "left_outer")
      planIsSweep(lo, ctx)
      val goLo = lo.collect().map { r =>
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          Option(r.getString(4)))
      }.toSeq
      val inner = direct(_ <= _, _ <= _)
      val matchedKeysRows = inner.map(t => (t._1, t._2)).toSet
      val expectLo =
        inner.map(t => (t._1, t._2, Some(t._3), Some(t._4), Some(t._5))) ++
          pRows.filterNot(matchedKeysRows)
            .map(t => (t._1, t._2, None, None, None))
      assert(goLo.sortBy(x => (x._1, x._2, x._3, x._5)) ==
        expectLo.sortBy(x => (x._1, x._2, x._3, x._5)), s"$ctx left outer")

      // a RESIDUAL conjunct beyond the range pair evaluates per pair
      val res = p.join(iv, iv("s") <= p("k") && p("k") <= iv("e") &&
        p("pv") =!= iv("iv"))
      planIsSweep(res, s"$ctx residual")
      val goRes = res.collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getString(4))).toSeq
      assert(goRes.sorted ==
        direct(_ <= _, _ <= _).filter(t => t._2 != t._5).sorted,
        s"$ctx residual multiset")
    }
  }

  test("refusal pins: unindexed e and a dialed-down cap fall through to Spark") {
    val rnd = new scala.util.Random(99)
    val (pDir, _) = genPoints(rnd, "pr", 30, 2)
    val (iDir, _) = genIntervals(rnd, "ir", 30, 2, 5)
    ZoneMaps.build(spark, pDir, pSchema, Seq("k"))
    // e NOT zone-indexed: no width bound is provable — must refuse
    ZoneMaps.build(spark, iDir, iSchema, Seq("s"))
    val p = ExtendedJson.read(spark, pSchema, pDir, Map("zoneMaps" -> "true"))
    val iv = ExtendedJson.read(spark, iSchema, iDir,
      Map("zoneMaps" -> "true"))
    val df = p.join(iv, iv("s") <= p("k") && p("k") <= iv("e"))
    val ns = TestPlans.executedNodes(df)
    assert(!ns.exists(_.isInstanceOf[RangeIntervalJoinExec]) &&
      ns.exists(_.nodeName.contains("NestedLoop")),
      "unindexed e must fall through: " + ns.map(_.nodeName).mkString(", "))
    assert(df.count() > 0)

    // indexed e but a cap smaller than the provable active set
    val (iDir2, _) = genIntervals(rnd, "ir2", 30, 2, 5)
    ZoneMaps.build(spark, iDir2, iSchema, Seq("s", "e"))
    val iv2 = ExtendedJson.read(spark, iSchema, iDir2,
      Map("zoneMaps" -> "true"))
    val capKey = graft.plans.RangeWindowStrategy.MaxRangeFrameRowsKey
    val prior = spark.conf.getOption(capKey)
    try {
      spark.conf.set(capKey, "1")
      val df2 = p.join(iv2, iv2("s") <= p("k") && p("k") <= iv2("e"))
      val ns2 = TestPlans.executedNodes(df2)
      assert(!ns2.exists(_.isInstanceOf[RangeIntervalJoinExec]),
        "capped active set must fall through: " +
          ns2.map(_.nodeName).mkString(", "))
    } finally {
      prior match {
        case Some(v) => spark.conf.set(capKey, v)
        case None => spark.conf.unset(capKey)
      }
    }
  }
}
