package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.keys.{GlobalIndex, SurrogateKeys}
import graft.ops.{Dedup, UpsertSplit}

/** Unit semantics for the key-management operators (SURVEY §2 T6/Q7/Q8 +
  * Q5/Q6), oracle: /root/reference/dags/includes/utils.py:5-39 behavior.
  */
class KeysSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val existing = Seq((10L, "b"), (7L, "d")).toDF("id", "_id")
  private val incoming = Seq("a", "b", "c", "d", "e").toDF("_id")

  test("reconcile keeps existing ids and numbers new keys contiguously in key order") {
    val out = SurrogateKeys.reconcile(existing, incoming, "_id")
      .orderBy("_id").as[(String, Long)].collect().toSeq
    // max existing id = 10; new keys a, c, e get 11, 12, 13 in _id order
    assert(out == Seq(("a", 11L), ("b", 10L), ("c", 12L), ("d", 7L), ("e", 13L)))
  }

  test("reconcile with empty existing starts at 1") {
    val out = SurrogateKeys.reconcile(existing.filter(lit(false)), incoming, "_id")
      .orderBy("_id").as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L), ("e", 5L)))
  }

  test("reconcileAtScale matches reconcile") {
    val a = SurrogateKeys.reconcile(existing, incoming, "_id")
      .orderBy("_id").collect().toSeq
    val b = SurrogateKeys.reconcileAtScale(existing, incoming, "_id")
      .select("_id", "id").orderBy("_id").collect().toSeq
    assert(a == b)
  }

  test("reconcile id assignment is a bijection onto incoming") {
    val out = SurrogateKeys.reconcile(existing, incoming, "_id")
    assert(out.count() == 5)
    assert(out.select("id").distinct().count() == 5)
  }

  test("reconcile is stable under permutation of incoming rows") {
    val shuffled = incoming.orderBy(rand(seed = 1))
    val a = SurrogateKeys.reconcile(existing, incoming, "_id").orderBy("_id").collect().toSeq
    val b = SurrogateKeys.reconcile(existing, shuffled, "_id").orderBy("_id").collect().toSeq
    assert(a == b)
  }

  test("reconcile numbers duplicate business keys deterministically and matches reconcileAtScale") {
    // duplicate NEW keys (legal when reconciling on a non-unique key):
    // numbering must tiebreak on the remaining columns, so ids are
    // reproducible and both variants agree
    val dup = Seq(("a", 2), ("a", 1), ("b", 9), ("c", 5), ("c", 4)).toDF("_id", "v")
    val a = SurrogateKeys.reconcile(existing, dup, "_id")
      .select("_id", "v", "id").orderBy("_id", "v").as[(String, Int, Long)].collect().toSeq
    val b = SurrogateKeys.reconcileAtScale(existing, dup, "_id")
      .select("_id", "v", "id").orderBy("_id", "v").as[(String, Int, Long)].collect().toSeq
    val expected = Seq(("a", 1, 11L), ("a", 2, 12L), ("b", 9, 10L),
      ("c", 4, 13L), ("c", 5, 14L))
    assert(a == expected)
    assert(b == expected)
  }

  test("globalIndex assigns 1..n in total order across partitions") {
    val df = spark.range(1000).toDF("v").repartition(8)
    val out = GlobalIndex.withGlobalIndex(df, Seq(col("v").desc), "pos")
    val rows = out.orderBy("pos").as[(Long, Long)].collect()
    assert(rows.length == 1000)
    assert(rows.head == ((999L, 1L)))
    assert(rows.last == ((0L, 1000L)))
    assert(rows.map(_._2).toSeq == (1L to 1000L))
  }

  test("globalIndex honors the offset") {
    val out = GlobalIndex.withGlobalIndex(spark.range(3).toDF("v"), Seq(col("v")), "pos", offset = 100L)
    assert(out.select(min("pos"), max("pos")).as[(Long, Long)].head() == ((101L, 103L)))
  }

  test("keepFirst keeps exactly the first row per key under the order") {
    val df = Seq(("k1", 2, "b"), ("k1", 1, "a"), ("k2", 5, "z")).toDF("k", "ord", "v")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord").asc))
      .orderBy("k").as[(String, Int, String)].collect().toSeq
    assert(out == Seq(("k1", 1, "a"), ("k2", 5, "z")))
  }

  test("upsert split flags known keys as update, new as insert; halves partition the input") {
    val keys = Seq("b", "d").toDF("_id")
    val out = UpsertSplit.split(incoming, keys, "_id")
      .orderBy("_id").as[(String, String)].collect().toSeq
    assert(out == Seq(("a", "insert"), ("b", "update"), ("c", "insert"),
      ("d", "update"), ("e", "insert")))
    assert(UpsertSplit.inserts(incoming, keys, "_id").count() == 3)
    assert(UpsertSplit.updates(incoming, keys, "_id").count() == 2)
  }
}
