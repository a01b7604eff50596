package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mix

/** Temperature-mix semantics: sqrt rebalancing favors small groups, rates
  * cap at 1, selection is deterministic.
  */
class MixSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 900 docs of group a, 100 of b: w_a=3e7, w_b=1e7 -> rate_a = 1/3,
  // rate_b = 1.0 (capped) at targetFraction 0.4
  private val docs = ((1L to 900L).map((_, "a")) ++
    (1001L to 1100L).map((_, "b"))).toDF("doc_id", "grp")

  test("sqrt rebalance keeps all of the small group, ~1/3 of the large") {
    val kept = Mix.temperatureMix(docs, "grp", "doc_id", targetFraction = 0.4)
      .as[(Long, String)].collect()
    val byGrp = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byGrp("b") == 100) // rate capped at 1: everything kept
    assert(byGrp("a") > 250 && byGrp("a") < 350, s"got ${byGrp("a")}")
  }

  test("selection is identical across runs and partitionings") {
    def run(parts: Int) = Mix
      .temperatureMix(docs.repartition(parts), "grp", "doc_id", 0.4)
      .as[(Long, String)].collect().toSet
    assert(run(2) == run(16))
  }
}
