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

  test("null-group rows are excluded from counts and output") {
    val withNulls = docs.union(
      (2001L to 2500L).map((_, Option.empty[String])).toDF("doc_id", "grp"))
    val kept = Mix.temperatureMix(withNulls, "grp", "doc_id", 0.4)
      .as[(Long, String)].collect()
    // identical result to the null-free corpus: null rows neither appear
    // nor depress the real groups' rates
    val base = Mix.temperatureMix(docs, "grp", "doc_id", 0.4)
      .as[(Long, String)].collect()
    assert(kept.toSet == base.toSet)
  }

  test("hash is safe for ids beyond the long-multiplication overflow point") {
    val huge = ((1L to 200L).map(i => (4000000000L + i, "a")) ++
      (1L to 50L).map(i => (8000000000L + i, "b"))).toDF("doc_id", "grp")
    // must not throw (ANSI overflow) and must stay deterministic
    val kept = Mix.temperatureMix(huge, "grp", "doc_id", 0.5)
      .as[(Long, String)].collect()
    assert(kept.nonEmpty && kept.forall(_._1 > 4000000000L))
  }

  test("selection is identical across runs and partitionings") {
    def run(parts: Int) = Mix
      .temperatureMix(docs.repartition(parts), "grp", "doc_id", 0.4)
      .as[(Long, String)].collect().toSet
    assert(run(2) == run(16))
  }

  test("epochMix: whole weights replicate exactly, fractional by hash, zero drops") {
    val df = ((1L to 100L).map((_, "two")) ++ (101L to 200L).map((_, "half")) ++
      (201L to 300L).map((_, "zero")) ++ Seq((301L, null.asInstanceOf[String])))
      .toDF("doc_id", "grp")
    val out = Mix.epochMix(df, "grp", "doc_id",
      Map("two" -> 2.0, "half" -> 0.5, "zero" -> 0.0), defaultWeight = 1.0)
      .as[(Long, String, Int)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    // weight 2.0: every doc exactly epochs [0, 1]
    assert((1L to 100L).forall(id => byDoc(id) == Seq(0, 1)))
    // weight 0.5: a doc appears iff its hash falls under 500000, epoch [0]
    val halfDocs = (101L to 200L).filter(byDoc.contains)
    assert(halfDocs.nonEmpty && halfDocs.size < 100)
    assert(halfDocs.forall(id => byDoc(id) == Seq(0)))
    assert(halfDocs.forall(id => ((id % 1000000L) * 435761L) % 1000000L < 500000L))
    // weight 0.0 and null groups never emit
    assert((201L to 301L).forall(id => !byDoc.contains(id)))
    // partition-layout invariance
    val out2 = Mix.epochMix(df.repartition(13), "grp", "doc_id",
      Map("two" -> 2.0, "half" -> 0.5, "zero" -> 0.0), defaultWeight = 1.0)
      .as[(Long, String, Int)].collect()
    assert(out.toSet == out2.toSet)
  }
}
