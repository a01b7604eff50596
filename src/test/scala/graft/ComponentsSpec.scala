package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Components

/** Connected-components semantics: multi-component graphs, chains needing
  * multiple propagation rounds, partition-layout invariance, and the
  * keep-one-representative dedup built on top.
  */
class ComponentsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("s", "t"), "s", "t")
      .as[(Long, Long)].collect().toMap

  test("separate components get separate least-id labels") {
    // {1,2,3} triangle, {10,11} edge, {20,21,22} path
    val got = cc(Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L),
      (21L, 20L), (21L, 22L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("a long chain converges to one component (multi-round propagation)") {
    // path 1-2-3-...-12: the min label needs 11 rounds to reach the far end
    val chain = (1L until 12L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.size == 12 && got.values.forall(_ == 1L))
  }

  test("labels are identical across edge partition layouts") {
    val edges = Seq((5L, 9L), (9L, 2L), (30L, 31L), (2L, 7L), (40L, 31L))
    def run(parts: Int) = Components
      .connectedComponents(edges.toDF("s", "t").repartition(parts), "s", "t")
      .as[(Long, Long)].collect().toSet
    assert(run(1) == run(8))
  }

  test("throws when maxIter is below the graph diameter") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("s", "t")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, "s", "t", maxIter = 3).collect()
    }
    assert(e.getMessage.contains("converge"))
  }

  test("keepClusterRepresentatives keeps unpaired docs and least members") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(i => (i, s"d$i")).toDF("id", "payload")
    // clusters {1,2,3} (transitive chain) and {5,6}; 4 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("i", "j")
    val kept = Components
      .keepClusterRepresentatives(docs, "id", pairs, "i", "j")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
  }
}
