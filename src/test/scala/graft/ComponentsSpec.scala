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

  test("throws when even star contraction is budgeted below convergence") {
    // 200-node path: one large/small alternation cannot collapse it
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("s", "t")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(chain, "s", "t", maxIter = 1,
        switchAfter = 1).collect()
    }
    assert(e.getMessage.contains("converge"))
  }

  test("adversarial long path auto-switches to star contraction and converges") {
    // 400-node path (diameter 399): min-label alone would need 399 rounds
    // and the old propagation-only loop threw at the default budget; the
    // auto-switch hands it to the O(log n) algorithm inside 20 rounds
    val chain = (1L until 400L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.size == 400 && got.values.forall(_ == 1L))
  }

  test("star contraction converges in O(log n) alternations on a long path") {
    val chain = (1L until 300L).map(i => (i, i + 1)).toDF("s", "t")
    val (labels, rounds) = Components.starComponents(chain, "s", "t")
    assert(rounds <= 12, s"300-path took $rounds alternations")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == 300 && got.values.forall(_ == 1L))
  }

  test("star contraction agrees with min-label propagation on random graphs") {
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 8) {
      val n = 2 + rnd.nextInt(30)
      val m = 1 + rnd.nextInt(45)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val viaStar = Components
        .starComponents(edges.toDF("s", "t"), "s", "t")._1
        .as[(Long, Long)].collect().toMap
      assert(viaStar == cc(edges), s"trial $trial: $edges")
    }
  }

  test("components match a union-find reference on random graphs") {
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // root-min normalization: component = least id in the set
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = nodes.groupBy(find)
      byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }
    }

    // 15 seeded random graphs: varied density (sparse forests through
    // near-complete), self-loops included; deterministic across runs
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 15) {
      val n = 2 + rnd.nextInt(39)
      val m = 1 + rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(cc(edges) == unionFind(edges), s"trial $trial: $edges")
    }
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
