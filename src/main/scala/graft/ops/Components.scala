package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the cluster-forming
  * step after any near-dup pass: pair output (q25/q26/q27/q30) → duplicate
  * CLUSTERS → one kept representative per cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the minimum label among
  * itself and its neighbors; converged when no label changes. Each round is
  * one join + one aggregation (two shuffles on the node id), and the label
  * frame is CHECKPOINTED round-to-round: an iterative dataflow's logical
  * plan otherwise doubles per round (the label frame feeds both sides of
  * the next join) and planning itself blows up exponentially — persist()
  * alone does not truncate the plan, only recomputation. `localCheckpoint`
  * cuts the lineage each round; on a fault-tolerance-critical cluster run,
  * swap for reliable `checkpoint` with a checkpoint dir (same shape, adds
  * an HDFS write per round).
  *
  * Rounds needed = graph diameter. Near-dup graphs are the friendly case:
  * duplicate clusters are dense and tiny (diameter 1-3 — a transitive dup
  * chain of depth d needs d rounds), so the loop ends after 2-4 rounds with
  * a cheap no-change round to confirm. For adversarial long-path graphs
  * the loop AUTO-SWITCHES after `switchAfter` unconverged rounds to
  * alternating star contraction — large-star/small-star (Kiveris et al.
  * 2014, "Connected Components in MapReduce and Beyond", public paper) —
  * which converges in O(log n) alternations on ANY topology: each
  * operation rewires every node's larger (resp. smaller-or-equal)
  * neighbors to its neighborhood minimum, so long chains halve instead of
  * shrinking by one. Same shape per round (one aggregation + one join on
  * the node id); dedup clusters never reach the switch.
  *
  * Determinism: min over ids is order-insensitive; output is exactly
  * (node, minimum id reachable from node), independent of partitioning and
  * iteration scheduling — by either algorithm.
  */
object Components {

  /** Components of the undirected graph given by (`srcCol`, `dstCol`) pairs.
    * Output: `node`, `component` (= least node id in the component), one
    * row per DISTINCT endpoint of the edge list. Runs min-label
    * propagation for up to `switchAfter` rounds (optimal for the
    * small-diameter dup clusters this engine feeds it), then hands an
    * unconverged graph to [[starComponents]]; throws only if star
    * contraction exhausts `maxIter` alternations too (2·log₂ n suffices
    * — 20 covers a million-node component with margin).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20, switchAfter: Int = 8): DataFrame = {
    // The edge list feeds EVERY round's join: persist it or each round
    // re-executes the whole upstream pipeline that produced the pairs
    // (for near-dup input that is the full inverted-index + verify pass,
    // multiplied by the round count). Symmetrization is ONE explode over
    // one scan, not a self-union (r21, guide §2.4): a union's two
    // branches EACH evaluate the upstream pair pipeline — for near-dup
    // input that ran the candidate self-join + verify twice per
    // materialization. Same (a, b) multiset either way.
    val sym = edges.select(explode(array(
        struct(col(srcCol).as("a"), col(dstCol).as("b")),
        struct(col(dstCol).as("a"), col(srcCol).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .persist()
    try {
      // eager localCheckpoint: materializes the round AND truncates the
      // logical plan (blocks are released by the ContextCleaner once the
      // superseded round's RDD is unreachable)
      var labels = sym.select(col("a").as("node")).distinct()
        .withColumn("component", col("node"))
        .localCheckpoint()
      var changed = 1L
      var round = 0
      while (changed > 0 && round < math.min(switchAfter, maxIter)) {
        // each node's best neighbor label this round
        val nbr = sym
          .join(labels.withColumnRenamed("node", "b"), "b")
          .groupBy(col("a").as("node"))
          .agg(min(col("component")).as("nbr_min"))
        val next = labels
          .join(nbr, Seq("node"), "left")
          .select(col("node"), col("component").as("prev"),
            least(col("component"),
              coalesce(col("nbr_min"), col("component"))).as("component"))
          .localCheckpoint()
        changed = next.filter(col("component") < col("prev")).count()
        labels = next.select("node", "component")
        round += 1
      }
      if (changed == 0) labels
      else {
        // diameter exceeds the propagation budget (an adversarial chain,
        // not a dup cluster): hand the raw edges to the O(log n) algorithm.
        // The restart from RAW edges is deliberate: seeding contraction
        // with only the partially-converged (node, label) edges is UNSOUND
        // (two adjacent nodes can hold labels whose own label-chains never
        // meet — an increasing-id chain with the global min attached at the
        // far end splits), and the sound form (label edges ∪ raw edges)
        // doubles the edge frame for at most a constant-alternation head
        // start against an O(log n) bound — not worth the extra shuffle.
        starComponents(sym, "a", "b", maxIter)._1
      }
    } finally sym.unpersist(blocking = false)
  }

  /** One star-contraction operation over a DISTINCT undirected edge set
    * `(a, b)`: with `m(u) = min(Γ(u) ∪ u)`, large-star rewires every
    * neighbor `v > u` to `m(u)`; small-star rewires every neighbor
    * `v <= u` AND `u` itself to `m(u)`. One aggregation (per-node min)
    * plus one join per operation; self-loops drop, output re-distincts.
    */
  private def starRound(edges: DataFrame, large: Boolean): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
    val mn = sym.groupBy("a").agg(min(col("b")).as("mnb"))
      .select(col("a"), least(col("a"), col("mnb")).as("m"))
    val joined = sym.join(mn, "a")
    val rewired =
      if (large) joined.filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      else joined.filter(col("b") <= col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        // small-star also attaches u itself to its neighborhood min
        .union(mn.filter(col("m") < col("a")).select(col("a"), col("m")))
    rewired.filter(col("a") =!= col("b")).distinct()
  }

  /** Alternating large-star/small-star to the fixed point: the edge set
    * converges to a union of stars `(node, component-min)` in O(log n)
    * alternations regardless of topology (long chains halve per pair,
    * where min-label propagation shortens them by one). Fixed point is
    * detected exactly — equal distinct-edge counts plus an empty
    * `except` — never by a hashed signature (a collision there would
    * silently emit half-merged components). Returns (labels, alternations
    * used); the label frame includes every distinct endpoint of the input
    * (star centers label themselves).
    *
    * Scale shape per alternation: one per-node min aggregation and one
    * shuffle join on the node id — the same two-exchange round as
    * min-label — plus a set-equality check (two cheap shuffles on the
    * shrinking edge frame). Edge frames are `localCheckpoint`ed per round
    * (iterative-plan lineage rule).
    */
  private[graft] def starComponents(edges: DataFrame, srcCol: String,
      dstCol: String, maxAlternations: Int = 20): (DataFrame, Int) = {
    val nodes = edges.select(col(srcCol).as("node"))
      .union(edges.select(col(dstCol).as("node"))).distinct()
      .localCheckpoint()
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var round = 0
    var done = e.isEmpty
    while (!done && round < maxAlternations) {
      val l = starRound(e, large = true).localCheckpoint()
      val s = starRound(l, large = false).localCheckpoint()
      // s ⊆ e with equal distinct cardinality ⇒ s = e (exact fixed point)
      done = s.count() == e.count() && s.except(e).isEmpty
      e = s
      round += 1
    }
    require(done, s"star contraction did not converge in $maxAlternations alternations")
    // fixed point: every non-center node has exactly one (node, center)
    // edge; centers (and isolated self-loop endpoints) label themselves
    val labels = nodes
      .join(e.select(col("a").as("node"), col("b").as("__c")), Seq("node"), "left")
      .select(col("node"), coalesce(col("__c"), col("node")).as("component"))
    (labels, round)
  }

  /** Dedup-by-cluster: every document whose id is NOT the least member of
    * its near-dup cluster is dropped; documents with no near-dup pair are
    * kept untouched (left anti join on the non-representative set — no
    * need to materialize labels for the unpaired majority).
    */
  def keepClusterRepresentatives(docs: DataFrame, idCol: String,
      pairs: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val drop = connectedComponents(pairs, srcCol, dstCol)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
