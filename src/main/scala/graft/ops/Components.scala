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
  * a cheap no-change round to confirm. For adversarial long-path graphs at
  * scale, the upgrade is alternating star contraction (large-star /
  * small-star), which converges in O(log n) rounds on any topology — same
  * join-shape per round, more rounds saved; not needed for dedup clusters.
  *
  * Determinism: min over ids is order-insensitive; output is exactly
  * (node, minimum id reachable from node), independent of partitioning and
  * iteration scheduling.
  */
object Components {

  /** Components of the undirected graph given by (`srcCol`, `dstCol`) pairs.
    * Output: `node`, `component` (= least node id in the component), one
    * row per DISTINCT endpoint of the edge list. Throws if `maxIter` rounds
    * don't converge (diameter larger than `maxIter`).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 20): DataFrame = {
    // The edge list feeds EVERY round's join: persist it or each round
    // re-executes the whole upstream pipeline that produced the pairs
    // (for near-dup input that is the full inverted-index + verify pass,
    // multiplied by the round count).
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
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
      while (changed > 0 && round < maxIter) {
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
      require(changed == 0, s"did not converge within $maxIter rounds")
      // the returned labels are checkpointed — independent of sym's cache
      labels
    } finally sym.unpersist(blocking = false)
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
