package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.InnerLike
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DoubleType

import graft.functions.CosineSim

/** Planner strategy (the `injectPlannerStrategy` rung, registered by
  * [[graft.functions.GraftExtensions]]): an inner join whose condition
  * compares the fused cosine [[CosineSim]] of one column per side against
  * a double literal —
  *
  * {{{ left.join(right, cosineSim($"a", $"b") >= lit(0.999) && <rest>) }}}
  *
  * — has no equi-keys, so Spark's own planner can only produce a
  * BroadcastNestedLoopJoin (or a cartesian product): every pair scored,
  * O(|L|·|R|) at any scale. This strategy plans the SAME declarative form
  * into [[CosineJoinExec]], the sign-bucket LSH shape whose candidate set
  * is quadratic only within a hash bucket. Non-similarity conjuncts of
  * the condition are preserved as the exec's residual filter, and a
  * literal on either side of the comparison (`>=`/`>` with the cosine on
  * the left, `<=`/`<` with it on the right) is recognized; swapped vector
  * sides work because the fused cosine is bit-symmetric.
  *
  * OPT-IN ONLY, OFF BY DEFAULT: the LSH shape trades recall for scale
  * (pairs whose sign patterns differ in ≥ 2 bits are missed — negligible
  * at near-dup thresholds, not at moderate ones), so silently rewriting a
  * user's exact join would be wrong. Two explicit opt-ins, either
  * suffices:
  *
  *  - PER JOIN (preferred): write the predicate with
  *    `graft_cosine_approx` / [[graft.ops.Similarity.cosineSimApprox]] —
  *    the approximation request is embedded in that join's own plan and
  *    cannot leak onto any other join in the session;
  *  - PER SESSION: `spark.graft.similarityJoin.enabled=true` approximates
  *    every marker-form join planned while set (read at planning time,
  *    so per-query `spark.conf.set` + restore works for driver code that
  *    controls execution).
  *
  * `spark.graft.similarityJoin.planes` (default 8) and `.seed` (default
  * 42) are the same recall/cost levers as
  * [[graft.ops.Similarity.cosineNearDupPairs]], whose shared oracle pins
  * the two shapes to identical results on provable-recall corpora.
  */
class SimilarityJoinStrategy(session: SparkSession) extends SparkStrategy
    with PredicateHelper {
  import SimilarityJoinStrategy._

  /** One recognized similarity conjunct: vec exprs in left/right child
    * order, the threshold, whether the comparison is strict, and the
    * marker expression itself (for the per-join opt-in check).
    */
  private case class SimPredicate(
      leftVec: Expression, rightVec: Expression, threshold: Double,
      strict: Boolean, marker: Expression)

  private def recognize(conjunct: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[SimPredicate] = {
    val parsed = conjunct match {
      case GreaterThanOrEqual(c: CosineSim, Literal(t: Double, DoubleType)) =>
        Some((c, t, false))
      case GreaterThan(c: CosineSim, Literal(t: Double, DoubleType)) =>
        Some((c, t, true))
      case LessThanOrEqual(Literal(t: Double, DoubleType), c: CosineSim) =>
        Some((c, t, false))
      case LessThan(Literal(t: Double, DoubleType), c: CosineSim) =>
        Some((c, t, true))
      case _ => None
    }
    parsed.flatMap { case (c, t, strict) =>
      if (c.left.references.subsetOf(l.outputSet) &&
          c.right.references.subsetOf(r.outputSet))
        Some(SimPredicate(c.left, c.right, t, strict, c))
      else if (c.left.references.subsetOf(r.outputSet) &&
          c.right.references.subsetOf(l.outputSet))
        // cosine is bit-symmetric, so the swapped orientation just trades
        // which child feeds which argument
        Some(SimPredicate(c.right, c.left, t, strict, c))
      else None
    }
  }

  /** The strategy fires per join: either the SESSION opted in
    * (`spark.graft.similarityJoin.enabled`) or THIS predicate carries
    * the plan-embedded `graft_cosine_approx` hint — the per-join form
    * that cannot leak approximation onto any other join in the session.
    */
  private def optedIn(sim: Expression): Boolean =
    SQLConf.get.getConfString(EnabledKey, "false").toBoolean ||
      (sim match { case c: CosineSim => c.approxHint; case _ => false })

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Join(l, r, _: InnerLike, Some(cond), _) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = conjuncts.iterator
        .map(c => recognize(c, l, r).filter(s => optedIn(s.marker)).map(c -> _))
        .collectFirst { case Some(found) => found }
      hit match {
        case Some((matched, sim)) =>
          val residual = conjuncts.filterNot(_ eq matched)
            .reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          val planes = SQLConf.get.getConfString(PlanesKey, "8").toInt
          val seed = SQLConf.get.getConfString(SeedKey, "42").toLong
          CosineJoinExec(sim.leftVec, sim.rightVec, sim.threshold,
            sim.strict, residual, planes, seed,
            planLater(l), planLater(r)) :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

object SimilarityJoinStrategy {
  val EnabledKey = "spark.graft.similarityJoin.enabled"
  val PlanesKey = "spark.graft.similarityJoin.planes"
  val SeedKey = "spark.graft.similarityJoin.seed"
}
