package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity
import graft.plans.{CosineJoinExec, SimilarityJoinStrategy}

/** The fused cosine expression and the declarative similarity-join
  * strategy: bit-parity with the composed form, null semantics, the
  * opt-in conf gate, plan shape, residual conjuncts, strictness, literal
  * orientation, and result equality with the explicit
  * [[Similarity.cosineNearDupPairs]] pipeline.
  */
class SimilarityJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def withSimJoin[A](enabled: Boolean)(body: => A): A = {
    val key = SimilarityJoinStrategy.EnabledKey
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, enabled.toString)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** A corpus with planted exact-parallel near-dups (×2-scaled copies at
    * id + 1000): every planted pair has identical sign pattern → LSH
    * recall 1, and no independent random pair approaches the gate.
    */
  private def plantedVectors(n: Int, dim: Int, seed: Int): DataFrame = {
    val rnd = new Random(seed)
    val base = Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
    val copies = base.map { case (id, v) => (id + 1000L, v.map(_ * 2f)) }
    (base ++ copies).toDF("vec_id", "embedding")
  }

  test("graft_cosine is bit-identical to the composed dot/norm form") {
    val rnd = new Random(11)
    val rows = Seq.fill(200)((
      Seq.fill(48)(rnd.nextFloat() * 2 - 1),
      Seq.fill(48)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    // strict equality: same fold order per accumulator, same sqrt/mul/div
    val bad = df.filter(!(Similarity.cosineSim(col("a"), col("b")) ===
      Similarity.cosine(col("a"), col("b"))))
    assert(bad.count() == 0)
  }

  test("graft_cosine is symmetric to the bit") {
    val rnd = new Random(12)
    val rows = Seq.fill(100)((
      Seq.fill(32)(rnd.nextFloat() * 2 - 1),
      Seq.fill(32)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val bad = df.filter(!(Similarity.cosineSim(col("a"), col("b")) ===
      Similarity.cosineSim(col("b"), col("a"))))
    assert(bad.count() == 0)
  }

  test("graft_cosine null semantics: null array/element, mismatch, zero norm") {
    val df = Seq(
      (Some(Seq[Option[Float]](Some(1f), Some(0f))), Some(Seq[Option[Float]](Some(2f), Some(0f))), Some(1.0)),
      (None, Some(Seq[Option[Float]](Some(1f))), None),
      (Some(Seq[Option[Float]](Some(1f), None)), Some(Seq[Option[Float]](Some(1f), Some(1f))), None),
      (Some(Seq[Option[Float]](Some(1f))), Some(Seq[Option[Float]](Some(1f), Some(2f))), None),
      // all-zero vector: no defined angle -> null (not an ANSI error)
      (Some(Seq[Option[Float]](Some(0f), Some(0f))), Some(Seq[Option[Float]](Some(1f), Some(1f))), None)
    ).toDF("a", "b", "expect")
    val out = df.select(Similarity.cosineSim(col("a"), col("b")).as("c"),
      col("expect")).collect()
    out.foreach { r =>
      assert(Option(r.get(0)) == Option(r.get(1)), r.toString)
    }
  }

  test("graft_cosine is registered for plain SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_cosine(array(CAST(3 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(7 AS FLOAT), CAST(0 AS FLOAT)))").head().getDouble(0)
    assert(r == 1.0)
  }

  test("strategy fires behind the conf: CosineJoinExec in, nested loop out") {
    val df = plantedVectors(20, 16, seed = 3)
    val l = df.select(col("vec_id").as("i"), col("embedding").as("vi"))
    val r = df.select(col("vec_id").as("j"), col("embedding").as("vj"))
    def joined = l.join(r,
      Similarity.cosineSim(col("vi"), col("vj")) >= lit(0.999) &&
        col("i") < col("j"))
    withSimJoin(enabled = true) {
      val p = joined.queryExecution.sparkPlan
      assert(p.exists(_.isInstanceOf[CosineJoinExec]))
      assert(!p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    }
    withSimJoin(enabled = false) {
      val p = joined.queryExecution.sparkPlan
      assert(!p.exists(_.isInstanceOf[CosineJoinExec]))
      assert(p.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
    }
  }

  test("per-join approx marker fires with NO session conf and leaks nowhere") {
    val df = plantedVectors(20, 16, seed = 3)
    val l = df.select(col("vec_id").as("i"), col("embedding").as("vi"))
    val r = df.select(col("vec_id").as("j"), col("embedding").as("vj"))
    withSimJoin(enabled = false) {
      // the marker form plans approximately with the conf OFF...
      val hinted = l.join(r,
        Similarity.cosineSimApprox(col("vi"), col("vj")) >= lit(0.999) &&
          col("i") < col("j"))
      assert(hinted.queryExecution.sparkPlan.exists(_.isInstanceOf[CosineJoinExec]))
      // ...while the plain form in the SAME session stays exact — the
      // opt-in lives in the predicate, not in session state
      val plain = l.join(r,
        Similarity.cosineSim(col("vi"), col("vj")) >= lit(0.999) &&
          col("i") < col("j"))
      assert(!plain.queryExecution.sparkPlan.exists(_.isInstanceOf[CosineJoinExec]))
    }
  }

  test("declarative join equals the exact nested-loop answer and the explicit LSH pipeline") {
    val df = plantedVectors(40, 24, seed = 5)
    val l = df.select(col("vec_id").as("i"), col("embedding").as("vi"))
    val r = df.select(col("vec_id").as("j"), col("embedding").as("vj"))
    def pairs = l.join(r,
        Similarity.cosineSim(col("vi"), col("vj")) >= lit(0.999) &&
          col("i") < col("j"))
      .select("i", "j")
    val approx = withSimJoin(enabled = true) {
      pairs.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    val exact = withSimJoin(enabled = false) {
      pairs.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    }
    val explicitLsh = Similarity.cosineNearDupPairs(
        df, "vec_id", "embedding", minCos = 0.999)
      .select("i", "j").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(approx == exact)
    assert(approx == explicitLsh)
    assert(approx.nonEmpty && approx.forall { case (i, j) => j == i + 1000L })
  }

  test("residual conjuncts are honored (both orderings without i<j)") {
    val df = plantedVectors(10, 16, seed = 7)
    val l = df.select(col("vec_id").as("i"), col("embedding").as("vi"))
    val r = df.select(col("vec_id").as("j"), col("embedding").as("vj"))
    withSimJoin(enabled = true) {
      val all = l.join(r,
          Similarity.cosineSim(col("vi"), col("vj")) >= lit(0.999) &&
            col("i") =!= col("j"))
        .select("i", "j").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      // without i<j both orientations of every planted pair appear
      assert(all.size == 20)
      assert(all == all.map { case (i, j) => (j, i) })
    }
  }

  test("strict > excludes the exact-threshold pair; literal may lead") {
    // [1,0] vs [2,0]: cosine exactly 1.0
    val df = Seq((0L, Seq(1f, 0f)), (1L, Seq(2f, 0f))).toDF("vec_id", "embedding")
    val l = df.select(col("vec_id").as("i"), col("embedding").as("vi"))
    val r = df.select(col("vec_id").as("j"), col("embedding").as("vj"))
    withSimJoin(enabled = true) {
      def shape(cond: org.apache.spark.sql.Column) = {
        val q = l.join(r, cond && col("i") < col("j")).select("i", "j")
        assert(q.queryExecution.sparkPlan.exists(_.isInstanceOf[CosineJoinExec]))
        q.collect().length
      }
      assert(shape(Similarity.cosineSim(col("vi"), col("vj")) >= lit(1.0)) == 1)
      assert(shape(Similarity.cosineSim(col("vi"), col("vj")) > lit(1.0)) == 0)
      // literal on the left: lit <= cosine is the same predicate
      assert(shape(lit(1.0) <= Similarity.cosineSim(col("vi"), col("vj"))) == 1)
      assert(shape(lit(1.0) < Similarity.cosineSim(col("vi"), col("vj"))) == 0)
    }
  }

  test("swapped vector sides still plan (cosine symmetry)") {
    val df = plantedVectors(10, 16, seed = 9)
    val l = df.select(col("vec_id").as("i"), col("embedding").as("vi"))
    val r = df.select(col("vec_id").as("j"), col("embedding").as("vj"))
    withSimJoin(enabled = true) {
      // arguments written right-side-first: (vj, vi)
      val q = l.join(r,
          Similarity.cosineSim(col("vj"), col("vi")) >= lit(0.999) &&
            col("i") < col("j"))
        .select("i", "j")
      assert(q.queryExecution.sparkPlan.exists(_.isInstanceOf[CosineJoinExec]))
      assert(q.collect().length == 10)
    }
  }
}
