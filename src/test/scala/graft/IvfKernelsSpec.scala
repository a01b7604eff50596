package graft

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Quantize, Similarity}

/** Differential pins for the r20 native IVF/SQ8/residual kernels: every
  * kernel must be BIT-IDENTICAL to the expression composition it replaced
  * (the retained `cellScoresFor` / `probeCellsReference` /
  * `codesReference` forms), across random vectors AND the adversarial
  * edge inputs — score ties, null elements, null vectors, wrong lengths,
  * zero vectors, zero-norm (NaN-score) centroids, and NaN elements. The
  * replaced compositions are what the DuckDB oracle verified for 19
  * rounds; equality here carries that verification onto the kernels.
  */
class IvfKernelsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(20260819)

  private def randVec(dim: Int): Seq[Float] =
    Seq.fill(dim)(rnd.nextFloat() * 2 - 1)

  /** Random centroid table with one duplicated centroid (exact score tie)
    * and, when `withZero`, one all-zero centroid (norm 0 → score NaN).
    */
  private def centTable(cells: Int, dim: Int, withZero: Boolean): Seq[Seq[Float]] = {
    val base = Seq.fill(cells)(randVec(dim))
    val dup = base.updated(cells - 2, base.head)
    if (withZero) dup.updated(1, Seq.fill(dim)(0f)) else dup
  }

  /** Adversarial vector frame: random rows plus null vector, null element,
    * wrong length, zero vector, NaN element, and exact centroid copies
    * (guaranteed argmax ties against the duplicated centroid).
    */
  private def vecFrame(dim: Int, cents: Seq[Seq[Float]]): DataFrame = {
    val rows: Seq[Option[Seq[Option[Float]]]] =
      Seq.fill(60)(Some(randVec(dim).map(Option(_)))) ++ Seq(
        None,
        Some(randVec(dim).map(Option(_)).updated(dim / 2, None)),
        Some(randVec(dim - 1).map(Option(_))),
        Some(Seq.fill(dim)(Option(0f))),
        Some(randVec(dim).map(Option(_)).updated(0, Option(Float.NaN))),
        Some(cents.head.map(Option(_))),
        Some(cents.last.map(Option(_))))
    // repartition(2) so the projection executes at run time (codegen path),
    // not via ConvertToLocalRelation at optimize time
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .repartition(2)
  }

  private def assertNoMismatch(df: DataFrame, kernel: Column, ref: Column): Unit = {
    val bad = df.select(col("id"), kernel.as("k"), ref.as("r"))
      .filter(!(col("k") <=> col("r")))
    val rows = bad.collect()
    assert(rows.isEmpty, s"kernel != reference on: ${rows.take(5).mkString("; ")}")
  }

  /** Runs `body` with ANSI off — a zero-norm centroid makes the REFERENCE
    * composition's `dot / lit(0.0)` throw DIVIDE_BY_ZERO under ANSI (the
    * whole query errors; unreachable from real Lloyd centroids), so the
    * zero-centroid arm pins the kernel against the non-ANSI (IEEE)
    * reference semantics instead — see the IvfRef scaladoc.
    */
  private def withAnsi(off: Boolean)(body: => Unit): Unit =
    if (!off) body
    else {
      val prev = spark.conf.get("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
    }

  for ((cells, dim, withZero) <- Seq((3, 4, false), (16, 64, false), (8, 16, true))) {
    val label = s"cells=$cells dim=$dim zeroCentroid=$withZero"
    val cents = centTable(cells, dim, withZero)
    lazy val df = vecFrame(dim, cents)

    test(s"graft_ivf_cell == array_max composition [$label]") {
      withAnsi(withZero) {
        assertNoMismatch(df,
          Similarity.bestCellFor(col("v"), cents),
          array_max(Similarity.cellScoresFor(col("v"), cents)).getField("cell"))
      }
    }

    test(s"graft_ivf_score == array_max composition [$label]") {
      withAnsi(withZero) {
        assertNoMismatch(df,
          Similarity.bestScoreFor(col("v"), cents),
          array_max(Similarity.cellScoresFor(col("v"), cents)).getField("score"))
      }
    }

    test(s"graft_ivf_probes == sort/reverse/slice composition [$label]") {
      withAnsi(withZero) {
        for (nProbe <- Seq(1, 2, cells)) {
          val idx = Similarity.IvfIndex(cents)
          assertNoMismatch(df,
            Similarity.probeCells(col("v"), idx, nProbe),
            Similarity.probeCellsReference(col("v"), cents, nProbe))
        }
      }
    }
  }

  test("graft_pq_residual == transform/element_at composition") {
    val dim = 16
    val cells = 4
    val coarse = Array.fill(cells * dim)(rnd.nextDouble() * 2 - 1)
    val rows: Seq[(Long, Option[Seq[Option[Float]]], Int)] =
      Seq.tabulate(40)(i =>
        (i.toLong, Some(randVec(dim).map(Option(_))), i % cells)) ++ Seq(
        (100L, None, 0),
        (101L, Some(randVec(dim).map(Option(_)).updated(3, None)), 1),
        (102L, Some(randVec(dim).map(Option(_)).updated(0, Option(Float.NaN))), 2))
    val df = rows.toDF("id", "v", "cell")
      .withColumn("v", col("v").cast("array<float>"))
      .repartition(2)
    val cfCol = lit(coarse)
    val ref = transform(col("v"), (x, i) =>
      x.cast("double") - element_at(cfCol, col("cell") * dim + i + 1))
      .cast("array<float>")
    assertNoMismatch(df,
      call_function("graft_pq_residual", col("v"), col("cell"),
        lit(coarse), lit(dim)),
      ref)
  }

  test("graft_sq8 == transform/element_at composition (incl. hi==lo dim)") {
    val dim = 16
    val mn = Seq.tabulate(dim)(i => if (i == 5) 0.25 else rnd.nextDouble() - 1)
    val mx = Seq.tabulate(dim)(i => if (i == 5) 0.25 else mn(i) + rnd.nextDouble())
    val rows: Seq[(Long, Option[Seq[Option[Float]]])] =
      Seq.tabulate(40)(i => (i.toLong, Some(randVec(dim).map(Option(_))))) ++ Seq(
        (100L, None),
        (101L, Some(randVec(dim).map(Option(_)).updated(3, None))),
        (102L, Some(randVec(dim).map(Option(_)).updated(0, Option(Float.NaN)))),
        (103L, Some(Seq.fill(dim)(Option(9f)))), // clamps to 255
        (104L, Some(Seq.fill(dim)(Option(-9f))))) // clamps to 0
    val df = rows.toDF("id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .repartition(2)
    assertNoMismatch(df,
      Quantize.codes(col("v"), mn, mx),
      Quantize.codesReference(col("v"), mn, mx))
  }

  test("ivf kernels accept array<double> input like the composition") {
    val dim = 8
    val cents = centTable(4, dim, withZero = false)
    val df = Seq.tabulate(30)(i =>
        (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
      .toDF("id", "v").repartition(2)
    assertNoMismatch(df,
      Similarity.bestCellFor(col("v"), cents),
      array_max(Similarity.cellScoresFor(col("v"), cents)).getField("cell"))
    assertNoMismatch(df,
      Similarity.bestScoreFor(col("v"), cents),
      array_max(Similarity.cellScoresFor(col("v"), cents)).getField("score"))
  }
}
