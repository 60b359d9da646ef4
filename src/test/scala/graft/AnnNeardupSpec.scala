package graft

import org.scalatest.funsuite.AnyFunSuite

/** simCosineNeardupAnn vs the exact block-grid formulation: precision
  * must be 1.0 by construction (candidates are exact-rescored at the
  * same threshold), recall is measured per SF and floored. The numbers
  * printed here are the source of SCALING.md's ANN recall table. */
class AnnNeardupSpec extends AnyFunSuite {
  import SharedSpark._

  private def measure(dir: String, nCells: Int, nprobe: Int): (Long, Long, Double) = {
    val exact = ops.Pipelines.simCosineNeardup(spark, dir)
      .select("v1", "v2").persist()
    val ann = ops.Pipelines.simCosineNeardupAnn(spark, dir, nCells, nprobe)
      .select("v1", "v2").persist()
    try {
      val nExact = exact.count()
      val nAnn = ann.count()
      val falsePos = ann.except(exact).count()
      assert(falsePos == 0, s"$dir: $falsePos ANN pairs not in the exact result")
      val recall = nAnn.toDouble / nExact
      info(f"$dir nCells=$nCells nprobe=$nprobe: exact=$nExact ann=$nAnn recall=$recall%.4f")
      (nExact, nAnn, recall)
    } finally { exact.unpersist(); ann.unpersist() }
  }

  test("sf0.001: precision 1.0, recall floor") {
    val (_, _, r) = measure(sf0001, nCells = 16, nprobe = 2)
    assert(r >= 0.7, s"recall $r below floor (measured 0.7213)")
  }

  test("sf0.01: precision 1.0, recall floor") {
    val (_, _, r) = measure("/root/testdata/sf0.01", nCells = 16, nprobe = 2)
    assert(r >= 0.75, s"recall $r below floor (measured 0.8077)")
  }

  test("sf0.1: precision 1.0, recall floor") {
    val (_, _, r) = measure("/root/testdata/sf0.1", nCells = 16, nprobe = 3)
    assert(r >= 0.75, s"recall $r below floor (measured 0.8118)")
  }

  test("raising nprobe converges toward the exact result (sf0.001)") {
    val (_, _, r2) = measure(sf0001, nCells = 16, nprobe = 2)
    val (nExact, nAnn, r8) = measure(sf0001, nCells = 16, nprobe = 8)
    assert(r8 >= r2, s"recall must be monotone in nprobe: $r2 -> $r8")
    // nprobe = nCells/2 covers most cell combinations
    assert(r8 >= 0.9, s"recall at nprobe=8/16 was $r8")
  }
}
