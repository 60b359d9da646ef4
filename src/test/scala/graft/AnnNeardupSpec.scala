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

  test("adaptive probing + code prefilter: >= 0.95 recall, exact rescore under half of nprobe=8") {
    val exact = ops.Pipelines.simCosineNeardup(spark, sf0001)
      .select("v1", "v2").persist()
    val adaptive = ops.Pipelines.simCosineNeardupAnnAdaptive(spark, sf0001)
      .select("v1", "v2").persist()
    try {
      // precision 1.0 by construction, same as the fixed variant
      assert(adaptive.except(exact).count() == 0)
      val recall = adaptive.count().toDouble / exact.count()
      // cost accounting, honestly split by stage: nprobe=8 sends its
      // whole candidate set to the full-float rescore; the adaptive
      // pipeline touches candCode pairs with 8-byte-code arithmetic
      // (~8x cheaper each) and only candExact with full floats
      val candFixed8 = ops.Pipelines.annCandidates(
        ops.Pipelines.annAssignmentsFixed(spark, sf0001, 16, 8)).count()
      val emb = Tables(spark, sf0001, "embeddings")
        .filter(org.apache.spark.sql.functions.col("vec_id") % 2 === 0)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
      val candAsym = ops.Pipelines.annCandidatesAsym(
        ops.Pipelines.annAssignmentsAdaptive(spark, sf0001, 16, 8.0),
        ops.Pipelines.annAssignmentsFixed(spark, sf0001, 16, 1)).persist()
      val candCode = candAsym.count()
      val candExact = ops.Pipelines.annCodePrefilter(spark, emb, candAsym, 0.05).count()
      candAsym.unpersist()
      info(f"adaptive massFactor=8 + prefilter: recall=$recall%.4f " +
        f"codeCompared=$candCode exactRescored=$candExact " +
        f"vs nprobe=8 exactRescored=$candFixed8 (${candFixed8.toDouble / candExact}%.1fx fewer full-float)")
      assert(recall >= 0.95, s"adaptive recall $recall below 0.95")
      assert(candExact * 2 < candFixed8,
        s"exact-rescored $candExact not under half of nprobe=8's $candFixed8")
    } finally { exact.unpersist(); adaptive.unpersist() }
  }
}
