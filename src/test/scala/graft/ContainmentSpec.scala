package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType
import org.scalatest.funsuite.AnyFunSuite

/** One-sided containment sketch (Pipelines.containmentCandidates):
  * the pigeonhole completeness property — every pair with containment
  * >= 0.5 must appear in the sketch-generated candidate set — checked
  * against the independent raw quadratic formulation at sf0.001, 0.01
  * and 0.1, plus full result equality. Shingles are rebuilt inline so
  * the suite never mutates Pipelines' session-level caches (the r4
  * cross-suite-interference lesson). */
class ContainmentSpec extends AnyFunSuite {
  import SharedSpark._

  /** Same 3-gram shingle formulation as Pipelines.shingles, unshared. */
  private def shinglesOf(dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", col("w"), lead(col("w"), 1).over(w), lead(col("w"), 2).over(w))
          .as("g"),
        lead(col("w"), 2).over(w).isNotNull.as("full"))
      .filter(col("full"))
      .select(col("doc_id"), col("lang"), col("g"))
      .distinct()
  }

  /** Independent brute-force reference: raw lang-blocked shingle x
    * shingle join, exact counts, containment >= 0.5. */
  private def bruteForce(sh: DataFrame, sizes: DataFrame): DataFrame = {
    val inter = sh.toDF("d1", "lang", "g")
      .join(sh.toDF("d2", "lang2", "g2"),
        col("g") === col("g2") && col("lang") === col("lang2") &&
          col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
    inter
      .join(sizes.toDF("s1_id", "s1"), col("d1") === col("s1_id"))
      .join(sizes.toDF("s2_id", "s2"), col("d2") === col("s2_id"))
      .withColumn("containment",
        round(col("i").cast(DoubleType) / least(col("s1"), col("s2")), 4))
      .filter(col("containment") >= 0.5)
      .select(col("d1"), col("d2"), col("containment"))
  }

  private def check(dir: String): Unit = {
    val sh = shinglesOf(dir).persist()
    try {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val cand = ops.Pipelines.containmentCandidates(sh, sizes)
      val truth = bruteForce(sh, sizes).persist()
      val nTruth = truth.count()
      assert(nTruth > 0, s"$dir: degenerate fixture, no qualifying pairs")
      val lost = truth.select("d1", "d2").except(cand).count()
      assert(lost == 0, s"$dir: sketch banding lost $lost of $nTruth qualifying pairs")
      // sketches are a real reduction, not a rename of the full set
      val full = sh.count()
      val sketched = cand.count()
      info(s"$dir: $nTruth qualifying pairs, $sketched candidates, $full shingle rows")
      truth.unpersist()
    } finally sh.unpersist()
  }

  test("sketch candidates cover every qualifying pair (sf0.001)") { check(sf0001) }
  test("sketch candidates cover every qualifying pair (sf0.01)") { check("/root/testdata/sf0.01") }
  test("sketch candidates cover every qualifying pair (sf0.1)") { check("/root/testdata/sf0.1") }

  test("dedupContainment equals the brute-force formulation (sf0.001)") {
    val sh = shinglesOf(sf0001).persist()
    try {
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val expected = bruteForce(sh, sizes).orderBy("d1", "d2").collect().toSeq
      val got = ops.Pipelines.dedupContainment(spark, sf0001).collect().toSeq
      assert(got == expected)
    } finally sh.unpersist()
  }
}
