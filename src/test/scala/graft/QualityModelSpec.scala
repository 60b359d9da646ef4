package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Curation, QualityModel}

/** The trained quality classifier (round 13): determinism, distributed
  * == driver scoring, separation on planted low-quality fixtures, and
  * the curation-stage hookup. Non-oracle (learned state) — these pins
  * are its correctness contract. */
class QualityModelSpec extends AnyFunSuite {
  import SharedSpark._
  import spark.implicits._

  /** Planted corpus: real fixture docs labeled good (1), synthetic
    * degenerate docs labeled bad (0) — the degradations a quality
    * model must catch: single-token repetition, digit junk, and
    * stopword soup. Deterministic (doc_id arithmetic, no RNG). */
  lazy val planted = {
    val good = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), lit(1L).as("label"))
    val bad = Tables(spark, sf0001, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        when(col("doc_id") % 9 === 0,
          concat_ws(" ", (1 to 40).map(_ => lit("spam")): _*))
          .when(col("doc_id") % 9 === 3,
            concat_ws(" ", (1 to 30).map(i => lit(s"${i * 7}13")): _*))
          .otherwise(concat_ws(" ", (1 to 35).map(i =>
            lit(if (i % 2 == 0) "the" else "a")): _*)).as("text"),
        lit(0L).as("label"))
    good.unionAll(bad).persist()
  }

  test("training is deterministic: same corpus, bit-identical model") {
    val m1 = QualityModel.train(planted, "label")
    val m2 = QualityModel.train(planted, "label")
    assert(m1 == m2)
  }

  test("distributed column scoring equals the driver-side arithmetic") {
    val m = QualityModel.train(planted, "label")
    val scored = QualityModel.score(planted, m)
      .select(col("doc_id"), col("quality_prob")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // recompute a slice driver-side from raw collected features
    val feats = planted.limit(50)
      .select(col("doc_id") +: QualityModel.features.map {
        case (n, c) => c.as(n) }: _*)
      .collect()
    feats.foreach { r =>
      val fv = Array.tabulate(QualityModel.features.size)(i => r.getDouble(i + 1))
      assert(scored(r.getLong(0)) == QualityModel.scoreLocal(m, fv),
        s"doc ${r.getLong(0)} distributed != driver score")
    }
  }

  test("planted low-quality docs separate cleanly from fixture docs") {
    val m = QualityModel.train(planted, "label")
    val scored = QualityModel.score(planted, m)
    val agg = scored.groupBy(col("label"))
      .agg(avg(col("quality_prob")).as("p"),
        sum(when(col("quality_prob") >= 0.5, 1L).otherwise(0L)).as("accepted"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1),
        r.getLong(2), r.getLong(3))).toMap
    val (goodP, goodAcc, goodN) = agg(1L)
    val (badP, badAcc, badN) = agg(0L)
    assert(goodP > 0.9, s"good docs scored low: $goodP")
    assert(badP < 0.1, s"planted junk scored high: $badP")
    // accuracy at the default threshold: >95% on both classes
    assert(goodAcc.toDouble / goodN > 0.95)
    assert((badN - badAcc).toDouble / badN > 0.95)
    // and the filter face keeps exactly the accepted set
    assert(QualityModel.filterByModel(planted, m).count() ==
      goodAcc + badAcc)
  }

  test("model slots into the curation pipeline as a quality stage") {
    val m = QualityModel.train(planted, "label")
    val (_, _, withModel) = Curation.curate(spark, sf0001,
      minTokens = 5, maxStopRatio = 0.9, testFraction = 0.2,
      qualityModel = Some(m))
    val (_, _, without) = Curation.curate(spark, sf0001,
      minTokens = 5, maxStopRatio = 0.9, testFraction = 0.2)
    // the fixture corpus is real text: the classifier trained on
    // planted junk should keep (nearly) all of it — the stage wires
    // in without gutting the corpus, and monotonicity holds
    assert(withModel.afterQuality <= without.afterQuality)
    assert(withModel.afterQuality > (without.afterQuality * 9) / 10,
      s"model gutted the real corpus: ${withModel.afterQuality} of " +
        s"${without.afterQuality}")
    assert(withModel.train > 0 && withModel.test > 0)
  }
}
