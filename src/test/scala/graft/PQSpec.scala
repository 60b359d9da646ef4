package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.PQ

/** Product quantization: deterministic training/encoding, real
  * compression, and ADC-rerank search that recovers the exact top-k
  * with high recall. */
class PQSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val emb = Tables(spark, sf0001, "embeddings")
  private lazy val model = PQ.train(emb, "embedding", "vec_id", m = 8)
  private lazy val codes = PQ.encode(emb, "embedding", "vec_id", model).cache()

  private def probeVec(id: Long): Array[Float] =
    emb.filter(col("vec_id") === id).select("embedding")
      .collect()(0).getSeq[Float](0).toArray

  private def exactTopK(probe: Array[Float], k: Int): Seq[Long] = {
    import spark.implicits._
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        var s = 0.0; var i = 0
        while (i < v.length) { val d = v(i) - probe(i); s += d * d; i += 1 }
        (id, math.sqrt(s))
      }
      .toDF("vec_id", "dist").orderBy(col("dist"), col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("training and encoding are deterministic") {
    val m2 = PQ.train(emb, "embedding", "vec_id", m = 8)
    assert(model.codebooks.flatten.flatten.toSeq == m2.codebooks.flatten.flatten.toSeq)
    val c1 = codes.orderBy("vec_id").collect()
      .map(_.getAs[Array[Byte]]("codes").toSeq).toSeq
    val c2 = PQ.encode(emb, "embedding", "vec_id", m2)
      .orderBy("vec_id").collect().map(_.getAs[Array[Byte]]("codes").toSeq).toSeq
    assert(c1 == c2)
  }

  test("codes are 8 bytes per 64-dim float vector (32x compression)") {
    val row = codes.limit(1).collect()(0)
    assert(row.getAs[Array[Byte]]("codes").length == 8)
    assert(codes.count() == emb.count())
  }

  test("ADC distances track exact distances (top candidates rank early)") {
    val probe = probeVec(7L)
    val exact10 = exactTopK(probe, 10).toSet
    // the true top-10's mean ADC rank must sit far inside the front of
    // the 500-row ADC ranking — i.e. ADC is informative, not noise
    val adcRanked = PQ.adcScores(codes, "vec_id", probe, model)
      .orderBy(col("adc_dist"), col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    val ranks = exact10.map(id => adcRanked.indexOf(id)).toSeq
    assert(ranks.max < adcRanked.length, "every id present")
    assert(ranks.sum.toDouble / ranks.size < adcRanked.length / 4.0,
      s"mean ADC rank of true top-10 was ${ranks.sum / ranks.size} of ${adcRanked.length}")
  }

  test("codebook padding cycles ALL seeds when distinct subvectors < k") {
    import spark.implicits._
    val pts = Seq(
      Array(0.0f, 0.0f), Array(1.0f, 1.0f), Array(2.0f, 2.0f),
      Array(0.0f, 0.0f), Array(1.0f, 1.0f), Array(2.0f, 2.0f))
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val m = PQ.train(df, "v", "id", m = 1, k = 6, iters = 2)
    // 3 distinct seeds, k=6: each must appear exactly twice (the
    // pre-fix modulus always padded seed 0 -> counts 4/1/1)
    val counts = m.codebooks(0).map(_.toSeq).groupBy(identity).map(_._2.length).toSeq
    assert(counts.sorted == Seq(2, 2, 2), s"centroid multiplicity: $counts")
  }

  test("encodeIvfPq single pass equals encode + assignCells (raw-code layout)") {
    val coarse = PQ.trainIvf(emb, "embedding", "vec_id", nCells = 16)
    val onePass = PQ.encodeIvfPq(emb, "embedding", "vec_id", coarse, model,
      residual = false)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
    val twoPass = PQ.encode(emb, "embedding", "vec_id", model)
      .join(PQ.assignCells(emb, "embedding", "vec_id", coarse), "vec_id")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Int]("cell"), r.getAs[Array[Byte]]("codes").toSeq))
    assert(onePass.toSeq == twoPass.toSeq)
  }

  test("IVF-PQ with residual codes + multi-assign: recall@10 >= 0.95 per probe") {
    val coarse = PQ.trainIvf(emb, "embedding", "vec_id", nCells = 16)
    // the standard formulation: PQ codebooks trained on cell residuals,
    // codes quantize v - centroid(cell), ADC table built per probed
    // cell from the probe's residual. assign=4 stores each vector in
    // its 4 nearest cells: measured (r6), the r5 recall loss at
    // nprobe=8/16 was ENTIRELY coverage — 10/6/7 of each probe's true
    // top-10 lay inside the probed cells, exactly the observed
    // 1.0/0.6/0.7 recall, with ADC+rerank recovering every covered
    // neighbor — so the fix is assignment width, not code fidelity.
    val rmodel = PQ.trainResidual(emb, "embedding", "vec_id", coarse, m = 8)
    val layout = PQ.encodeIvfPq(emb, "embedding", "vec_id", coarse, rmodel,
      assign = 4).cache()
    val n = emb.count()
    assert(layout.count() == 4 * n) // one row per (vector, stored cell)
    assert(layout.select("vec_id").distinct().count() == n)
    // cells partition the corpus non-degenerately
    val cellSizes = layout.groupBy("cell").count().collect().map(_.getLong(1))
    assert(cellSizes.length > 4 && cellSizes.max < n)
    val recalls = Seq(3L, 7L, 101L).map { q =>
      val probe = probeVec(q)
      val exact10 = exactTopK(probe, 10).toSet
      val got = PQ.searchIvfPq(emb, layout, "embedding", "vec_id", probe,
        coarse, rmodel, nprobe = 8, k = 10, rerank = 50)
        .collect().map(_.getLong(0)).toSet
      assert(got.size == 10)
      (exact10 intersect got).size / 10.0
    }
    info(s"residual IVF-PQ recall@10 (nprobe=8, rerank=50, assign=4): $recalls")
    // r5's raw-code combined recall was 1.0/0.6/0.7 on these probes
    // (VERDICT r5 item 3); residual codes restore in-cell fidelity and
    // multi-assignment restores coverage — both were needed. r6's
    // remaining loss (0.9 on the third probe at assign=3) was measured
    // to be coverage too: rerank=100 at assign=3 left it at 0.9, while
    // assign=4 at the ORIGINAL rerank=50 recovers 1.0/1.0/1.0 — the
    // missing neighbor's stored cells simply weren't probed, one more
    // assignment puts it in reach. Storage cost: 4x8 B codes/vector,
    // still 8x smaller than one raw vector.
    recalls.foreach(r => assert(r >= 0.95, s"per-probe recall $r below 0.95: $recalls"))
    // the probe's own vector lives in the nearest cell (residual 0) ->
    // always found
    val self = PQ.searchIvfPq(emb, layout, "embedding", "vec_id",
      probeVec(7L), coarse, rmodel, nprobe = 1, k = 1, rerank = 10).collect()(0)
    assert(self.getLong(0) == 7L && self.getDouble(1) == 0.0)
    // residual training is deterministic like everything else here
    val r2 = PQ.trainResidual(emb, "embedding", "vec_id", coarse, m = 8)
    assert(rmodel.codebooks.flatten.flatten.toSeq == r2.codebooks.flatten.flatten.toSeq)
  }

  test("searchTopK: exact-rescored results, measured recall floor") {
    val ks = Seq(3L, 7L, 101L, 250L)
    val recalls = ks.map { q =>
      val probe = probeVec(q)
      val exact10 = exactTopK(probe, 10).toSet
      val got = PQ.searchTopK(emb, codes, "embedding", "vec_id", probe,
        model, k = 10, rerank = 50).collect().map(_.getLong(0)).toSet
      assert(got.size == 10)
      (exact10 intersect got).size / 10.0
    }
    val mean = recalls.sum / recalls.size
    info(s"recall@10 (rerank=50) per probe: $recalls, mean $mean")
    // r4 baseline was 0.75 (first-K-distinct init, K=16, 256-row
    // sample); farthest-point init + full-sample Lloyd + K=256 byte
    // codes must beat it at the same 8-byte code size
    assert(mean > 0.75, s"mean recall@10 $mean not above the 0.75 r4 baseline")
    // the probe itself (distance 0) must always survive the pipeline
    val self = PQ.searchTopK(emb, codes, "embedding", "vec_id",
      probeVec(3L), model, k = 1, rerank = 50).collect()(0)
    assert(self.getLong(0) == 3L && self.getDouble(1) == 0.0)
  }
}
