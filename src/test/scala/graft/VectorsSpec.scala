package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Vectors

/** int8 embedding quantization: bounded reconstruction error, 4x
  * storage reduction, degenerate-vector safety. */
class VectorsSpec extends AnyFunSuite {
  import SharedSpark._

  test("quantize/dequantize round-trip keeps cosine within 1e-3 of 1") {
    val emb = Tables(spark, sf0001, "embeddings")
    val q = Vectors.quantize(emb, "embedding")
      .withColumn("rec", Vectors.dequantize(col("codes"), col("scale")))
    val sim = graft.functions.CosineSimilarity.cosineSim(spark, col("embedding"), col("rec"))
    val worst = q.agg(min(sim)).collect()(0).getDouble(0)
    assert(worst > 0.999, s"worst round-trip cosine $worst")
    // codes really are int8 (the 4x storage claim)
    val schema = q.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(schema.elementType == org.apache.spark.sql.types.ByteType, schema)
  }

  test("top-k search over quantized vectors preserves the exact ranking") {
    // the storage path in use: rank candidates by cosine on DEQUANTIZED
    // vectors and compare against the exact float top-5 per probe
    val emb = Tables(spark, sf0001, "embeddings")
    val deq = Vectors.quantize(emb, "embedding")
      .withColumn("rec", Vectors.dequantize(col("codes"), col("scale")))
      .select(col("vec_id"), col("rec"))
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"))
    def top5(candVec: org.apache.spark.sql.DataFrame, vecCol: String) = {
      val sim = graft.functions.CosineSimilarity.cosineSim(spark, col("pe"), col(vecCol))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("pid")).orderBy(sim.desc, col("vec_id"))
      broadcast(probes).crossJoin(candVec)
        .filter(col("vec_id") =!= col("pid"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .select("pid", "vec_id")
    }
    val exact = top5(emb.select(col("vec_id"), col("embedding")), "embedding")
    val quant = top5(deq, "rec")
    val overlap = exact.join(quant, Seq("pid", "vec_id")).count()
    assert(overlap >= (50 * 0.8).toLong, s"quantized top-5 overlap $overlap/50")
  }

  test("zero vectors quantize to zero codes with zero scale") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(0.0f, 0.0f, 0.0f)), (2L, Array(1.0f, -2.0f, 0.5f)))
      .toDF("id", "embedding")
    val q = Vectors.quantize(df, "embedding").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(q(1L).getFloat(2) == 0.0f)
    assert(q(1L).getSeq[Byte](3).forall(_ == 0))
    // max-magnitude element maps to ±127
    assert(q(2L).getSeq[Byte](3)(1) == -127)
  }
}
