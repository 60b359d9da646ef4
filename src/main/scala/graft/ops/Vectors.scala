package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding storage operators: symmetric per-vector int8 quantization
  * (4x smaller than float32 — at 100 TB of embeddings this is the
  * difference between 25 TB and 100 TB of vector storage, and
  * proportionally less shuffle/scan). Pure codegen'd higher-order
  * functions — no UDF. A standalone storage operator: VectorsSpec
  * demonstrates the rescore shape (dequantize → cosine top-k) and
  * asserts bounded round-trip error; the declared ann/sim queries
  * rescore on original floats for oracle exactness. */
object Vectors {

  /** max|x| / 127 — the symmetric quantization scale (0-vectors get
    * scale 0 and all-zero codes). */
  private def scaleExpr(v: Column): Column =
    (aggregate(v, lit(0.0f),
      (acc, x) => greatest(acc, abs(x))) / 127.0f).cast(FloatType)

  /** Adds `codesCol` (array<tinyint>) and `scaleCol` (float) for the
    * float-array `vecCol`. */
  def quantize(df: DataFrame, vecCol: String,
      codesCol: String = "codes", scaleCol: String = "scale"): DataFrame = {
    val sc = scaleExpr(col(vecCol))
    df.withColumn(scaleCol, sc)
      .withColumn(codesCol,
        when(col(scaleCol) === 0.0f,
          transform(col(vecCol), _ => lit(0).cast(ByteType)))
          .otherwise(transform(col(vecCol),
            x => round(x / col(scaleCol)).cast(ByteType))))
  }

  /** Reconstructs a float array from codes × scale. */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => (c.cast(FloatType) * scale).cast(FloatType))
}
