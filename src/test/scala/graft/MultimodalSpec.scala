package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Binary-payload pipeline plumbing (decode step stubbed by design —
  * build brief: "make the Spark-side plumbing real and tested"). */
class MultimodalSpec extends AnyFunSuite {
  import SharedSpark._

  lazy val media = Multimodal.mediaFromDocuments(spark, sf0001)

  test("media table: binary payloads with typed metadata") {
    val m = media.head()
    assert(m.modality == "text" && m.payload.nonEmpty && m.meta.contains("lang"))
    assert(media.count() == Tables(spark, sf0001, "documents").count())
  }

  test("feature extraction: deterministic, normalized, join-compatible") {
    val feats = Multimodal.extractFeatures(media)
    val f = feats.orderBy("id").head()
    assert(f.features.length == 16)
    assert(math.abs(f.features.sum - 1.0) < 1e-9)
    val again = Multimodal.extractFeatures(media).orderBy("id").head()
    assert(f.features.sameElements(again.features))
  }

  test("frame sampling splits payloads deterministically") {
    val frames = Multimodal.frameSample(media, k = 4, frameLen = 16)
    assert(frames.count() == media.count() * 4)
    assert(frames.filter(col("frame_no") >= 4).count() == 0)
  }

  test("features join against the embedding modality") {
    val joined = Multimodal.featuresWithEmbeddings(spark, sf0001)
    assert(joined.count() ==
      Tables(spark, sf0001, "documents")
        .join(Tables(spark, sf0001, "embeddings"),
          col("doc_id") === col("vec_id")).count())
  }
}
