package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (build brief): image/audio/video payloads
  * as opaque binary columns with typed metadata, plus partition-aware
  * decode / feature-extract / frame-sample operators.
  *
  * The DECODE step is a STUB — real deployments plug an image/audio
  * codec in `decodeStub` (the libs are not in this container). It is
  * replaced by a deterministic byte-level feature extractor so the
  * Spark-side plumbing is real and testable end-to-end: the typed
  * schema, the mapPartitions batching shape (one decoder init per
  * partition, streamed rows), and the downstream join/agg compatibility
  * of the feature vectors.
  */
object Multimodal {

  /** An opaque media row: payload is the raw bytes of the asset. */
  case class Media(id: Long, modality: String, payload: Array[Byte],
      meta: Map[String, String])

  case class MediaFeatures(id: Long, modality: String, n_bytes: Long,
      features: Array[Double])

  case class Frame(id: Long, frame_no: Int, frame: Array[Byte])

  /** Manufacture a media table from the documents corpus (UTF-8 bytes
    * stand in for image bytes; at scale this is a parquet/binaryFile
    * read of real assets). */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[Media] = {
    import spark.implicits._
    table(spark, sfDir, "documents")
      .select(col("doc_id").as("id"), lit("text").as("modality"),
        col("text").cast("binary").as("payload"),
        map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      .as[Media]
  }

  /** STUB for the real decoder: deterministic 16-bin byte histogram,
    * L1-normalized. A real image pipeline returns e.g. CLIP features
    * here; everything around this call stays unchanged. */
  private[graft] def decodeStub(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    if (payload.length > 0) { var j = 0; while (j < 16) { hist(j) /= payload.length; j += 1 } }
    hist
  }

  /** Decode + feature-extract with the canonical expensive-init batch
    * shape: mapPartitions so a real decoder is initialized once per
    * partition, not once per row. */
  def extractFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // real pipeline: val decoder = HeavyDecoder.open()  (once per partition)
      rows.map { m =>
        MediaFeatures(m.id, m.modality, m.payload.length.toLong, decodeStub(m.payload))
      }
    }
  }

  /** Deterministic frame sampling: split the payload into `k` evenly
    * spaced byte windows (the video-frame-sampling plumbing shape). */
  def frameSample(ds: Dataset[Media], k: Int, frameLen: Int): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      val n = m.payload.length
      if (n == 0) Iterator.empty
      else (0 until k).iterator.map { f =>
        val start = (n.toLong * f / k).toInt
        Frame(m.id, f, m.payload.slice(start, math.min(n, start + frameLen)))
      }
    }
  }

  /** Feature vectors joined back against the embeddings modality — the
    * multimodal join shape over decoder output. */
  def featuresWithEmbeddings(spark: SparkSession, sfDir: String): Dataset[(Long, Double, Int)] = {
    import spark.implicits._
    val feats = extractFeatures(mediaFromDocuments(spark, sfDir))
    feats.toDF()
      .join(table(spark, sfDir, "embeddings"), col("id") === col("vec_id"))
      .select(col("id"),
        aggregate(col("features"), lit(0.0), (a, x) => a + x).as("feat_mass"),
        col("label"))
      .as[(Long, Double, Int)]
  }
}
