package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (build brief): image/audio/video payloads
  * as opaque binary columns with typed metadata, plus partition-aware
  * decode / feature-extract / frame-sample operators.
  *
  * The decode step is REAL for images: payloads whose magic bytes
  * identify a JDK-decodable format (PNG/BMP/GIF/JPEG) go through
  * `javax.imageio` and yield pixel-level features (dimensions, channel
  * means, luminance histogram). Non-image payloads (audio/video — no
  * codecs in the JDK) fall back to a deterministic byte-histogram
  * extractor, clearly marked as the codec-absent path: a real
  * deployment plugs its codec into `decodeOther`. Either way the
  * Spark-side plumbing is identical and tested end-to-end: the typed
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

  /** True iff the payload's magic bytes identify a JDK-decodable image
    * container (PNG / BMP / GIF / JPEG). */
  private[graft] def isImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte))

  /** REAL image decode via javax.imageio. 16 deterministic pixel-level
    * features: [width, height, meanR, meanG, meanB, 11-bin luminance
    * histogram (L1-normalized)]. Returns None if the bytes don't
    * decode (corrupt asset → caller falls back, row is never lost). */
  private[graft] def decodeImage(payload: Array[Byte]): Option[Array[Double]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val hist = new Array[Double](11)
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            sr += r; sg += g; sb += b
            val luma = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            hist(math.min(10, (luma * 11).toInt)) += 1.0
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        var j = 0
        while (j < 11) { hist(j) /= n; j += 1 }
        Some(Array(w.toDouble, h.toDouble, sr / n, sg / n, sb / n) ++ hist)
      }
    } catch { case _: Exception => None }

  /** Codec-absent fallback for non-image modalities (audio/video — no
    * codecs ship with the JDK): deterministic 16-bin byte histogram,
    * L1-normalized. A real deployment plugs its decoder here;
    * everything around this call stays unchanged. */
  private[graft] def decodeOther(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xff) >> 4) += 1.0; i += 1 }
    if (payload.length > 0) { var j = 0; while (j < 16) { hist(j) /= payload.length; j += 1 } }
    hist
  }

  /** Decode + feature-extract with the canonical expensive-init batch
    * shape: mapPartitions so a real decoder is initialized once per
    * partition, not once per row. Image payloads (magic-byte sniffed)
    * take the real javax.imageio path; everything else the byte
    * fallback. */
  def extractFeatures(ds: Dataset[Media]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // real pipeline: heavier decoders (video codecs, ML feature
      // extractors) initialize HERE, once per partition
      rows.map { m =>
        val features =
          if (isImage(m.payload)) decodeImage(m.payload).getOrElse(decodeOther(m.payload))
          else decodeOther(m.payload)
        MediaFeatures(m.id, m.modality, m.payload.length.toLong, features)
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
