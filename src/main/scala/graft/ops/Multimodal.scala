package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (build brief): image/audio/video payloads
  * as opaque binary columns with typed metadata, plus partition-aware
  * decode / feature-extract / frame-sample operators.
  *
  * The decode step is REAL for images AND audio: payloads whose magic
  * bytes identify a JDK-decodable image (PNG/BMP/GIF/JPEG) go through
  * `javax.imageio` and yield pixel-level features (dimensions, channel
  * means, luminance histogram); RIFF/WAVE PCM payloads are hand-parsed
  * (`decodeWav`) into signal-level features (rate, duration, RMS,
  * zero-crossing rate, amplitude histogram); and — round 10 — VIDEO is
  * real for uncompressed AVI (`parseAvi`/`decodeAvi`: hand-parsed
  * RIFF container, raw bottom-up BGR DIB frames, no codec needed —
  * only the SAMPLED frames are ever decoded). Compressed video (no
  * codecs in the JDK) falls back to a deterministic byte-histogram
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

  /** Asset-directory ingest via Spark's binaryFile source — the real
    * 100 TB entry point for media (one row per file: path,
    * modificationTime, length, content). `pathGlobFilter` prunes at
    * the listing, so a "*.png" ingest never reads other bytes; ids are
    * assigned by a hash of the path (stable across listings and
    * clusters, unlike monotonically_increasing_id). */
  def mediaFromBinaryFiles(spark: SparkSession, dir: String, glob: String,
      modality: String): Dataset[Media] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(xxhash64(col("path")).as("id"), lit(modality).as("modality"),
        col("content").as("payload"),
        map(lit("path"), col("path"),
          lit("bytes"), col("length").cast("string")).as("meta"))
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

  /** True iff the payload is a RIFF/WAVE container. */
  private[graft] def isWav(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  private def u16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
  private def u32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)

  /** REAL audio decode: hand-parsed RIFF/WAVE PCM (8-bit unsigned /
    * 16-bit signed little-endian — the dominant uncompressed layouts;
    * no codec library needed, the container is just framed bytes).
    * 16 deterministic signal-level features:
    * [sampleRate, channels, bitsPerSample, durationSec, rms,
    *  zeroCrossingRate, peak, 9-bin |amplitude| histogram
    *  (L1-normalized)] — same vector length as the image path, so
    * downstream feature joins are modality-agnostic.
    * Returns None when the container/encoding doesn't parse (caller
    * falls back; the row is never lost). */
  private[graft] def decodeWav(p: Array[Byte]): Option[Array[Double]] =
    try {
      if (!isWav(p)) return None
      // walk the chunk list for fmt + data (other chunks — LIST, fact,
      // cue — are skipped; chunks are word-aligned)
      var off = 12
      var fmtOff = -1
      var dataOff = -1
      var dataLen = 0
      while (off + 8 <= p.length && (fmtOff < 0 || dataOff < 0)) {
        val id = new String(p, off, 4, "US-ASCII")
        val sz = u32(p, off + 4).toInt
        // corrupt size fields (negative after toInt, i.e. > 2 GiB
        // claims) would make the step non-positive and spin this walk
        // forever — bail to the caller's fallback instead
        if (sz < 0) return None
        if (id == "fmt ") fmtOff = off + 8
        else if (id == "data") { dataOff = off + 8; dataLen = math.min(sz, p.length - dataOff) }
        off += 8 + sz + (sz & 1)
      }
      if (fmtOff < 0 || dataOff < 0) return None
      val audioFormat = u16(p, fmtOff)
      val channels = u16(p, fmtOff + 2)
      val sampleRate = u32(p, fmtOff + 4).toDouble
      val bits = u16(p, fmtOff + 14)
      if (audioFormat != 1 || channels < 1 || sampleRate <= 0 ||
          (bits != 8 && bits != 16)) return None
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * channels
      val nFrames = dataLen / frameBytes
      if (nFrames == 0) return None
      // mono mixdown, normalized to [-1, 1]
      val hist = new Array[Double](9)
      var (sumSq, peak) = (0.0, 0.0)
      var crossings = 0
      var prevSign = 0
      var f = 0
      while (f < nFrames) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val i = dataOff + f * frameBytes + c * bytesPerSample
          acc += (if (bits == 16) ((p(i) & 0xff) | (p(i + 1) << 8)) / 32768.0
                  else ((p(i) & 0xff) - 128) / 128.0)
          c += 1
        }
        val s = acc / channels
        sumSq += s * s
        val a = math.abs(s)
        if (a > peak) peak = a
        hist(math.min(8, (a * 9).toInt)) += 1.0
        val sign = if (s > 0) 1 else if (s < 0) -1 else prevSign
        if (prevSign != 0 && sign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        f += 1
      }
      var j = 0
      while (j < 9) { hist(j) /= nFrames; j += 1 }
      Some(Array(sampleRate, channels.toDouble, bits.toDouble,
        nFrames / sampleRate, math.sqrt(sumSq / nFrames),
        crossings.toDouble / nFrames, peak) ++ hist)
    } catch { case _: Exception => None }

  /** True iff the payload is a RIFF/AVI container. */
  private[graft] def isAvi(p: Array[Byte]): Boolean =
    p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'A' && p(9) == 'V' && p(10) == 'I' && p(11) == ' '

  private[graft] case class AviInfo(width: Int, height: Int, bits: Int,
      usPerFrame: Long, frames: Vector[(Int, Int)])

  /** REAL video container parse: RIFF/AVI with UNCOMPRESSED DIB
    * frames (biCompression = 0, 24/32 bpp) — like the WAV path, the
    * uncompressed layout is just framed bytes, so no codec library is
    * needed; '00db'/'00dc' chunks under LIST movi are raw bottom-up
    * BGR bitmaps. Collects the header geometry and every frame
    * chunk's (offset, size) WITHOUT decoding — decoding happens per
    * SAMPLED frame only, which is the point of frame sampling at
    * 100 TB. Compressed AVIs (biCompression != 0) and other video
    * containers still return None and take the documented byte
    * fallback. */
  private[graft] def parseAvi(p: Array[Byte]): Option[AviInfo] =
    try {
      if (!isAvi(p)) return None
      var width = 0; var height = 0; var bits = 0
      var usPf = 0L; var comp = -1L
      // fccType of the most recent strh — strf is only the video
      // BITMAPINFOHEADER when the enclosing stream is 'vids' (an
      // audio-first AVI lists a WAVEFORMATEX strf first, which the
      // old "first strf wins" read misparsed)
      var curStream = ""
      val frames = Vector.newBuilder[(Int, Int)]
      var bad = false
      // iterative walk, DEPTH-FIRST in strict document order: a LIFO
      // stack of (start, end) segments where descending into a LIST
      // pushes the remainder of the CURRENT segment as an explicit
      // resume entry underneath the LIST body — so every chunk is
      // visited exactly in byte order, matching the old recursive
      // walk (the FIFO variant visited nesting levels breadth-first,
      // which only kept strh→strf pairing correct for sibling
      // layouts). A hostile payload of deeply nested LISTs
      // (~12 bytes/level) stays safe: the stack is a heap List, not
      // the call stack — StackOverflowError is an Error and escaped
      // the old catch
      var work: List[(Int, Int)] = List((12, p.length))
      while (!bad && work.nonEmpty) {
        val (start, end) = work.head
        work = work.tail
        var off = start
        var go = true
        while (go && !bad && off + 8 <= end) {
          val id = new String(p, off, 4, "US-ASCII")
          val sz = u32(p, off + 4).toInt
          // corrupt sizes: negative (>2 GiB claim) or past the buffer
          if (sz < 0 || off + 8 + sz > p.length) { bad = true; go = false }
          else if (id == "LIST") {
            // descend NOW (document order): LIST body on top, the
            // rest of this segment resumes right after it
            work = (off + 12, off + 8 + sz) ::
              (off + 8 + sz + (sz & 1), end) :: work
            go = false
          } else {
            if (id == "avih" && sz >= 40) {
              usPf = u32(p, off + 8)
              width = u32(p, off + 8 + 32).toInt
              height = u32(p, off + 8 + 36).toInt
            } else if (id == "strh" && sz >= 4)
              curStream = new String(p, off + 8, 4, "US-ASCII")
            else if (id == "strf" && curStream == "vids" && comp < 0 &&
                sz >= 20) {
              bits = u16(p, off + 8 + 14)
              comp = u32(p, off + 8 + 16)
            } else if (id == "00db" || id == "00dc") frames += ((off + 8, sz))
            off += 8 + sz + (sz & 1)
          }
        }
      }
      val fr = frames.result()
      // implausible geometry (header u32s can claim up to 2^32-1;
      // width ~7e8 at 24bpp overflowed the old Int rowBytes and
      // defeated the frame-size guard below) → malformed
      if (bad || width <= 0 || height <= 0 || width > 65535 ||
          height > 65535 || comp != 0L ||
          (bits != 24 && bits != 32) || fr.isEmpty) None
      else {
        // every frame chunk must hold a full bitmap — an undersized
        // chunk would send aviFrameLuma reading past the chunk (found
        // by the AviProps fuzz property): malformed container → None.
        // All arithmetic in Long: width/height are already bounded to
        // 16 bits above, but keep the wide type so the guard can
        // never wrap again.
        val rowBytes = ((width.toLong * (bits / 8) + 3L) / 4L) * 4L
        val needed = rowBytes * height
        if (fr.exists(_._2 < needed)) None
        else Some(AviInfo(width, height, bits, usPf, fr))
      }
    } catch {
      // Throwable, not Exception: the decoder contract is "never
      // throw", and hostile input can raise Errors too
      case scala.util.control.NonFatal(_) => None
      case _: StackOverflowError => None
    }

  /** Mean luminance of one raw DIB frame: bottom-up rows, 4-byte row
    * padding, BGR(A) order — the bitmap layout AVI inherits from
    * Windows DIBs. */
  private def aviFrameLuma(p: Array[Byte], info: AviInfo, off: Int): Double = {
    val bpp = info.bits / 8
    val rowBytes = ((info.width * bpp + 3) / 4) * 4
    var s = 0.0
    var y = 0
    while (y < info.height) {
      val rowOff = off + (info.height - 1 - y) * rowBytes
      var x = 0
      while (x < info.width) {
        val i = rowOff + x * bpp
        s += 0.299 * (p(i + 2) & 0xff) + 0.587 * (p(i + 1) & 0xff) +
          0.114 * (p(i) & 0xff)
        x += 1
      }
      y += 1
    }
    s / (info.width.toLong * info.height) / 255.0
  }

  /** REAL video decode (uncompressed AVI): 16 deterministic
    * clip-level features — [width, height, nFrames, fps, meanLuma,
    * lumaStd, meanInterFrameDelta, 9-bin luma histogram] — same
    * vector length as the image/audio paths, so downstream feature
    * joins stay modality-agnostic. */
  private[graft] def decodeAvi(p: Array[Byte]): Option[Array[Double]] =
    try decodeAviUnsafe(p)
    catch { case _: Exception => None } // decoder must never throw

  private def decodeAviUnsafe(p: Array[Byte]): Option[Array[Double]] =
    parseAvi(p).map { info =>
      val lumas = info.frames.map { case (o, _) => aviFrameLuma(p, info, o) }
      val n = lumas.size.toDouble
      val mean = lumas.sum / n
      val variance = lumas.map(l => (l - mean) * (l - mean)).sum / n
      val delta =
        if (lumas.size > 1)
          lumas.sliding(2).map(w => math.abs(w(1) - w(0))).sum / (n - 1)
        else 0.0
      val hist = new Array[Double](9)
      lumas.foreach(l => hist(math.min(8, (l * 9).toInt)) += 1.0)
      var j = 0
      while (j < 9) { hist(j) /= n; j += 1 }
      val fps = if (info.usPerFrame > 0) 1e6 / info.usPerFrame else 0.0
      Array(info.width.toDouble, info.height.toDouble, n, fps, mean,
        math.sqrt(variance), delta) ++ hist
    }

  /** Codec-absent fallback for the remaining payloads (COMPRESSED
    * video — no codecs ship with the JDK; uncompressed AVI now takes
    * the real [[decodeAvi]]/[[parseAvi]] path): deterministic 16-bin
    * byte histogram, L1-normalized. A real deployment plugs its
    * decoder here; everything around this call stays unchanged. */
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
          else if (isWav(m.payload)) decodeWav(m.payload).getOrElse(decodeOther(m.payload))
          else if (isAvi(m.payload)) decodeAvi(m.payload).getOrElse(decodeOther(m.payload))
          else decodeOther(m.payload)
        MediaFeatures(m.id, m.modality, m.payload.length.toLong, features)
      }
    }
  }

  case class DecodedFrame(id: Long, frame_no: Int, n_frames: Int,
      width: Int, height: Int, mean_luma: Double)

  /** REAL multi-frame decode + frame sampling: any container the JDK's
    * ImageReader sequence API handles (animated GIF ships with the
    * JDK) is opened ONCE, its frame count read, and `k` evenly spaced
    * frames decoded — never the whole sequence, which is the point of
    * frame sampling at 100 TB (a 10-minute clip decodes 8 frames, not
    * 18 000). Non-sequence images degrade to their single frame;
    * undecodable payloads yield no rows (the byte-window
    * [[frameSample]] remains the codec-absent fallback path). */
  def sampleDecodedFrames(ds: Dataset[Media], k: Int): Dataset[DecodedFrame] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // heavier video codecs would initialize here, once per partition
      rows.flatMap { m =>
        if (isAvi(m.payload)) {
          // uncompressed AVI: hand-parsed container, only the k
          // sampled frames are ever decoded; same catch-to-empty
          // contract as the imageio branch below — a corrupt payload
          // must drop its rows, never kill the task
          try {
            parseAvi(m.payload) match {
              case Some(info) =>
                val n = info.frames.size
                val kk = math.min(k, n)
                (0 until kk).map(f => (n.toLong * f / kk).toInt).distinct
                  .map { idx =>
                    DecodedFrame(m.id, idx, n, info.width, info.height,
                      aviFrameLuma(m.payload, info, info.frames(idx)._1))
                  }.iterator
              case None => Iterator.empty
            }
          } catch { case _: Exception => Iterator.empty }
        } else {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); Iterator.empty }
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            val picks = (0 until math.min(k, n)).map(f => n.toLong * f / math.min(k, n))
            picks.distinct.iterator.map { idx =>
              val img = reader.read(idx.toInt)
              val (w, h) = (img.getWidth, img.getHeight)
              var s = 0.0
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  s += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                    0.114 * (rgb & 0xff)
                  x += 1
                }
                y += 1
              }
              DecodedFrame(m.id, idx.toInt, n, w, h, s / (w.toLong * h) / 255.0)
            }.toList.iterator
          } catch { case _: Exception => Iterator.empty }
          finally { reader.dispose(); iis.close() }
        }
        }
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
