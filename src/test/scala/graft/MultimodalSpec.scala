package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Binary-payload pipeline: REAL javax.imageio decode for image
  * payloads, byte-histogram fallback for codec-absent modalities. */
class MultimodalSpec extends AnyFunSuite {
  import SharedSpark._

  lazy val media = Multimodal.mediaFromDocuments(spark, sf0001)

  /** Synthesize a solid-color PNG in memory. */
  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image payloads decode through javax.imageio to pixel features") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Media(1L, "image", png(8, 4, 0xff0000), Map("fmt" -> "png")),
      Multimodal.Media(2L, "image", png(3, 3, 0x00ff00), Map("fmt" -> "png")),
      Multimodal.Media(3L, "image", png(2, 2, 0x1020ff), Map("fmt" -> "png")),
      // corrupt image bytes must fall back, not crash or drop the row
      Multimodal.Media(4L, "image", Array[Byte](0x89.toByte, 'P', 'N', 'G', 0, 1), Map()))
    val feats = Multimodal.extractFeatures(assets.toDS())
      .collect().map(f => f.id -> f).toMap
    // solid red 8x4: w=8 h=4, meanR=255, meanG=0, meanB=0
    assert(feats(1L).features.take(5).toSeq == Seq(8.0, 4.0, 255.0, 0.0, 0.0))
    // luminance of pure red = 0.299 -> bin floor(0.299*11)=3, all pixels
    assert(feats(1L).features(5 + 3) == 1.0)
    assert(feats(2L).features.take(5).toSeq == Seq(3.0, 3.0, 0.0, 255.0, 0.0))
    assert(feats(3L).features.take(5).toSeq == Seq(2.0, 2.0, 16.0, 32.0, 255.0))
    // corrupt row survived via the fallback (16-dim byte histogram)
    assert(feats(4L).features.length == 16 && feats(4L).n_bytes == 6)
  }

  /** Synthesize a mono 16-bit PCM WAV of a sine wave in memory (RIFF
    * written by hand so the test is independent of the parser). */
  private def wav(sampleRate: Int, freq: Double, seconds: Double,
      amp: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36 + 2 * n); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(1) // PCM, mono
    bb.putInt(sampleRate); bb.putInt(sampleRate * 2)
    bb.putShort(2); bb.putShort(16) // block align, bits
    bb.put("data".getBytes); bb.putInt(2 * n)
    for (i <- 0 until n)
      bb.putShort((amp * 32767.0 *
        math.sin(2 * math.Pi * freq * i / sampleRate)).toShort)
    bb.array()
  }

  test("WAV payloads decode to real signal features") {
    import spark.implicits._
    val a440 = wav(8000, 440.0, 0.5, 0.8)
    val assets = Seq(
      Multimodal.Media(10L, "audio", a440, Map("fmt" -> "wav")),
      // truncated header falls back, row survives
      Multimodal.Media(11L, "audio", a440.take(20), Map()))
    val feats = Multimodal.extractFeatures(assets.toDS())
      .collect().map(f => f.id -> f).toMap
    val f = feats(10L).features
    assert(f(0) == 8000.0 && f(1) == 1.0 && f(2) == 16.0) // rate/ch/bits
    assert(math.abs(f(3) - 0.5) < 1e-3)                   // duration
    assert(math.abs(f(4) - 0.8 / math.sqrt(2)) < 0.01)    // sine RMS = A/sqrt(2)
    // a 440 Hz tone crosses zero ~2*440 times/sec -> rate 2*440/8000
    assert(math.abs(f(5) - 2 * 440.0 / 8000.0) < 0.01)
    assert(math.abs(f(6) - 0.8) < 0.01)                   // peak
    assert(math.abs(f.drop(7).sum - 1.0) < 1e-9)          // histogram L1
    assert(feats(11L).features.length == 16)              // fallback
    // same 16-dim shape as the image path: modality-agnostic joins
    assert(f.length == 16)
    // corrupt chunk size (> 2 GiB claim -> negative toInt) must fall
    // back, not spin the chunk walk forever
    val evil = a440.clone()
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(Multimodal.decodeWav(evil).isEmpty)
  }

  test("magic-byte sniffing routes only real images to the decoder") {
    assert(Multimodal.isImage(png(1, 1, 0)))
    assert(!Multimodal.isImage("just text bytes".getBytes))
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
  }

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

  /** Synthesize an animated GIF: `n` solid-gray frames of increasing
    * brightness, written through the JDK's writeToSequence API. */
  private def animatedGif(w: Int, h: Int, n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until n).foreach { f =>
      val g = (f * 255) / math.max(1, n - 1)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (g << 16) | (g << 8) | g)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    bos.toByteArray
  }

  test("multi-frame decode: animated GIF frames sampled evenly, never all") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Media(1L, "video", animatedGif(6, 4, 10), Map("fmt" -> "gif")),
      Multimodal.Media(2L, "image", png(3, 3, 0x000000), Map("fmt" -> "png")),
      Multimodal.Media(3L, "video", Array[Byte]('G', 'I', 'F', '8', 0), Map()))
    val frames = Multimodal.sampleDecodedFrames(assets.toDS(), 4)
      .collect().groupBy(_.id)
    // 10-frame GIF, k=4: frames 0,2,5,7 — evenly spaced, count k, not n
    val gif = frames(1L).sortBy(_.frame_no)
    assert(gif.length == 4)
    assert(gif.map(_.frame_no).toSeq == Seq(0, 2, 5, 7))
    assert(gif.forall(f => f.n_frames == 10 && f.width == 6 && f.height == 4))
    // brightness grows with frame index (frames are solid gray ramps)
    assert(gif.map(_.mean_luma).toSeq == gif.map(_.mean_luma).sorted.toSeq)
    assert(gif.last.mean_luma > gif.head.mean_luma + 0.5)
    // single-frame PNG degrades to its one frame; luma of black = 0
    assert(frames(2L).toSeq.map(f => (f.frame_no, f.n_frames, f.mean_luma)) == Seq((0, 1, 0.0)))
    // undecodable payload yields no rows instead of crashing
    assert(!frames.contains(3L))
  }

  /** Minimal uncompressed AVI writer (RIFF + raw bottom-up BGR DIB
    * frames): the fixture generator for the real video-decode path.
    * Frame f is solid gray f*255/(n-1) — a luminance ramp whose
    * physics the assertions pin. */
  private def rawAvi(w: Int, h: Int, n: Int): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(cap: Int)(fill: ByteBuffer => Unit): Array[Byte] = {
      val bb = ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN)
      fill(bb); bb.array()
    }
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le(4)(_.putInt(body.length)) ++ body ++
        (if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val avih = le(56) { b =>
      b.putInt(40000)            // usPerFrame -> 25 fps
      b.putInt(0); b.putInt(0); b.putInt(0)
      b.putInt(n)                // totalFrames
      b.putInt(0); b.putInt(1); b.putInt(0)
      b.putInt(w); b.putInt(h)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
    }
    val strh = le(56) { b =>
      b.put("vids".getBytes("US-ASCII")); b.put("DIB ".getBytes("US-ASCII"))
      (0 until 12).foreach(_ => b.putInt(0))
    }
    val strf = le(40) { b =>
      b.putInt(40); b.putInt(w); b.putInt(h)
      b.putShort(1); b.putShort(24)   // planes, 24 bpp
      b.putInt(0)                     // biCompression = 0 (raw)
      b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0); b.putInt(0)
    }
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val frames = (0 until n).flatMap { f =>
      val g = ((f * 255) / math.max(1, n - 1)).toByte
      val body = Array.fill(rowBytes * h)(0.toByte)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
        body(y * rowBytes + x * 3 + c) = g
      chunk("00db", body)
    }.toArray
    val payload = "AVI ".getBytes("US-ASCII") ++
      list("hdrl", chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf))) ++
      list("movi", frames)
    "RIFF".getBytes("US-ASCII") ++ le(4)(_.putInt(payload.length)) ++ payload
  }

  test("uncompressed AVI: real container parse, sampled-frame decode, clip features") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Media(1L, "video", rawAvi(6, 4, 10), Map("fmt" -> "avi")),
      Multimodal.Media(2L, "video", rawAvi(4, 2, 1), Map("fmt" -> "avi")),
      Multimodal.Media(3L, "video",
        Array[Byte]('R', 'I', 'F', 'F', 9, 0, 0, 0, 'A', 'V', 'I', ' ', 1), Map()))
    val frames = Multimodal.sampleDecodedFrames(assets.toDS(), 4)
      .collect().groupBy(_.id)
    // 10-frame clip, k=4: same even spacing as the GIF path — 0,2,5,7
    val avi = frames(1L).sortBy(_.frame_no)
    assert(avi.length == 4)
    assert(avi.map(_.frame_no).toSeq == Seq(0, 2, 5, 7))
    assert(avi.forall(f => f.n_frames == 10 && f.width == 6 && f.height == 4))
    // the gray ramp: luminance strictly grows, frame 0 black-ish
    assert(avi.map(_.mean_luma).toSeq == avi.map(_.mean_luma).sorted.toSeq)
    assert(avi.head.mean_luma < 0.01 && avi.last.mean_luma > 0.7)
    // single-frame clip degrades to its one frame
    assert(frames(2L).toSeq.map(f => (f.frame_no, f.n_frames)) == Seq((0, 1)))
    // truncated/corrupt RIFF yields no rows instead of crashing
    assert(!frames.contains(3L))
    // clip-level features: 16-dim, geometry + fps + ramp statistics
    val feats = Multimodal.extractFeatures(assets.toDS())
      .collect().map(f => f.id -> f.features).toMap
    val v = feats(1L)
    assert(v.length == 16)
    assert(v(0) == 6.0 && v(1) == 4.0 && v(2) == 10.0)   // w, h, nFrames
    assert(math.abs(v(3) - 25.0) < 1e-9)                  // fps from usPerFrame
    assert(math.abs(v(4) - 0.5) < 0.06)                   // ramp mean luma ~0.5
    assert(v(5) > 0.2)                                    // ramp spread
    assert(v(6) > 0.05 && v(6) < 0.2)                     // inter-frame delta ~1/9
    // corrupt payload takes the documented byte-histogram fallback
    assert(feats(3L).length == 16)
  }

  test("binaryFile ingest: asset directory -> Media -> real decode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_assets")
    java.nio.file.Files.write(dir.resolve("red.png"), png(4, 2, 0xff0000))
    java.nio.file.Files.write(dir.resolve("green.png"), png(2, 2, 0x00ff00))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "not an image".getBytes)
    val media = Multimodal.mediaFromBinaryFiles(
      spark, dir.toString, "*.png", "image")
    val rows = media.collect()
    // the glob prunes at the listing: the txt file is never read
    assert(rows.length == 2)
    assert(rows.map(_.id).distinct.length == 2) // path-hash ids are distinct
    assert(rows.forall(m => m.meta("bytes").toLong == m.payload.length))
    val byPath = Multimodal.extractFeatures(media).collect()
    // both decode through the REAL imageio path: (w, h, meanR, ...)
    assert(byPath.map(_.features.take(2).toSeq).toSet ==
      Set(Seq(4.0, 2.0), Seq(2.0, 2.0)))
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
