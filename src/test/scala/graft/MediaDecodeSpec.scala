package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRecord
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream

/** Real media decode through the Spark pipeline: genuine PNG and WAV bytes
  * (produced with the same JDK codecs at build time) must yield true
  * dimensions / sample rates, while undecodable payloads fall back to the
  * deterministic byte-level features without throwing. */
class MediaDecodeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000) // checkerboard
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def wavBytes(sampleRate: Int, nSamples: Int): Array[Byte] = {
    // 16-bit mono PCM sine-ish ramp
    val pcm = new Array[Byte](nSamples * 2)
    for (i <- 0 until nSamples) {
      val s = (math.sin(i * 0.1) * 16384).toInt.toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(in,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("PNG decodes to true dimensions and a balanced luminance histogram") {
    import spark.implicits._
    val records = Seq(
      MediaRecord(1L, "image", pngBytes(100, 40)),
      MediaRecord(2L, "image", pngBytes(7, 7))
    ).toDS()
    val out = Multimodal.decodeFeatures(records).collect().sortBy(_.media_id)
    assert(out(0).width == 100 && out(0).height == 40)
    assert(out(1).width == 7 && out(1).height == 7)
    // checkerboard: only the darkest and brightest luminance bins fire
    val hist = out(0).features
    assert(math.abs(hist.sum - 1.0f) < 1e-3)
    assert(hist(0) > 0.4f && hist(15) > 0.4f)
    assert(hist.slice(1, 15).forall(_ == 0f))
  }

  test("constructed BMP/WAV fixture really exercises the JDK codecs") {
    // mediaDecodeQuery's oracle is only meaningful if the codec path
    // FIRED: a silent fallback would give byte-level dims (width 64..127
    // from header bytes), not the decoder's 8×8 / 8000×1. Pin the decode
    // provenance per kind, and pin that the decoded histogram equals the
    // source block's high-nibble histogram computed independently here.
    val dir = "/root/testdata/sf0.001"
    val rows = Multimodal.mediaDecodeQuery(spark, dir).collect()
    assert(rows.nonEmpty)
    val byKind = rows.groupBy(_.getString(1))
    byKind("image").foreach { r =>
      assert(r.getInt(3) == 8 && r.getInt(4) == 8 && r.getInt(5) == 1,
        s"BMP leg fell back: $r")
      assert(r.getLong(2) == 246)
    }
    byKind("audio").foreach { r =>
      assert(r.getInt(3) == 8000 && r.getInt(4) == 1 && r.getInt(5) == 64,
        s"WAV leg fell back: $r")
      assert(r.getLong(2) == 108)
    }
    byKind("video").foreach { r =>
      assert(r.getLong(2) == 64 && r.getInt(3) >= 64 && r.getInt(3) < 128,
        s"video leg must be the byte-level fallback: $r")
    }
    // independent histogram check on one image + one audio row
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toMap
    for (kind <- Seq("image", "audio"); r <- byKind(kind).take(3)) {
      val src = Multimodal.srcBytes(texts(r.getLong(0)).getBytes("UTF-8"))
      val want = new Array[Int](16)
      src.foreach(b => want((b & 0xFF) >> 4) += 1)
      (0 until 16).foreach { b =>
        assert(math.abs(r.getDouble(6 + b) - want(b) / 64.0) < 1e-9,
          s"$kind media ${r.getLong(0)} bin $b: ${r.getDouble(6 + b)} vs ${want(b) / 64.0}")
      }
    }
  }

  test("WAV decodes to real sample rate, channels and frame count") {
    import spark.implicits._
    val records = Seq(MediaRecord(3L, "audio", wavBytes(8000, 1000))).toDS()
    val out = Multimodal.decodeFeatures(records).collect().head
    assert(out.width == 8000)  // sample rate
    assert(out.height == 1)    // channels
    assert(out.n_frames == 1000)
    assert(math.abs(out.features.sum - 1.0f) < 1e-3)
    // a ±16384 sine spans the middle amplitude bins, not the extremes
    assert(out.features(0) == 0f && out.features(15) == 0f)
  }

  test("undecodable payloads fall back to byte-level features, never throw") {
    import spark.implicits._
    val truncatedPng = pngBytes(10, 10).take(20) // magic intact, body gone
    val records = Seq(
      MediaRecord(4L, "video", Array[Byte](1, 2, 3, 4, 5)),
      MediaRecord(5L, "image", truncatedPng),
      MediaRecord(6L, "image", null)
    ).toDS()
    val out = Multimodal.decodeFeatures(records).collect().sortBy(_.media_id)
    assert(out.length == 3)
    // fallback dimension contract (64 + header byte % 64)
    out.foreach(f => assert(f.width >= 64 && f.width < 128))
    assert(out(0).n_frames >= 1) // video fallback frame fake
  }

  private def animatedGifBytes(w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until nFrames) {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if ((x + f) % 2 == 0) 0xFFFFFF else 0x000000)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  test("frame sampling: real frames from an animated GIF, stride honored") {
    import spark.implicits._
    val gif = animatedGifBytes(12, 9, nFrames = 10)
    val frames = Multimodal.frameSample(
      Seq(Multimodal.MediaRecord(7L, "video", gif)).toDS(), stride = 3)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 3, 6, 9))
    frames.foreach { f =>
      assert(f.width == 12 && f.height == 9)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3)
    }
  }

  test("frame sampling: a non-positive stride is rejected at plan-build time") {
    import spark.implicits._
    val rec = Multimodal.MediaRecord(8L, "video", Array[Byte](9, 8, 77))
    // inside a task, Range(0, n, 0) would throw and fail the whole job;
    // the guard must fire before any job is launched
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(Seq(rec).toDS(), stride = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.frameSample(Seq(rec).toDS(), stride = -3)
    }
  }

  test("frame sampling: non-GIF payloads emit deterministic synthetic frames") {
    import spark.implicits._
    val rec = Multimodal.MediaRecord(8L, "video", Array[Byte](9, 8, 77, 3, 4, 5))
    val a = Multimodal.frameSample(Seq(rec).toDS(), stride = 2).collect().sortBy(_.frame_idx)
    val b = Multimodal.frameSample(Seq(rec).toDS(), stride = 2).collect().sortBy(_.frame_idx)
    assert(a.nonEmpty && a.head.frame_idx == 0)
    assert(a.map(_.features.toSeq).toSeq == b.map(_.features.toSeq).toSeq) // deterministic
    a.foreach(f => assert(math.abs(f.features.sum - 1.0f) < 1e-3))
  }

  test("resize: large image scales to fit, small passes through, non-image degrades") {
    import spark.implicits._
    val records = Seq(
      Multimodal.MediaRecord(9L, "image", pngBytes(100, 60)),
      Multimodal.MediaRecord(10L, "image", pngBytes(30, 20)),
      Multimodal.MediaRecord(11L, "doc", "not an image".getBytes("UTF-8"))
    ).toDS()
    val out = Multimodal.resizeImages(records, maxDim = 50).collect().sortBy(_.media_id)
    val big = out(0)
    assert(big.resized && big.orig_width == 100 && big.orig_height == 60)
    assert(big.width == 50 && big.height == 30) // aspect preserved
    // the re-encoded bytes are a REAL decodable PNG of the new size
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big.content))
    assert(back.getWidth == 50 && back.getHeight == 30)
    val small = out(1)
    assert(!small.resized && small.width == 30 && small.content.sameElements(pngBytes(30, 20)))
    assert(!out(2).resized) // passthrough degrade, row kept
  }

  test("mixed real + opaque corpus decodes in one partition pass") {
    import spark.implicits._
    val records = (1 to 50).map { i =>
      if (i % 3 == 0) MediaRecord(i.toLong, "image", pngBytes(8 + i, 8))
      else MediaRecord(i.toLong, "doc", s"opaque payload $i".getBytes("UTF-8"))
    }.toDS().repartition(4)
    val out = Multimodal.decodeFeatures(records).collect()
    assert(out.length == 50)
    out.filter(_.kind == "image").foreach(f => assert(f.height == 8))
  }
}
