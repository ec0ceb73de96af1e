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
