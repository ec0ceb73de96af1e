package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and the decode / feature-extract /
  * resize / frame-sample steps run as typed `mapPartitions` over batches.
  *
  * Decode is REAL for the formats the JDK itself can read — PNG / JPEG /
  * BMP / GIF via `javax.imageio` (true dimensions + a 16-bin luminance
  * histogram) and PCM WAV via `javax.sound.sampled` (sample rate,
  * channels, frame count + a 16-bin amplitude histogram). Payloads in any
  * other format (video containers, exotic codecs — nothing in this
  * container or the JDK decodes those) fall back to
  * [[DeterministicDecoder]]'s byte-level features, so decode NEVER throws:
  * an undecodable blob degrades to opaque-bytes features, keeping the
  * operator total (risk register §7.4.4).
  *
  * Scale notes: media blobs dominate row size, so the partition layout is
  * driven by `spark.sql.files.maxPartitionBytes`, not row count; decode is
  * CPU-bound per partition with zero shuffle (histograms subsample huge
  * images so per-row cost is bounded); features are small and
  * shuffle-friendly downstream. Never collect blobs to the driver.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte])

  /** Decoded features: the shape a real decoder would emit. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      features: Array[Float])

  /** Format sniff + real decode where the JDK has a codec; byte-level
    * fallback otherwise. One instance per partition (see [[decodeFeatures]]). */
  object MediaDecoder {
    import java.io.ByteArrayInputStream

    private def isPng(b: Array[Byte]) =
      b.length > 8 && b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    private def isJpeg(b: Array[Byte]) =
      b.length > 3 && b(0) == 0xFF.toByte && b(1) == 0xD8.toByte
    private def isBmp(b: Array[Byte]) = b.length > 2 && b(0) == 'B' && b(1) == 'M'
    private def isGif(b: Array[Byte]) =
      b.length > 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
    private def isWav(b: Array[Byte]) =
      b.length > 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = if (r.content == null) Array.empty[Byte] else r.content
      val real =
        if (isPng(bytes) || isJpeg(bytes) || isBmp(bytes) || isGif(bytes)) decodeImage(r, bytes)
        else if (isWav(bytes)) decodeWav(r, bytes)
        else None
      real.getOrElse(DeterministicDecoder.decode(r))
    }

    /** Decompression-bomb guard: a corrupt/crafted header can declare a
      * raster whose full decode would OOM the executor (OutOfMemoryError
      * escapes NonFatal) — read the dimensions from the HEADER first and
      * refuse to materialize anything above this (64M px ≈ 256 MB ARGB).
      * Shared with [[resizeImages]] and [[frameSample]]: every path that
      * calls `reader.read` must check it first. */
    private[operators] val MaxRasterPixels = 64L * 1024 * 1024

    /** Real image decode: true width/height from the raster, features =
      * 16-bin luminance histogram (L1-normalized). Large rasters are
      * subsampled on a deterministic stride so per-row cost is bounded
      * (≤ ~256×256 probed pixels). */
    private def decodeImage(r: MediaRecord, bytes: Array[Byte]): Option[MediaFeatures] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        val img =
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) return None
            val reader = readers.next()
            try {
              reader.setInput(iis)
              if (reader.getWidth(0).toLong * reader.getHeight(0).toLong > MaxRasterPixels)
                return None // bomb: header-declared raster too large to decode
              reader.read(0)
            } finally reader.dispose()
          } finally iis.close()
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sx = math.max(1, w / 256)
          val sy = math.max(1, h / 256)
          val hist = new Array[Float](16)
          var count = 0f
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
                (rgb & 0xFF) * 114) / 1000
              hist(lum >> 4) += 1f
              count += 1f
              x += sx
            }
            y += sy
          }
          val total = math.max(1f, count)
          Some(MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
            width = w, height = h, n_frames = 1, features = hist.map(_ / total)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Real WAV decode (PCM 8/16-bit): width = sample rate, height =
      * channel count (the schema is image-shaped; documented reuse),
      * n_frames = audio frame count, features = 16-bin amplitude
      * histogram over the decoded samples. */
    private def decodeWav(r: MediaRecord, bytes: Array[Byte]): Option[MediaFeatures] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          val bits = fmt.getSampleSizeInBits
          // PCM only: companded encodings (A-law/µ-law) would histogram as
          // garbage amplitudes — let them fall back to byte-level features
          val enc = fmt.getEncoding
          val pcmOk =
            (bits == 8 && enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) ||
              (bits == 16 && enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          if (!pcmOk) return None
          val data = in.readAllBytes()
          val hist = new Array[Float](16)
          var count = 0f
          if (bits == 8) { // unsigned 8-bit PCM
            data.foreach { b => hist((b & 0xFF) >> 4) += 1f; count += 1f }
          } else { // signed 16-bit PCM
            val le = !fmt.isBigEndian
            var i = 0
            while (i + 1 < data.length) {
              val s =
                if (le) ((data(i + 1) << 8) | (data(i) & 0xFF)).toShort
                else ((data(i) << 8) | (data(i + 1) & 0xFF)).toShort
              hist((s + 32768) >> 12) += 1f
              count += 1f
              i += 2
            }
          }
          val total = math.max(1f, count)
          Some(MediaFeatures(r.media_id, r.kind, bytes.length.toLong,
            width = fmt.getSampleRate.toInt, height = fmt.getChannels,
            n_frames = in.getFrameLength.toInt, features = hist.map(_ / total)))
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic byte-level fallback for formats with no JDK codec:
    * dimensions from header bytes, 16-bin byte histogram (L1-normalized)
    * as the feature vector. Also the determinism anchor for the
    * `q_multimodal` query (its corpus payloads are opaque bytes). */
  object DeterministicDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = if (r.content == null) Array.empty[Byte] else r.content
      val h = bytes.take(4).padTo(4, 0.toByte)
      val hist = new Array[Float](16)
      bytes.foreach(b => hist((b & 0xFF) >> 4) += 1f)
      val total = math.max(1f, bytes.length.toFloat)
      MediaFeatures(
        media_id = r.media_id,
        kind = r.kind,
        n_bytes = bytes.length.toLong,
        width = 64 + ((h(0) & 0xFF) % 64),
        height = 64 + ((h(1) & 0xFF) % 64),
        n_frames = if (r.kind == "video") 1 + ((h(2) & 0xFF) % 30) else 1,
        features = hist.map(_ / total))
    }
  }

  /** The typed decode stage: one decoder instance per partition (mirrors
    * how a real codec would amortize init cost), streaming iteration — no
    * partition-wide materialization. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it => it.map(MediaDecoder.decode) }
  }

  /** One sampled frame: media id + frame coordinates + per-frame features. */
  case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  /** A resized payload: original + new dimensions, re-encoded bytes, and
    * whether a real raster resize happened (false = passthrough degrade).
    * `format` names the CONTAINER of `content` — a resize re-encodes as
    * PNG regardless of the input format, so consumers must key parsers on
    * this field, not on `kind` (which is the logical media type). */
  case class ResizedMedia(
      media_id: Long,
      kind: String,
      format: String,
      orig_width: Int,
      orig_height: Int,
      width: Int,
      height: Int,
      resized: Boolean,
      content: Array[Byte])

  private def lumaHistogram(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val sx = math.max(1, w / 256)
    val sy = math.max(1, h / 256)
    val hist = new Array[Float](16)
    var count = 0f
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114) / 1000
        hist(lum >> 4) += 1f
        count += 1f
        x += sx
      }
      y += sy
    }
    hist.map(_ / math.max(1f, count))
  }

  /** Frame sampling (every `stride`-th frame, always including frame 0):
    * REAL for animated GIFs — the one multi-frame format the JDK decodes
    * (`ImageIO` reader, `getNumImages`) — with true per-frame dimensions
    * and luminance histograms; any other payload degrades to
    * DETERMINISTIC synthetic frames (frame count from the byte-level
    * decoder, features keyed on (content hash, frame_idx)) so the
    * plumbing — row explosion, schema, partition-bounded cost — is
    * exercised even where no codec exists. Streaming flatMap per
    * partition; emitted rows carry features, never frame rasters. */
  def frameSample(media: Dataset[MediaRecord], stride: Int = 5): Dataset[MediaFrame] = {
    // a non-positive stride would make Range(0, n, stride) throw inside the
    // task and fail the whole job — reject it at plan-build time instead
    require(stride > 0, s"frameSample stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val bytes = if (r.content == null) Array.empty[Byte] else r.content
      val real: Option[Seq[MediaFrame]] =
        if (bytes.length > 4 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) None
              else {
                val reader = readers.next()
                try {
                  reader.setInput(iis)
                  // header-first bomb guard, same as decode/resize: a
                  // crafted frame size would OOM at reader.read (an error
                  // the NonFatal catch does NOT absorb). Checked for EVERY
                  // sampled frame, not just frame 0 — GIF frames carry
                  // independent dimensions, so a bomb can hide a huge
                  // frame behind a small first one.
                  val n = reader.getNumImages(true)
                  val sampled = Range(0, n, stride)
                  if (sampled.exists(i =>
                    reader.getWidth(i).toLong * reader.getHeight(i).toLong >
                      MediaDecoder.MaxRasterPixels)) None
                  else
                    Some(sampled.map { i =>
                      val img = reader.read(i)
                      MediaFrame(r.media_id, i, img.getWidth, img.getHeight,
                        lumaHistogram(img))
                    })
                } finally reader.dispose()
              }
            } finally iis.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        else None
      real.getOrElse {
        val f = DeterministicDecoder.decode(r)
        val seed = java.util.Arrays.hashCode(bytes)
        Range(0, f.n_frames, stride).map { i =>
          val hist = Array.tabulate(16) { b =>
            ((seed * 31 + i * 17 + b * 7) & 0xFF).toFloat
          }
          val total = math.max(1f, hist.sum)
          MediaFrame(r.media_id, i, f.width, f.height, hist.map(_ / total))
        }
      }
    })
  }

  /** Raster resize to fit `maxDim` (aspect preserved, never upscales):
    * REAL for JDK-decodable images — smooth-scaled draw, PNG re-encode —
    * with the same header-first bomb guard as decode; undecodable or
    * already-small payloads pass through unchanged with `resized=false`
    * (totality policy: a resize stage must never drop or corrupt rows it
    * cannot process). */
  def resizeImages(media: Dataset[MediaRecord], maxDim: Int = 256): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val bytes = if (r.content == null) Array.empty[Byte] else r.content
      val out: Option[ResizedMedia] =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) None
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val origFormat = reader.getFormatName.toLowerCase
                val (ow, oh) = (reader.getWidth(0), reader.getHeight(0))
                if (ow.toLong * oh.toLong > MediaDecoder.MaxRasterPixels) None // bomb guard
                else if (ow <= maxDim && oh <= maxDim)
                  Some(ResizedMedia(r.media_id, r.kind, origFormat, ow, oh, ow, oh,
                    resized = false, content = bytes))
                else {
                  val img = reader.read(0)
                  val scale = maxDim.toDouble / math.max(ow, oh)
                  val nw = math.max(1, math.round(ow * scale).toInt)
                  val nh = math.max(1, math.round(oh * scale).toInt)
                  val dst = new java.awt.image.BufferedImage(
                    nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
                  val g = dst.createGraphics()
                  try {
                    g.setRenderingHint(
                      java.awt.RenderingHints.KEY_INTERPOLATION,
                      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                    g.drawImage(img, 0, 0, nw, nh, null)
                  } finally g.dispose()
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(dst, "png", bos)
                  Some(ResizedMedia(r.media_id, r.kind, "png", ow, oh, nw, nh,
                    resized = true, content = bos.toByteArray))
                }
              } finally reader.dispose()
            }
          } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      out.getOrElse {
        // not an image (or undecodable): passthrough with byte-level dims
        val f = DeterministicDecoder.decode(r)
        ResizedMedia(r.media_id, r.kind, "opaque", f.width, f.height, f.width, f.height,
          resized = false, content = bytes)
      }
    })
  }

  /** Build a media table from the documents corpus (text bytes standing in
    * for media payloads) — exercising the binary column path end-to-end. */
  def fromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaRecord]
  }

  /** The ORACLED byte-feature leg of the multimodal stack — every feature
    * a decoder-free pass can extract from an opaque binary column, computed
    * COLUMNAR (hex/regexp/length builtins, whole-stage codegen; no UDF, no
    * typed map) so DuckDB can compute the identical relation over the same
    * parquet ([[byteFeatureSql]] — `q_media_bytes`). This splits
    * `q_multimodal` at the oracle boundary: byte features (sizes, magic
    * sniff, header-derived dims, nibble histogram bins, content hash) are
    * exactly checkable; only the codec leg (real JDK rasters/PCM —
    * [[featureQuery]]) stays differential (MediaDecodeSpec).
    *
    * Feature definitions mirror [[DeterministicDecoder]]: dims from header
    * bytes 0..2 (zero-padded like `padTo(4, 0)`), histogram = high-nibble
    * frequency (bins 0 and 7 published, same picks as [[featureQuery]]),
    * plus the magic sniff [[MediaDecoder]] routes on and an md5 content
    * hash (both engines print lowercase hex). All arithmetic is integer
    * counts + double division, exact in both engines. */
  def byteFeatureQuery(spark: SparkSession, dir: String): DataFrame = {
    // input-sorted, feature algebra after: a sort above the hex/regex
    // passes makes the range sampler run them twice (PERF.md r10 note)
    val m = spark.read.parquet(s"$dir/documents.parquet")
      .orderBy("doc_id")
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3).cast("int") + 1).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
    val hx = hex(col("content"))
    val withHex = m
      .withColumn("n_bytes", length(col("content")).cast("long"))
      .withColumn("hx", hx)
      // keep the FIRST hex char of each pair → the string of high nibbles
      .withColumn("nibs", regexp_replace(hx, "(.).", "$1"))
    def byteAt(i: Int) = // header byte i, 0 when the payload is shorter
      when(col("n_bytes") > i,
        conv(substring(col("hx"), 2 * i + 1, 2), 16, 10).cast("int"))
        .otherwise(lit(0))
    def bin(nibble: String) = round(
      (length(col("nibs")) - length(regexp_replace(col("nibs"), nibble, "")))
        .cast("double") / greatest(col("n_bytes"), lit(1L)).cast("double"), 6)
    withHex
      .withColumn("magic",
        when(substring(col("hx"), 1, 8) === "89504E47", "png")
          .when(substring(col("hx"), 1, 4) === "FFD8", "jpeg")
          .when(substring(col("hx"), 1, 4) === "424D", "bmp")
          .when(substring(col("hx"), 1, 8) === "47494638", "gif")
          .when(substring(col("hx"), 1, 8) === "52494646" &&
            substring(col("hx"), 17, 8) === "57415645", "wav")
          .otherwise("opaque"))
      .withColumn("width", lit(64) + byteAt(0) % 64)
      .withColumn("height", lit(64) + byteAt(1) % 64)
      .withColumn("n_frames",
        when(col("kind") === "video", lit(1) + byteAt(2) % 30).otherwise(lit(1)))
      .withColumn("f0", bin("0"))
      .withColumn("f7", bin("7"))
      .withColumn("content_md5", md5(col("content")))
      .select("media_id", "kind", "magic", "n_bytes", "width", "height",
        "n_frames", "f0", "f7", "content_md5")
  }

  /** DuckDB oracle for [[byteFeatureQuery]] — same hex/nibble algebra
    * (DuckDB's `hex` prints uppercase like Spark's; byte values recovered
    * via nibble positions in the hex alphabet since DuckDB has no base
    * conversion on strings). */
  def byteFeatureSql: String = {
    val nv = (k: String) => s"(strpos('0123456789ABCDEF', substr(hx, $k, 1)) - 1)"
    def byteAt(i: Int) =
      s"CASE WHEN n_bytes > $i THEN 16 * ${nv(s"${2 * i + 1}")} + ${nv(s"${2 * i + 2}")} ELSE 0 END"
    def bin(nibble: Char) =
      s"round(CAST(length(nibs) - length(replace(nibs, '$nibble', '')) AS DOUBLE) " +
        s"/ greatest(n_bytes, 1), 6)"
    s"""
WITH m AS (
  SELECT doc_id AS media_id,
    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    text, encode(text) AS content
  FROM documents
), h AS (
  SELECT media_id, kind, text,
    CAST(octet_length(content) AS BIGINT) AS n_bytes,
    hex(content) AS hx
  FROM m
), n AS (
  SELECT *, regexp_replace(hx, '(.).', '\\1', 'g') AS nibs FROM h
)
SELECT media_id, kind,
  CASE WHEN substr(hx, 1, 8) = '89504E47' THEN 'png'
       WHEN substr(hx, 1, 4) = 'FFD8' THEN 'jpeg'
       WHEN substr(hx, 1, 4) = '424D' THEN 'bmp'
       WHEN substr(hx, 1, 8) = '47494638' THEN 'gif'
       WHEN substr(hx, 1, 8) = '52494646' AND substr(hx, 17, 8) = '57415645' THEN 'wav'
       ELSE 'opaque' END AS magic,
  n_bytes,
  64 + ${byteAt(0)} % 64 AS width,
  64 + ${byteAt(1)} % 64 AS height,
  CASE WHEN kind = 'video' THEN 1 + ${byteAt(2)} % 30 ELSE 1 END AS n_frames,
  ${bin('0')} AS f0,
  ${bin('7')} AS f7,
  md5(text) AS content_md5
FROM n
ORDER BY media_id
""".trim
  }

  /** Feature-extraction query over the fake media corpus; deterministic,
    * so usable as a rows-only correctness query and a bench workload. */
  def featureQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // sort the records BEFORE the decode kernel (the sampler note in
    // byteFeatureQuery): the typed mapPartitions preserves order
    decodeFeatures(fromDocuments(spark, dir).orderBy("media_id"))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("n_frames"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
        round(element_at(col("features"), 8).cast("double"), 6).as("f7"))
  }

  // --- Real-codec decode under a total DuckDB oracle -------------------

  /** Source block every constructed payload embeds: the first
    * [[SrcBlock]] UTF-8 bytes of the document text, zero-padded. 64 is a
    * power of two, so every histogram ratio k/64 is an exact binary AND
    * exact 6-decimal fraction — no float-vs-double rounding hazard
    * anywhere in the oracle compare. */
  val SrcBlock = 64

  private[graft] def srcBytes(text: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](SrcBlock)
    System.arraycopy(text, 0, out, 0, math.min(SrcBlock, text.length))
    out
  }

  /** A real uncompressed 24-bit grayscale BMP (8×8) whose pixel values ARE
    * `px` (row-major from the top). Uncompressed is the point: the JDK's
    * raster decode must hand back exactly these bytes, so the decoded
    * luminance histogram is plain byte algebra an independent engine can
    * compute from the source column. Gray pixels make luminance exact:
    * (v·299 + v·587 + v·114)/1000 = v with integer division. */
  private[operators] def buildBmpGray8x8(px: Array[Byte]): Array[Byte] = {
    val w = 8; val h = 8
    val dataSize = w * h * 3 // 3 bytes/px, 24-byte rows need no padding
    val fileSize = 54 + dataSize
    val bb = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
    bb.putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // BMP stores rows bottom-up
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = px(y * w + x)
        bb.put(v).put(v).put(v)
        x += 1
      }
      y -= 1
    }
    bb.array()
  }

  /** A real 8-bit mono PCM WAV whose sample bytes ARE `samples` — the
    * audio analogue of [[buildBmpGray8x8]]: PCM is uncompressed, so the
    * decoded amplitude histogram equals the high-nibble histogram of the
    * source bytes. */
  private[operators] def buildWavPcm8(samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000) // sample rate, byte rate
      .putShort(1).putShort(8) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(n).put(samples)
    bb.array()
  }

  /** The mixed REAL-media fixture derived deterministically from the
    * documents corpus: image rows carry a real BMP, audio rows a real PCM
    * WAV (both embedding the document's [[srcBytes]] block), video rows
    * the bare source block (no JDK video codec exists — the documented
    * fallback leg). Built in a typed map — payload construction is
    * per-row JVM byte assembly, the same shape real media ingestion has. */
  def mediaFixture(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    fromDocuments(spark, dir).mapPartitions(_.map { r =>
      val src = srcBytes(if (r.content == null) Array.empty[Byte] else r.content)
      r.kind match {
        case "image" => MediaRecord(r.media_id, r.kind, buildBmpGray8x8(src))
        case "audio" => MediaRecord(r.media_id, r.kind, buildWavPcm8(src))
        case _ => MediaRecord(r.media_id, r.kind, src)
      }
    })
  }

  /** REAL JDK codec decode (`ImageIO` raster / `AudioSystem` PCM) under a
    * TOTAL DuckDB oracle — the query that closes the multimodal oracle
    * gap. Because the constructed formats are uncompressed, the oracle can
    * predict the decoded output exactly from the source column: if the
    * raster/PCM decode did not hand back precisely the embedded bytes (or
    * the codec fell back to byte features), dims and histogram mismatch.
    * Output: per-media dims/frames + the full 16-bin feature histogram
    * (k/64 exact fractions). JPEG/PNG/GIF — compressed formats whose
    * decode cannot be byte algebra — keep their differential real-decode
    * specs in MediaDecodeSpec. */
  def mediaDecodeQuery(spark: SparkSession, dir: String): DataFrame = {
    // sort before the REAL JDK codec decode (the sampler note in
    // byteFeatureQuery): ImageIO/AudioSystem per row is the expensive pass
    val feats = decodeFeatures(mediaFixture(spark, dir).orderBy("media_id"))
    val bins = (0 until 16).map(i =>
      round(element_at(col("features"), i + 1).cast("double"), 6).as(s"b$i"))
    feats.select(
      (Seq(col("media_id"), col("kind"), col("n_bytes"), col("width"),
        col("height"), col("n_frames")) ++ bins): _*)
  }

  /** ANSI oracle for [[mediaDecodeQuery]]: the padded source block's
    * high-nibble histogram and the per-kind header constants, all exact
    * integer/64 algebra. `phx` = first 128 hex chars of the text bytes,
    * zero-padded — exactly [[srcBytes]] in hex. */
  def mediaDecodeSql: String = {
    val nv = (k: String) => s"(strpos('0123456789ABCDEF', substr(phx, $k, 1)) - 1)"
    def byteAt(i: Int) =
      s"(16 * ${nv(s"${2 * i + 1}")} + ${nv(s"${2 * i + 2}")})"
    val binCols = (0 until 16).map { b =>
      val c = "%X".format(b)
      s"round(CAST(length(nibs) - length(replace(nibs, '$c', '')) AS DOUBLE) / $SrcBlock, 6) AS b$b"
    }.mkString(",\n  ")
    s"""
WITH m AS (
  SELECT doc_id AS media_id,
    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    substr(hex(encode(text)) || repeat('00', $SrcBlock), 1, ${2 * SrcBlock}) AS phx
  FROM documents
), n AS (
  SELECT *, regexp_replace(phx, '(.).', '\\1', 'g') AS nibs FROM m
)
SELECT media_id, kind,
  CAST(CASE kind WHEN 'image' THEN ${54 + 8 * 8 * 3}
                 WHEN 'audio' THEN ${44 + SrcBlock}
                 ELSE $SrcBlock END AS BIGINT) AS n_bytes,
  CAST(CASE kind WHEN 'image' THEN 8 WHEN 'audio' THEN 8000
                 ELSE 64 + ${byteAt(0)} % 64 END AS INTEGER) AS width,
  CAST(CASE kind WHEN 'image' THEN 8 WHEN 'audio' THEN 1
                 ELSE 64 + ${byteAt(1)} % 64 END AS INTEGER) AS height,
  CAST(CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN $SrcBlock
                 ELSE 1 + ${byteAt(2)} % 30 END AS INTEGER) AS n_frames,
  $binCols
FROM n
ORDER BY media_id
""".trim
  }
}
