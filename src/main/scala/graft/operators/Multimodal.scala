package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata, and the decode / feature-extract /
  * resize / frame-sample steps run as typed `mapPartitions` over batches.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): [[DeterministicDecoder]] produces a deterministic fake —
  * byte-histogram "features" and header-derived "dimensions" — while the
  * Spark-side plumbing (schema, binary handling, partitioning, batch
  * iteration shape) is real and tested. Swapping in a real codec means
  * replacing ONE function body.
  *
  * Scale notes: media blobs dominate row size, so the partition layout is
  * driven by `spark.sql.files.maxPartitionBytes`, not row count; decode is
  * CPU-bound per partition with zero shuffle; features are small and
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

  /** Deterministic stand-in for the real codec: dimensions from header
    * bytes, 16-bin byte histogram (L1-normalized) as the feature vector.
    * Replace this body with PDFBox/ImageIO/ffmpeg bindings in a real
    * deployment — the call-site plumbing does not change. */
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
    media.mapPartitions { it => it.map(DeterministicDecoder.decode) }
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

  /** Feature-extraction query over the fake media corpus; deterministic,
    * so usable as a rows-only correctness query and a bench workload. */
  def featureQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(fromDocuments(spark, dir))
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("width"), col("height"), col("n_frames"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
        round(element_at(col("features"), 8).cast("double"), 6).as("f7"))
      .orderBy("media_id")
  }
}
