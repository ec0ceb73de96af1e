package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Document ingestion (SURVEY §2.1 S1/S2): binary files → extracted text +
  * read metadata, mirroring the reference's PDF reader contract
  * (robot/pdf_reader.py:4-94 — text, page_count, unicode-issue flag,
  * encoding ∈ {utf-8, latin-1, unknown}, extraction method, sizes).
  *
  * PDF text extraction is REAL (no PDF library ships in this container, so
  * [[PdfTextCodec]] implements a minimal extractor from the PDF spec:
  * classic-xref object scan, page-tree walk, FlateDecode via
  * `java.util.zip`, BT/Tj/TJ/quote text operators — see its scaladoc for
  * the documented scope limits). Plain-text payloads go through real
  * encoding detection (UTF-8 strict parse → latin-1 fallback, the
  * reference's policy).
  *
  * Scale notes: `binaryFile` partitions by `spark.sql.files.maxPartitionBytes`
  * so huge corpora split by bytes, not file count; decode is per-partition
  * CPU work with no shuffle; pushdown: `pathGlobFilter`/`modifiedAfter`
  * prune at the listing level.
  */
object DocumentSource {

  /** Mirror of the reference's PDFExtractionResult (robot/pdf_reader.py:4-20)
    * — field names preserved, including the `extration_method` typo, which
    * is part of the reference's published schema. */
  case class ExtractedDoc(
      path: String,
      text: String,
      page_count: Int,
      has_unicode_issues: Boolean,
      encoding: String,
      extration_method: String,
      size_bytes: Long,
      file_size_kb: Double)

  /** PDF + plain-text decode front-end. PDF payloads go through the real
    * minimal extractor ([[PdfTextCodec]] — classic-xref structure,
    * FlateDecode, BT/Tj text operators); plain-text payloads go through
    * encoding detection. */
  object PdfTextExtractor {
    private val PdfMagic = Array[Byte]('%', 'P', 'D', 'F')

    /** The reference's unicode-issue probe set (robot/pdf_reader.py:36-39):
      * NBSP, zero-width space/non-joiner/joiner. */
    private val IssueChars = Set(' ', '​', '‌', '‍')

    def isPdf(bytes: Array[Byte]): Boolean =
      bytes.length >= 4 && bytes.take(4).sameElements(PdfMagic)

    /** UTF-8 strict decode, latin-1 fallback (ref: pdf_reader.py encoding
      * detection policy). */
    def decodeText(bytes: Array[Byte]): (String, String) = {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      try {
        (dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString, "utf-8")
      } catch {
        case _: java.nio.charset.CharacterCodingException =>
          (new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1), "latin-1")
      }
    }

    def extract(path: String, bytes: Array[Byte]): ExtractedDoc = {
      val b = if (bytes == null) Array.empty[Byte] else bytes
      if (isPdf(b)) {
        PdfTextCodec.extractPagesDetailed(b) match {
          case Some(pages) =>
            // reference semantics (pdf_reader.py:29-55): pages joined with
            // \n; size_bytes = UTF-8 length of the EXTRACTED TEXT (not the
            // file); encoding utf-8 unless the text can't round-trip
            val text = pages.map(_.text).mkString("\n")
            // extration_method ∈ {embedded, ocr, mixed} (pdf_reader.py:17):
            // classified from PDF structure — a page that draws images
            // (Do-invoked /Subtype /Image XObjects or inline BI…EI) and
            // shows no text anywhere in the doc is a scan ⇒ "ocr"; image
            // pages alongside embedded text ⇒ "mixed"; text only ⇒
            // "embedded". No OCR engine ships in this sandbox, so an
            // "ocr"-classified doc carries empty text — the honest
            // declaration (the previous behavior reported a scanned PDF as
            // "embedded" with empty text, indistinguishable from a blank
            // text document).
            val anyText = pages.exists(_.text.trim.nonEmpty)
            val anyImage = pages.exists(_.hasImage)
            val method =
              if (!anyImage) "embedded"
              else if (!anyText) "ocr"
              else "mixed"
            ExtractedDoc(path,
              text = text,
              page_count = pages.length,
              has_unicode_issues = text.exists(IssueChars),
              encoding =
                if (java.nio.charset.StandardCharsets.UTF_8.newEncoder()
                  .canEncode(text)) "utf-8" else "unknown",
              extration_method = method,
              size_bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong,
              file_size_kb = b.length / 1024.0)
          case None =>
            // structurally unparseable PDF: the reference raises here; this
            // engine degrades the row instead (totality policy) — zero
            // pages, empty text, honest "unknown" encoding
            ExtractedDoc(path, text = "", page_count = 0,
              has_unicode_issues = false, encoding = "unknown",
              extration_method = "embedded", size_bytes = 0L,
              file_size_kb = b.length / 1024.0)
        }
      } else {
        val (text, enc) = decodeText(b)
        ExtractedDoc(path,
          text = text,
          page_count = 1 + text.count(_ == '\f'),
          has_unicode_issues = text.exists(IssueChars),
          encoding = enc,
          extration_method = "embedded",
          size_bytes = b.length.toLong,
          file_size_kb = b.length / 1024.0)
      }
    }
  }

  /** S1: directory scan via Spark's binaryFile source → typed decode
    * (delegates to [[fromBytes]] so the decode plumbing exists once). */
  def readDirectory(spark: SparkSession, dir: String, glob: String = "*"): Dataset[ExtractedDoc] =
    fromBytes(
      spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir),
      "path", "content")

  /** S2: in-memory bytes column → typed decode (the upload path). */
  def fromBytes(df: DataFrame, pathCol: String, bytesCol: String): Dataset[ExtractedDoc] = {
    import df.sparkSession.implicits._
    df.select(col(pathCol), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (p, bytes) => PdfTextExtractor.extract(p, bytes) })
  }

  /** S3-equivalent ingestion gate (ref: api/dependencies.py:12-49): size
    * cap + magic-number check as a filter column, for use before decode. */
  def uploadGate(maxBytes: Long = 10L * 1024 * 1024): org.apache.spark.sql.Column =
    length(col("content")) <= maxBytes &&
      substring(col("content"), 1, 4) === lit("%PDF".getBytes)
}
