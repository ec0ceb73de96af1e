package graft

import graft.sources.{DocumentSource, PdfTextCodec}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Golden spec for the real minimal PDF extractor (S1/S2): a hand-built
  * two-page PDF (raw + FlateDecode streams, octal/hex/UTF-16BE strings)
  * must produce its exact text through both the codec and the Spark
  * sources. */
class PdfTextCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("codec extracts both pages byte-exactly (escapes, TJ, hex, flate, utf-16)") {
    val pages = PdfTextCodec.extractPages(PdfFixtures.twoPage)
    assert(pages.isDefined && pages.get.length == 2)
    assert(pages.get.mkString("\n") == PdfFixtures.twoPageText)
  }

  test("S1 directory scan extracts the real PDF with honest metadata") {
    val dir = Files.createTempDirectory("graft-pdf").toString
    Files.write(Paths.get(dir, "golden.pdf"), PdfFixtures.twoPage)
    val d = DocumentSource.readDirectory(spark, dir).collect().head
    assert(d.text == PdfFixtures.twoPageText)
    assert(d.page_count == 2)
    assert(d.encoding == "utf-8") // extracted text round-trips to UTF-8
    assert(!d.has_unicode_issues)
    assert(d.extration_method == "embedded")
    // reference semantics: size_bytes = UTF-8 length of the extracted text
    assert(d.size_bytes ==
      PdfFixtures.twoPageText.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    assert(d.file_size_kb == PdfFixtures.twoPage.length / 1024.0)
  }

  test("S2 bytes column extracts the same text as S1") {
    import spark.implicits._
    val df = Seq(("up.pdf", PdfFixtures.twoPage)).toDF("path", "content")
    val d = DocumentSource.fromBytes(df, "path", "content").collect().head
    assert(d.text == PdfFixtures.twoPageText && d.page_count == 2)
  }

  test("unicode-issue flag fires on NBSP/zero-width chars in extracted text") {
    // \240 is NBSP in the page's latin-1 string space; patch the raw
    // (uncompressed) page-1 literal
    val pdf = new String(PdfFixtures.twoPage, java.nio.charset.StandardCharsets.ISO_8859_1)
      .replace("(NOTA", "(\\240NOTA")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    import spark.implicits._
    val d = DocumentSource.fromBytes(
      Seq(("u.pdf", pdf)).toDF("path", "content"), "path", "content").collect().head
    assert(d.has_unicode_issues)
  }

  test("garbage after %PDF magic degrades to an empty zero-page row, never throws") {
    val junk = ("%PDF-1.4 fake" + "x" * 100).getBytes
    val d = DocumentSource.PdfTextExtractor.extract("junk.pdf", junk)
    assert(d.text == "" && d.page_count == 0 && d.encoding == "unknown" && d.size_bytes == 0L)
    // truncated real PDF: structure cut mid-stream still yields pages
    val cut = java.util.Arrays.copyOfRange(PdfFixtures.twoPage, 0, PdfFixtures.twoPage.length / 2)
    DocumentSource.PdfTextExtractor.extract("cut.pdf", cut) // must not throw
  }

  test("fuzz: extractPages is total on arbitrary and mutated-PDF bytes") {
    val rnd = new scala.util.Random(42)
    // arbitrary byte soup (with and without the %PDF magic)
    for (i <- 0 until 200) {
      val n = rnd.nextInt(400)
      val b = new Array[Byte](n)
      rnd.nextBytes(b)
      PdfTextCodec.extractPages(b) // must not throw
      val magic = ("%PDF-1.4\n".getBytes("ISO-8859-1") ++ b)
      PdfTextCodec.extractPages(magic)
      DocumentSource.PdfTextExtractor.extract(s"fuzz$i", magic)
    }
    // single-byte mutations of a REAL pdf: structure half-broken in every way
    val base = PdfFixtures.twoPage
    for (_ <- 0 until 300) {
      val b = base.clone()
      b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      PdfTextCodec.extractPages(b) // must not throw
    }
    // random truncations
    for (_ <- 0 until 100) {
      PdfTextCodec.extractPages(java.util.Arrays.copyOfRange(base, 0, rnd.nextInt(base.length)))
    }
  }

  test("pages without a walkable catalog fall back to file order") {
    // strip the catalog object — the codec must still find /Type /Page objs
    val s = new String(PdfFixtures.twoPage, java.nio.charset.StandardCharsets.ISO_8859_1)
    val noCatalog = s.replace("/Type /Catalog", "/Type /NotARoot")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val pages = PdfTextCodec.extractPages(noCatalog)
    assert(pages.isDefined && pages.get.length == 2)
    assert(pages.get.mkString("\n") == PdfFixtures.twoPageText)
  }

  test("FlateDecode decompression bomb is capped, returns a prefix, never OOMs") {
    // ~1 MB of zeros deflates to ~1 KB; cap = max(64 MB, 100×input) so a
    // payload that would expand past the cap keeps only the prefix. Use a
    // large highly-compressible plain deflate stream: 256 MB of zeros
    // compresses to ~256 KB, cap = 64 MB → prefix returned, no throw.
    val d = new java.util.zip.Deflater()
    val out = new java.io.ByteArrayOutputStream()
    val zeros = new Array[Byte](1 << 20)
    for (_ <- 0 until 256) { d.setInput(zeros); out.write(deflateChunk(d, false)) }
    d.finish(); out.write(deflateChunk(d, true)); d.end()
    val bomb = out.toByteArray
    assert(bomb.length < 2 * 1024 * 1024, "fixture sanity: bomb input should be small")
    val inflated = PdfTextCodec.inflate(bomb)
    assert(inflated.isDefined)
    assert(inflated.get.length <= math.max(64L * 1024 * 1024, bomb.length.toLong * 100))
  }

  private def deflateChunk(d: java.util.zip.Deflater, finish: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = d.deflate(buf)
    while (n > 0) { out.write(buf, 0, n); n = d.deflate(buf) }
    out.toByteArray
  }

  test("phantom 'N 0 obj' bytes inside a stream payload cannot shadow a real object") {
    // build a one-page PDF whose CONTENT STREAM PAYLOAD spells '3 0 obj'
    // (the id of the real page object). Before the cursor fix the payload
    // was scanned for object headers and the phantom, being later in file
    // order, last-wins-shadowed the page object — silently dropping the
    // page. Now stream extents are skipped, so the text survives.
    val content = ("BT\n72 720 Td\n(Real page text) Tj\nET\n" +
      "3 0 obj << /Type /Page /Contents 99 0 R >> endobj\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    w("trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    val pages = PdfTextCodec.extractPages(out.toByteArray)
    assert(pages.isDefined && pages.get.length == 1)
    assert(pages.get.head.startsWith("Real page text\n"))
  }
}
