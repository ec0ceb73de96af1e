package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{DocumentSource, PdfTextCodec}

/** extration_method classification (ref robot/pdf_reader.py:17 declares
  * Literal["embedded", "ocr", "mixed"]; fitz always reports "embedded" —
  * the declared-but-never-produced legs). This engine classifies from PDF
  * structure: image-drawing pages with no text anywhere ⇒ "ocr"
  * (scanned doc; no OCR engine ships, so text stays empty — the documented
  * boundary), images alongside embedded text ⇒ "mixed". */
class PdfMethodSpec extends AnyFunSuite {

  private def method(bytes: Array[Byte]): String =
    DocumentSource.PdfTextExtractor.extract("t.pdf", bytes).extration_method

  test("text-only PDF classifies as embedded") {
    assert(method(PdfFixtures.twoPage) == "embedded")
    assert(method(PdfFixtures.singlePage(Seq("linha unica"))) == "embedded")
  }

  test("image-only (scanned) PDF classifies as ocr, with empty text and real page count") {
    val doc = DocumentSource.PdfTextExtractor.extract("scan.pdf", PdfFixtures.scanned(pages = 3))
    assert(doc.extration_method == "ocr")
    assert(doc.page_count == 3)
    assert(doc.text.trim.isEmpty) // no OCR engine: classification is honest, text is empty
  }

  test("inline BI…ID…EI image also classifies as ocr and its binary payload never leaks into text") {
    val doc = DocumentSource.PdfTextExtractor.extract("scan.pdf",
      PdfFixtures.scanned(pages = 1, inlineImage = true))
    assert(doc.extration_method == "ocr")
    // payload deliberately contains '(' and '<' bytes; a tokenizer that
    // walked into it would fabricate string text
    assert(doc.text.trim.isEmpty)
  }

  test("text page + image page classifies as mixed, keeping the embedded text") {
    val doc = DocumentSource.PdfTextExtractor.extract("mix.pdf", PdfFixtures.mixed)
    assert(doc.extration_method == "mixed")
    assert(doc.page_count == 2)
    assert(doc.text.contains("Laudo com anexo digitalizado"))
  }

  test("codec per-page image flags are positional") {
    val pages = PdfTextCodec.extractPagesDetailed(PdfFixtures.mixed).get
    assert(pages.map(_.hasImage) == Seq(false, true))
    assert(pages.head.text.nonEmpty && pages(1).text.trim.isEmpty)
  }

  test("an image XObject merely present in resources but never drawn does not flag the page") {
    // a REAL fixture for the case (review r12 — the first version only
    // re-asserted the scanned/text-only fixtures): a text page whose
    // /Resources carry /Im1 → /Subtype /Image but whose content stream
    // has no Do — classification keys on DRAWN images, not dictionary
    // clutter, so the page stays imageless and the doc embedded
    val pages = PdfTextCodec.extractPagesDetailed(PdfFixtures.textWithUndrawnImage).get
    assert(pages.map(_.hasImage) == Seq(false))
    assert(pages.head.text.contains("Texto sem figura"))
    assert(method(PdfFixtures.textWithUndrawnImage) == "embedded")
    // and the same resource DRAWN flips it (the scanned fixture)
    val scan = PdfTextCodec.extractPagesDetailed(PdfFixtures.scanned(pages = 1)).get
    assert(scan.map(_.hasImage) == Seq(true))
  }

  test("image resources inherited from the parent /Pages node classify ocr (round 13)") {
    // pre-r13 the classifier read page-local /Resources only, and this
    // shape — the PDF inheritable-attributes form — degraded to embedded
    val doc = DocumentSource.PdfTextExtractor.extract("scan.pdf", PdfFixtures.scannedInherited)
    assert(doc.extration_method == "ocr")
    assert(doc.text.trim.isEmpty)
  }

  test("inheritance walk crosses a two-level /Pages chain and classifies mixed") {
    val pages = PdfTextCodec.extractPagesDetailed(PdfFixtures.mixedInherited).get
    // the text page inherits the SAME resources but draws nothing: the
    // drawn-images rule must keep it imageless even under inheritance
    assert(pages.map(_.hasImage) == Seq(false, true))
    val doc = DocumentSource.PdfTextExtractor.extract("mix.pdf", PdfFixtures.mixedInherited)
    assert(doc.extration_method == "mixed")
    assert(doc.text.contains("Relatorio com pagina digitalizada"))
  }

  test("plain-text (non-PDF) payloads keep reporting embedded") {
    assert(DocumentSource.PdfTextExtractor
      .extract("a.txt", "hello world".getBytes).extration_method == "embedded")
  }
}
