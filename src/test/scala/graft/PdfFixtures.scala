package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Hand-built REAL tiny PDFs (valid classic-xref structure) for the S1/S2
  * golden extraction specs. Byte-exact and deterministic. */
object PdfFixtures {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Two-page PDF exercising the codec surface:
    * page 1 (raw stream): literal strings with octal escapes (Ç=\307,
    * ã=\343), a TJ array with kerning numbers, an ASCII hex string;
    * page 2 (FlateDecode): octal accents + a UTF-16BE (BOM) hex string. */
  val twoPage: Array[Byte] = {
    val content1 =
      """BT
/F1 12 Tf
72 720 Td
(NOTA FISCAL DE SERVI\307OS) Tj
0 -14 Td
[(Data de Emiss) -250 (\343o: 15/12/2024)] TJ
0 -14 Td
<48656C6C6F> Tj
ET""".getBytes(StandardCharsets.ISO_8859_1)
    val content2Raw =
      """BT
72 720 Td
(Pagina 2 com acentua\347\343o) Tj
0 -14 Td
<FEFF20AC0041> Tj
ET""".getBytes(StandardCharsets.ISO_8859_1)
    val content2 = deflate(content2Raw)

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offsets += out.size()
      w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) { w("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>\n") }
    obj(3) { w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\n") }
    obj(4) {
      w(s"<< /Length ${content1.length} >>\nstream\n")
      out.write(content1); w("\nendstream\n")
    }
    obj(5) { w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 6 0 R >>\n") }
    obj(6) {
      w(s"<< /Length ${content2.length} /Filter /FlateDecode >>\nstream\n")
      out.write(content2); w("\nendstream\n")
    }
    val xrefAt = out.size()
    w("xref\n0 7\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** A valid single-page PDF whose extracted text is `lines` (one Tj per
    * line — the codec emits each as its own text line). Non-ASCII latin-1
    * chars are octal-escaped into the literal string, so any ISO-8859-1
    * payload (e.g. the golden invoice with `Ç`) round-trips exactly. */
  def singlePage(lines: Seq[String]): Array[Byte] = {
    def esc(s: String): String = s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c >= 32 && c < 127 => c.toString
      case c if c.toInt <= 255 => f"\\${c.toInt}%03o"
      case c => throw new IllegalArgumentException(s"not latin-1: $c")
    }
    val content = ("BT\n/F1 12 Tf\n72 720 Td\n" +
      lines.map(l => s"(${esc(l)}) Tj").mkString("\n0 -14 Td\n") +
      "\nET").getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offsets += out.size()
      w(s"$n 0 obj\n"); body; w("endobj\n")
    }
    w("%PDF-1.4\n")
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>\n") }
    obj(2) { w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>\n") }
    obj(3) { w("<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>\n") }
    obj(4) {
      w(s"<< /Length ${content.length} >>\nstream\n")
      out.write(content); w("\nendstream\n")
    }
    val xrefAt = out.size()
    w("xref\n0 5\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** The text [[twoPage]] must extract to (reference join semantics:
    * pages joined with \n; every emitted line ends with \n). */
  val twoPageText: String =
    "NOTA FISCAL DE SERVIÇOS\n" +
      "Data de Emissão: 15/12/2024\n" +
      "Hello\n" +
      "\n" +
      "Pagina 2 com acentuação\n" +
      "€A\n"
}
