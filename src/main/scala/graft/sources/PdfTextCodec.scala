package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.{DataFormatException, Inflater}
import scala.collection.mutable.ArrayBuffer
import scala.util.matching.Regex

/** Minimal dependency-free PDF text extractor covering the reference's
  * embedded-text path (ref: robot/pdf_reader.py:23-58 — per-page text,
  * pages joined with `\n` by the caller).
  *
  * Scope (documented, deliberate):
  *   - classic cross-reference PDFs whose objects appear as
  *     `N G obj … endobj` in the byte stream; object streams (`/ObjStm`,
  *     PDF 1.5 compressed xref) are NOT unpacked — their pages simply
  *     don't surface, which degrades to less text, never to a crash;
  *   - content streams stored raw or `/FlateDecode`-compressed
  *     (`java.util.zip.Inflater` — zero new dependencies); other filters
  *     (DCT, LZW, ASCII85) are skipped;
  *   - text-showing operators `Tj`, `'`, `"`, `TJ` with literal
  *     `(…)`-strings (all escape forms incl. octal and line continuations)
  *     and hex `<…>`-strings; UTF-16BE strings detected by BOM, everything
  *     else decoded latin-1-wise (PDFDocEncoding's printable range —
  *     the 0x18–0x1F/0x80–0x9F divergences are accepted as approximation);
  *     font /ToUnicode CMaps are not applied, so text from subset-encoded
  *     fonts may come out garbled (same failure mode as any extractor
  *     without CMap support);
  *   - line structure: `Td`/`TD`/`T*`/`'`/`"`/`BT`/`ET` break lines; every
  *     emitted line ends with `\n` (PyMuPDF `get_text` shape).
  *
  * Totality: parse failures (broken xref, truncated stream, garbage after
  * `%PDF`) yield `None`, never an exception — the engine's degrade-the-row
  * policy (risk register §7.4.4).
  */
object PdfTextCodec {

  private val ObjRe: Regex = """(\d+)\s+\d+\s+obj\b""".r
  private val StreamStartRe: Regex = """stream(\r\n|\n|\r)""".r
  private val PagesRefRe: Regex = """/Pages\s+(\d+)\s+\d+\s+R""".r
  private val ContentsRefRe: Regex = """/Contents\s+(\d+)\s+\d+\s+R""".r
  private val RefRe: Regex = """(\d+)\s+\d+\s+R""".r
  private val TypePageRe: Regex = """/Type\s*/Page(?![a-zA-Z])""".r
  private val TypePagesRe: Regex = """/Type\s*/Pages(?![a-zA-Z])""".r
  private val TypeCatalogRe: Regex = """/Type\s*/Catalog(?![a-zA-Z])""".r

  private case class PdfObj(dict: String, stream: Option[Array[Byte]])

  /** One parsed page: its extracted text plus whether the page DRAWS an
    * image — an image XObject actually invoked by a `Do` operator (resolved
    * through the page's `/Resources /XObject` name map to an object whose
    * dict declares `/Subtype /Image`), or an inline `BI…ID…EI` image. Used
    * by [[graft.sources.DocumentSource]] to classify the reference's
    * `extration_method ∈ {embedded, ocr, mixed}` contract
    * (robot/pdf_reader.py:4-20) from PDF structure alone: no OCR engine
    * ships here, but a scanned page IS detectable — it draws images and
    * shows no text. */
  case class Page(text: String, hasImage: Boolean)

  /** Extract per-page text. `None` when the bytes hold no parseable page
    * structure at all. */
  def extractPages(bytes: Array[Byte]): Option[Seq[String]] =
    extractPagesDetailed(bytes).map(_.map(_.text))

  /** Per-page text + image-drawing flag (see [[Page]]). */
  def extractPagesDetailed(bytes: Array[Byte]): Option[Seq[Page]] =
    try {
      // latin-1 mirror: 1:1 char↔byte, so string offsets ARE byte offsets
      val s = new String(bytes, StandardCharsets.ISO_8859_1)
      val ordered = parseObjects(s, bytes) // file order
      if (ordered.isEmpty) return None
      val objects = ordered.toMap
      val pageOrder = pagesInTreeOrder(objects)
        match {
          case ids if ids.nonEmpty => ids
          case _ => // fallback: page objects in file order
            ordered.collect { case (id, o) if TypePageRe.findFirstIn(o.dict).isDefined => id }
        }
      if (pageOrder.isEmpty) return None
      Some(pageOrder.map { pid =>
        val dict = objects(pid).dict
        val contentIds: Seq[Int] = ContentsRefRe.findFirstMatchIn(dict) match {
          case Some(m) => Seq(m.group(1).toInt)
          case None => // /Contents [a 0 R b 0 R …]
            contentsArray(dict).map(arr => RefRe.findAllMatchIn(arr).map(_.group(1).toInt).toSeq)
              .getOrElse(Seq.empty)
        }
        val content = contentIds.flatMap(id => objects.get(id).flatMap(decodedStream))
          .map(new String(_, StandardCharsets.ISO_8859_1)).mkString("\n")
        val scan = scanContent(content)
        val imageXObjects = imageXObjectNames(dict, objects)
        val drawsImage = scan.hasInlineImage ||
          scan.drawnNames.exists(imageXObjects.contains)
        Page(scan.text, drawsImage)
      })
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Names in the page's `/Resources /XObject` dict that resolve to
    * `/Subtype /Image` objects. `/Resources` may be inline (`<< … >>`) or
    * an indirect reference; when the page carries none, it is INHERITED
    * from the nearest ancestor `/Pages` node via the `/Parent` chain
    * (PDF 32000-1 §7.7.3.4 — /Resources is an inheritable attribute;
    * round 13, closing the stated degrades-toward-`embedded` gap).
    * Cycle-guarded and total: a broken chain yields no resources, so the
    * page under-reports to `hasImage = false`, never crashes. */
  private def imageXObjectNames(pageDict: String, objects: Map[Int, PdfObj]): Set[String] = {
    val resources = inheritedResources(pageDict, objects)
    val xobj = resources.flatMap(r => dictValue(r, "/XObject", objects))
    xobj match {
      case None => Set.empty
      case Some(x) =>
        NameRefRe.findAllMatchIn(x).collect {
          case m if objects.get(m.group(2).toInt)
            .exists(o => SubtypeImageRe.findFirstIn(o.dict).isDefined) => m.group(1)
        }.toSet
    }
  }

  /** `/Resources` of a page, walking the `/Parent` chain (nearest ancestor
    * wins, per the PDF inheritable-attributes rule). `seen` guards against
    * a malformed circular parent chain. */
  @scala.annotation.tailrec
  private def inheritedResources(dict: String, objects: Map[Int, PdfObj],
                                 seen: Set[Int] = Set.empty): Option[String] =
    dictValue(dict, "/Resources", objects) match {
      case found @ Some(_) => found
      case None =>
        ParentRefRe.findFirstMatchIn(dict).map(_.group(1).toInt) match {
          case Some(pid) if !seen(pid) && objects.contains(pid) =>
            inheritedResources(objects(pid).dict, objects, seen + pid)
          case _ => None
        }
    }

  private val ParentRefRe: Regex = """/Parent\s+(\d+)\s+\d+\s+R""".r

  /** Value of `key` in `dict`: a balanced inline `<< … >>` sub-dict, or an
    * indirect reference resolved through `objects`. */
  private def dictValue(dict: String, key: String, objects: Map[Int, PdfObj]): Option[String] = {
    val k = dict.indexOf(key)
    if (k < 0) return None
    var i = k + key.length
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    if (dict.startsWith("<<", i)) {
      // balanced << >> scan
      var depth = 0
      val start = i
      while (i < dict.length) {
        if (dict.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (dict.startsWith(">>", i)) {
          depth -= 1; i += 2
          if (depth == 0) return Some(dict.substring(start, i))
        } else i += 1
      }
      None
    } else
      RefRe.findPrefixMatchOf(dict.substring(i))
        .flatMap(m => objects.get(m.group(1).toInt)).map(_.dict)
  }

  private val NameRefRe: Regex = """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r
  private val SubtypeImageRe: Regex = """/Subtype\s*/Image(?![a-zA-Z])""".r

  // --- file structure ----------------------------------------------------

  /** Object headers are scanned with a cursor that SKIPS each stream's
    * payload bytes (resuming after `endstream`): compressed data that
    * happens to spell `N G obj` would otherwise create a phantom object,
    * and the last-wins `.toMap` could let a phantom id silently shadow a
    * real page/content object and drop its text. (An `endstream` spelled
    * inside a payload still truncates that one stream — accepted, it
    * degrades that object only.) */
  private def parseObjects(s: String, bytes: Array[Byte]): Seq[(Int, PdfObj)] = {
    val out = Seq.newBuilder[(Int, PdfObj)]
    val m = ObjRe.pattern.matcher(s)
    var from = 0
    while (from < s.length && m.find(from)) {
      val id = m.group(1).toInt
      val endobj = s.indexOf("endobj", m.end)
      val bodyEnd = if (endobj >= 0) endobj else s.length
      val body = s.substring(m.end, bodyEnd)
      StreamStartRe.findFirstMatchIn(body) match {
        case Some(sm) =>
          val dataStart = m.end + sm.end
          val endstream = s.indexOf("endstream", dataStart)
          if (endstream >= 0) {
            var dataEnd = endstream
            // strip the EOL that precedes the endstream keyword
            if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n') dataEnd -= 1
            if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r') dataEnd -= 1
            out += id ->
              PdfObj(body.substring(0, sm.start), Some(java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)))
            from = endstream + "endstream".length
          } else {
            out += id -> PdfObj(body.substring(0, sm.start), None)
            from = bodyEnd
          }
        case None =>
          out += id -> PdfObj(body, None)
          from = if (endobj >= 0) endobj + "endobj".length else s.length
      }
    }
    out.result()
  }

  /** Page ids in catalog → /Pages → /Kids order (the rendering order);
    * empty when no walkable tree exists. */
  private def pagesInTreeOrder(objects: Map[Int, PdfObj]): Seq[Int] = {
    val rootId = objects.collectFirst {
      case (_, o) if TypeCatalogRe.findFirstIn(o.dict).isDefined =>
        PagesRefRe.findFirstMatchIn(o.dict).map(_.group(1).toInt)
    }.flatten
    val acc = ArrayBuffer.empty[Int]
    val seen = scala.collection.mutable.Set.empty[Int]
    def walk(id: Int): Unit = objects.get(id).foreach { o =>
      if (seen.add(id)) {
        if (TypePagesRe.findFirstIn(o.dict).isDefined || TypeCatalogRe.findFirstIn(o.dict).isDefined) {
          kidsArray(o.dict).foreach { arr =>
            RefRe.findAllMatchIn(arr).foreach(m => walk(m.group(1).toInt))
          }
        } else if (TypePageRe.findFirstIn(o.dict).isDefined) acc += id
      }
    }
    rootId.foreach(walk)
    acc.toSeq
  }

  private def kidsArray(dict: String): Option[String] = bracketArray(dict, "/Kids")
  private def contentsArray(dict: String): Option[String] = bracketArray(dict, "/Contents")

  private def bracketArray(dict: String, key: String): Option[String] = {
    val k = dict.indexOf(key)
    if (k < 0) return None
    val open = dict.indexOf('[', k + key.length)
    if (open < 0) return None
    val close = dict.indexOf(']', open)
    if (close < 0) return None
    Some(dict.substring(open + 1, close))
  }

  /** Stream payload with /FlateDecode applied when declared; `None` for
    * undecodable filters or corrupt deflate data. */
  private def decodedStream(o: PdfObj): Option[Array[Byte]] = o.stream.flatMap { data =>
    if (o.dict.contains("/FlateDecode")) inflate(data)
    else if (o.dict.contains("/Filter")) None // unsupported filter
    else Some(data)
  }

  /** Decompression-bomb guard (same class of attack MediaDecoder's
    * MaxRasterPixels blocks): a few MB of deflate can legally expand
    * ~1000×, and an unbounded ByteArrayOutputStream would OOM the executor
    * — an error the NonFatal catch in extractPages does NOT absorb,
    * violating the codec's totality policy. Inflation stops at
    * max(64 MB, 100× input) and keeps the prefix (degrade to less text,
    * never crash). */
  private val MaxInflateFactor = 100L
  private val MinInflateCap = 64L * 1024 * 1024

  private[graft] def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val cap = math.max(MinInflateCap, data.length.toLong * MaxInflateFactor)
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      var done = false
      while (!done) {
        val n = inf.inflate(buf)
        if (n > 0) {
          out.write(buf, 0, n)
          if (out.size().toLong >= cap) done = true // bomb: keep the prefix
        } else done = true // finished, or truncated input: keep what we have
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: DataFormatException => None }

  // --- content-stream text extraction ------------------------------------

  private def isDelimiter(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** One content-stream walk's yield: the page text, the XObject names the
    * stream invoked with `Do`, and whether an inline `BI…ID…EI` image
    * appeared. */
  private[sources] case class ContentScan(
      text: String, drawnNames: Set[String], hasInlineImage: Boolean)

  /** Walk one page's (possibly concatenated) content stream and emit its
    * text lines, each terminated with `\n`. */
  private[sources] def pageText(content: String): String = scanContent(content).text

  /** Single-pass tokenizer behind [[pageText]]: text operators accumulate
    * lines; `/Name … Do` records a drawn XObject; `BI … ID <binary> EI`
    * skips the inline image's raw payload (which could otherwise spell
    * `(`/`<` bytes and corrupt the string parse) and flags it. */
  private[sources] def scanContent(content: String): ContentScan = {
    val lines = new StringBuilder
    val line = new StringBuilder
    val pending = ArrayBuffer.empty[String]
    val drawn = scala.collection.mutable.Set.empty[String]
    var lastName: String = null
    var inlineImage = false
    def flushLine(): Unit =
      if (line.nonEmpty) { lines.append(line).append('\n'); line.clear() }
    def show(): Unit = { pending.foreach(line ++= _); pending.clear() }
    var i = 0
    val n = content.length
    while (i < n) {
      val c = content.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { val (str, ni) = parseLiteral(content, i); pending += str; i = ni }
      else if (c == '<' && i + 1 < n && content.charAt(i + 1) == '<') i += 2
      else if (c == '<') { val (str, ni) = parseHex(content, i); pending += str; i = ni }
      else if (c == '>' && i + 1 < n && content.charAt(i + 1) == '>') i += 2
      else if (c == '%') { while (i < n && content.charAt(i) != '\n' && content.charAt(i) != '\r') i += 1 }
      else if (c == '[' || c == ']' || c == '{' || c == '}' || c == '>' || c == ')') i += 1
      else if (c == '/') {
        val start = i + 1
        i += 1
        while (i < n && !content.charAt(i).isWhitespace && !isDelimiter(content.charAt(i))) i += 1
        lastName = content.substring(start, i)
      }
      else {
        val start = i
        while (i < n && !content.charAt(i).isWhitespace && !isDelimiter(content.charAt(i))) i += 1
        if (i == start) i += 1 // lone delimiter byte in malformed content: skip, never stall
        content.substring(start, i) match {
          case "Tj" | "TJ"  => show()
          case "'" | "\""   => flushLine(); show()
          case "Td" | "TD" | "T*" => flushLine()
          case "BT" | "ET"  => flushLine(); pending.clear()
          case "Do" => if (lastName != null) drawn += lastName
          case "BI" =>
            inlineImage = true
            // Skip past the image payload: the spec's end marker is `EI`
            // delimited by whitespace, so accept a candidate only when it
            // is BOTH whitespace-preceded AND whitespace/EOS-followed —
            // a bare 0x20'E''I' inside binary data still false-ends the
            // skip (probability ~2^-25 per byte with this check vs 2^-17
            // with the preceded-only form). Documented residual of a
            // codec that does not decode /W /H /BPC to compute the true
            // payload length: an early end leaks trailing image bytes
            // into the tokenizer, degrading to garbage TEXT (and an
            // ocr→mixed classification), never a crash.
            val id = content.indexOf("ID", i)
            val from = if (id >= 0) id + 2 else i
            def scan(ok: Int => Boolean): Int = {
              var e = content.indexOf("EI", from)
              while (e >= 0 && !ok(e)) e = content.indexOf("EI", e + 1)
              e
            }
            def wsBefore(e: Int) = e > 0 && content.charAt(e - 1).isWhitespace
            def wsAfter(e: Int) = e + 2 >= n || content.charAt(e + 2).isWhitespace
            // preference ladder: both-sides-whitespace (the spec's
            // delimited form — immune to bare 'EI' bytes in the payload),
            // else either-side (real writers legally abut binary data
            // against EI, so `<binary>EI\n` must still end the image —
            // dropping the rest of the page here was a review-r12
            // regression), else the payload runs to end-of-stream
            val strict = scan(e => wsBefore(e) && wsAfter(e))
            val e = if (strict >= 0) strict
              else scan(e => wsBefore(e) || wsAfter(e))
            i = if (e >= 0) e + 2 else n
          case _ => // operand (number) or unrelated operator: leave pending
        }
      }
    }
    flushLine()
    ContentScan(lines.toString, drawn.toSet, inlineImage)
  }

  /** `(…)` literal string: nesting, all escapes, octal, line continuation.
    * Returns (decoded string, index after the closing paren). */
  private def parseLiteral(s: String, start: Int): (String, Int) = {
    val raw = new java.io.ByteArrayOutputStream()
    var depth = 1
    var i = start + 1
    val n = s.length
    while (i < n && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < n =>
          s.charAt(i + 1) match {
            case 'n'  => raw.write('\n'); i += 2
            case 'r'  => raw.write('\r'); i += 2
            case 't'  => raw.write('\t'); i += 2
            case 'b'  => raw.write('\b'); i += 2
            case 'f'  => raw.write('\f'); i += 2
            case '('  => raw.write('('); i += 2
            case ')'  => raw.write(')'); i += 2
            case '\\' => raw.write('\\'); i += 2
            case '\r' => i += (if (i + 2 < n && s.charAt(i + 2) == '\n') 3 else 2)
            case '\n' => i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; i += 1
              while (k < 3 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
              }
              raw.write(v & 0xFF)
            case other => raw.write(other & 0xFF); i += 2
          }
        case '(' => depth += 1; raw.write('('); i += 1
        case ')' => depth -= 1; if (depth > 0) raw.write(')'); i += 1
        case c   => raw.write(c & 0xFF); i += 1
      }
    }
    (decodeString(raw.toByteArray), i)
  }

  /** `<…>` hex string (whitespace ignored, odd nibble count padded with 0). */
  private def parseHex(s: String, start: Int): (String, Int) = {
    val hex = new StringBuilder
    var i = start + 1
    val n = s.length
    while (i < n && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) hex.append(c)
      i += 1
    }
    if (i < n) i += 1 // skip '>'
    if (hex.length % 2 == 1) hex.append('0')
    val bytes = new Array[Byte](hex.length / 2)
    var j = 0
    while (j < bytes.length) {
      bytes(j) = Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16).toByte
      j += 1
    }
    (decodeString(bytes), i)
  }

  /** UTF-16BE when BOM-prefixed (BOM stripped), latin-1 otherwise. */
  private def decodeString(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte)
      new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE)
    else new String(bytes, StandardCharsets.ISO_8859_1)
}
