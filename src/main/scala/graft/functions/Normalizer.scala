package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Line-oriented text normalization pipeline
  * (ref: robot/core/text_normalizer.py:63-92).
  *
  * Stage order matters and is preserved exactly: char replacements →
  * whitespace collapse → number-join → date-spacing fix → comma/dot fix →
  * line split → noise filter → order-preserving line dedup → rejoin
  * (ref: text_normalizer.py:69-92; the number-join can glue date+time which
  * fix_date_spacing then re-splits — text_normalizer.py:52-55).
  *
  * Three implementations with identical semantics (cross-checked in
  * NormalizerSpec / FuzzSpec / NormalizerFastSpec):
  *   - [[normalizeText]]: the HOT kernel — fused hand-written scans, no
  *     regex engine. Behind every normalize UDF and (via
  *     [[graft.plans.NormalizeTextExpr]]) behind [[normalizeTextCol]].
  *   - [[normalizeTextReference]]: the stage-by-stage regex chain — the
  *     executable specification the kernel is differential-tested against.
  *   - [[normalizeTextColAlgebra]]: pure Column algebra (`regexp_replace` +
  *     higher-order array functions) — the independent Column-side
  *     specification; codegen'd but one regex NFA pass per node.
  */
object Normalizer {

  /** 27 UF siglas + doc-type siglas whitelist for the line-noise filter
    * (ref: robot/core/text_normalizer.py:32-37). */
  val SiglasValidas: Set[String] = Set(
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA",
    "MT", "MS", "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN",
    "RS", "RO", "RR", "SC", "SP", "SE", "TO",
    "NF", "RG", "IE", "IM", "CPF")

  /** Pure-Scala normalization, byte-equivalent to the reference pipeline.
    *
    * Fused hand-written passes — the hot kernel behind [[normalizeTextCol]]
    * and every normalize UDF. Semantically IDENTICAL to
    * [[normalizeTextReference]] (the stage-by-stage regex chain kept as the
    * executable specification): NormalizerFastSpec pins each pass against
    * its regex on adversarial inputs and the whole kernel against the
    * reference on random + real-document corpora. The regex chain pays
    * ~11 `Pattern` NFA scans per document (plus a `Pattern.compile` per
    * `String.replaceAll` call); this kernel does the same transduction in
    * 6 single scans with no regex engine. */
  def normalizeText(text: String): String = {
    val t = passDotFix(passCommaFix(passDateSpacing(passNumberJoin(
      passCollapse(text).trim))))
    passLines(t)
  }

  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'
  /** Java regex `\s` (default, non-UNICODE_CHARACTER_CLASS). */
  @inline private def isJavaWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  /** What Java regex `\b` tests word-ness against WITHOUT
    * UNICODE_CHARACTER_CLASS: `ch == '_' || Character.isLetterOrDigit(ch)`
    * over the full CODEPOINT — broader than the ASCII `\w` class (é is a
    * word char for `\b` but not for `\w`; caught by the per-pass
    * differential). */
  @inline private def isBoundWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** Stages 1–3 fused: char map (nbsp→space, zero-width-space deleted,
    * \r\n and lone \r → \n) feeding a run collapser ([ \t\f\x0B]+ → one
    * space; 3+ \n → \n\n). Single left-to-right scan — valid because the
    * char map is local (the \r[zwsp]*\n contraction is the one lookahead)
    * and both collapses are runs over the mapped stream. */
  private[graft] def passCollapse(s: String): String = {
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    @inline def emitNewline(): Unit = {
      val m = sb.length()
      if (m < 2 || sb.charAt(m - 1) != '\n' || sb.charAt(m - 2) != '\n') sb.append('\n')
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\u200B') i += 1 // zero-width space: deleted (stage 1)
      else if (c == '\r') {
        // reference removes zwsp globally BEFORE pairing \r\n, so \r zwsp* \n
        // is one boundary, not two
        var j = i + 1
        while (j < n && s.charAt(j) == '\u200B') j += 1
        i = if (j < n && s.charAt(j) == '\n') j + 1 else i + 1
        emitNewline()
      } else if (c == '\n') { emitNewline(); i += 1 }
      else if (c == ' ' || c == '\t' || c == '\f' || c == '\u000B' || c == '\u00A0') {
        val m = sb.length()
        if (m == 0 || sb.charAt(m - 1) != ' ') sb.append(' ')
        i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Stage 5: `(?<=\d)\s+(?=\d)` → "" — drop whitespace runs strictly
    * between ASCII digits (this is what glues date+time, which
    * [[passDateSpacing]] then re-splits). */
  private[graft] def passNumberJoin(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 0
    var last = 0
    while (i < n) {
      if (isJavaWs(s.charAt(i)) && i > 0 && isAsciiDigit(s.charAt(i - 1))) {
        var j = i + 1
        while (j < n && isJavaWs(s.charAt(j))) j += 1
        if (j < n && isAsciiDigit(s.charAt(j))) {
          if (sb == null) sb = new java.lang.StringBuilder(n)
          sb.append(s, last, i)
          last = j
          i = j
        } else i = j // run not digit-terminated: no later start can match either
      } else i += 1
    }
    if (sb == null) s else { sb.append(s, last, n); sb.toString }
  }

  /** Stage 6: `(\d{2}/\d{2}/\d{4})(\d{2}:\d{2}:\d{2})` → `$1 $2` —
    * fixed-width 18-char probe, leftmost match, resume after. */
  private[graft] def passDateSpacing(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 0
    var last = 0
    while (i + 18 <= n) {
      if (isDateTimeAt(s, i)) {
        if (sb == null) sb = new java.lang.StringBuilder(n + 8)
        sb.append(s, last, i + 10).append(' ')
        last = i + 10
        i += 18
      } else i += 1
    }
    if (sb == null) s else { sb.append(s, last, n); sb.toString }
  }

  @inline private def isDateTimeAt(s: String, i: Int): Boolean =
    isAsciiDigit(s.charAt(i)) && isAsciiDigit(s.charAt(i + 1)) &&
      s.charAt(i + 2) == '/' &&
      isAsciiDigit(s.charAt(i + 3)) && isAsciiDigit(s.charAt(i + 4)) &&
      s.charAt(i + 5) == '/' &&
      isAsciiDigit(s.charAt(i + 6)) && isAsciiDigit(s.charAt(i + 7)) &&
      isAsciiDigit(s.charAt(i + 8)) && isAsciiDigit(s.charAt(i + 9)) &&
      isAsciiDigit(s.charAt(i + 10)) && isAsciiDigit(s.charAt(i + 11)) &&
      s.charAt(i + 12) == ':' &&
      isAsciiDigit(s.charAt(i + 13)) && isAsciiDigit(s.charAt(i + 14)) &&
      s.charAt(i + 15) == ':' &&
      isAsciiDigit(s.charAt(i + 16)) && isAsciiDigit(s.charAt(i + 17))

  /** Stage 7: `(\d)\s*,\s*(\d{2})` → `$1,$2`. Greedy `\s*` then a literal
    * is backtrack-free (the skipped chars are all `\s`, never the literal),
    * so skip-then-check reproduces the regex exactly; resume at match end. */
  private[graft] def passCommaFix(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 0
    var last = 0
    while (i < n) {
      if (isAsciiDigit(s.charAt(i))) {
        var j = i + 1
        while (j < n && isJavaWs(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == ',') {
          var k = j + 1
          while (k < n && isJavaWs(s.charAt(k))) k += 1
          if (k + 1 < n && isAsciiDigit(s.charAt(k)) && isAsciiDigit(s.charAt(k + 1))) {
            if (j != i + 1 || k != j + 1) { // whitespace present: rewrite
              if (sb == null) sb = new java.lang.StringBuilder(n)
              sb.append(s, last, i + 1).append(',')
                .append(s.charAt(k)).append(s.charAt(k + 1))
              last = k + 2
            } // else: identity rewrite — just consume (regex resumes after it)
            i = k + 2
          } else i += 1
        } else i += 1
      } else i += 1
    }
    if (sb == null) s else { sb.append(s, last, n); sb.toString }
  }

  /** Stage 8: `(?<=\d)\s*\.\s*(?=\d{3}\b)` → "". Lookbehind/lookahead read
    * the ORIGINAL string (Java replaceAll matches on the input, assembling
    * replacements separately) — so the checks index `s`, not the builder. */
  private[graft] def passDotFix(s: String): String = {
    val n = s.length
    var sb: java.lang.StringBuilder = null
    var i = 1
    var last = 0
    while (i < n) {
      val c = s.charAt(i)
      if ((c == '.' || isJavaWs(c)) && isAsciiDigit(s.charAt(i - 1))) {
        var j = i
        while (j < n && isJavaWs(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == '.') {
          var k = j + 1
          while (k < n && isJavaWs(s.charAt(k))) k += 1
          val ok = k + 3 <= n &&
            isAsciiDigit(s.charAt(k)) && isAsciiDigit(s.charAt(k + 1)) &&
            isAsciiDigit(s.charAt(k + 2)) &&
            (k + 3 == n || !isBoundWordCp(s.codePointAt(k + 3))) // \b after \d{3}
          if (ok) {
            if (sb == null) sb = new java.lang.StringBuilder(n)
            sb.append(s, last, i)
            last = k
            i = k // the 3 digits may back a subsequent match's lookbehind
          } else i += 1
        } else i += 1
      } else i += 1
    }
    if (sb == null) s else { sb.append(s, last, n); sb.toString }
  }

  /** Stages 9–11: exotic separators act as line boundaries (the reference
    * maps them to \n then splits on \n — equivalent), each line trimmed,
    * noise-filtered, order-preserving-deduped, rejoined. */
  private[graft] def passLines(s: String): String = {
    @inline def isLineSep(c: Char): Boolean =
      c == '\n' || c == '\u001C' || c == '\u001D' || c == '\u001E' ||
        c == '\u0085' || c == '\u2028' || c == '\u2029'
    val seen = new java.util.LinkedHashSet[String]()
    val n = s.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || isLineSep(s.charAt(i))) {
        val ln = s.substring(start, i).trim
        if (SiglasValidas.contains(ln.toUpperCase(java.util.Locale.ROOT)) ||
            ln.length >= 3 || ln.exists(_.isDigit)) seen.add(ln)
        start = i + 1
      }
      i += 1
    }
    String.join("\n", seen)
  }

  /** The stage-by-stage regex chain — kept verbatim as the executable
    * SPECIFICATION the fused [[normalizeText]] is differential-tested
    * against (FuzzSpec, NormalizerFastSpec). Not on any hot path. */
  private[graft] def normalizeTextReference(text: String): String = {
    var t = text
      .replace(" ", " ") // nbsp (ref: text_normalizer.py:5)
      .replace("​", "")  // zero-width space (ref: :6)
      .replace("\r\n", "\n")  // (ref: :7)
      .replace("\r", "\n")    // lone \r is a line boundary for Python splitlines
    // normalize_whitespace (ref: :10-15)
    t = t.replaceAll("[ \\t\\f\\x0B]+", " ")
    t = t.replaceAll("\\n{2,}", "\n\n")
    t = t.trim
    // join_split_numbers (ref: :17-20)
    t = t.replaceAll("(?<=\\d)\\s+(?=\\d)", "")
    // fix_date_spacing (ref: :52-61)
    t = t.replaceAll("(\\d{2}/\\d{2}/\\d{4})(\\d{2}:\\d{2}:\\d{2})", "$1 $2")
    // normalize_commas_and_dots (ref: :22-28)
    t = t.replaceAll("(\\d)\\s*,\\s*(\\d{2})", "$1,$2")
    t = t.replaceAll("(?<=\\d)\\s*\\.\\s*(?=\\d{3}\\b)", "")

    // Python str.splitlines also breaks on FS/GS/RS/NEL/LS/PS — map them to
    // \n at split time (\f/\v are already collapsed by the whitespace step,
    // \r handled up top) so line boundaries match the reference.
    t = t.replaceAll("[\\x1c\\x1d\\x1e\\x85\\u2028\\u2029]", "\n")

    // strip_lines_noise (ref: :30-50) + order-preserving dedup (ref: :84-91)
    val kept = t.split("\n", -1).iterator.map(_.trim).filter { ln =>
      SiglasValidas.contains(ln.toUpperCase(java.util.Locale.ROOT)) ||
      ln.length >= 3 || ln.exists(_.isDigit)
    }
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    kept.foreach(seen.add)
    seen.mkString("\n")
  }

  /** Column normalization — one [[graft.plans.NormalizeTextExpr]] node
    * wrapping the fused kernel. Same NULL-in→NULL-out semantics as the
    * column-algebra form it replaced ([[normalizeTextColAlgebra]], kept as
    * a second executable specification for the differential specs). */
  def normalizeTextCol(c: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      graft.plans.NormalizeTextExpr(
        org.apache.spark.sql.graft.ColumnShim.expression(c)))

  /** Column-algebra normalization — semantically identical to
    * [[normalizeText]] but expressed as an 11-node `regexp_replace` +
    * higher-order-function chain. `array_distinct` preserves
    * first-occurrence order (verified in NormalizerSpec), matching the
    * reference's `seen`-set walk (ref: text_normalizer.py:84-91). Retired
    * from the hot paths by [[normalizeTextCol]]'s fused kernel (each node
    * re-drives the regex NFA over the whole document); kept as the
    * independent Column-side specification the specs differential against. */
  def normalizeTextColAlgebra(c: Column): Column = {
    var t = translate(c, " ​", " ") // nbsp→space, zero-width deleted
    t = regexp_replace(t, "\r\n|\r", "\n")
    t = regexp_replace(t, "[ \\t\\f\\x0B]+", " ")
    t = regexp_replace(t, "\\n{2,}", "\n\n")
    t = trim(t)
    t = regexp_replace(t, "(?<=\\d)\\s+(?=\\d)", "")
    t = regexp_replace(t, "(\\d{2}/\\d{2}/\\d{4})(\\d{2}:\\d{2}:\\d{2})", "$1 $2")
    t = regexp_replace(t, "(\\d)\\s*,\\s*(\\d{2})", "$1,$2")
    t = regexp_replace(t, "(?<=\\d)\\s*\\.\\s*(?=\\d{3}\\b)", "")
    t = regexp_replace(t, "[\\x1c\\x1d\\x1e\\x85\\u2028\\u2029]", "\n")

    val siglas = array(SiglasValidas.toSeq.sorted.map(lit): _*)
    val lines = transform(split(t, "\n", -1), ln => trim(ln))
    val kept = filter(
      lines,
      ln =>
        // (?U) makes \d Unicode like Python's re and the pure-Scala
        // Character.isDigit — ASCII-only \d would drop e.g. "٤٢" lines
        array_contains(siglas, upper(ln)) || length(ln) >= 3 ||
          ln.rlike("(?U)\\d"))
    array_join(array_distinct(kept), "\n")
  }
}
