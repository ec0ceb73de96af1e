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
  * Two implementations with identical semantics (cross-checked in
  * NormalizerSpec):
  *   - [[normalizeText]]: pure Scala, for driver-side tests and reuse inside
  *     document-local UDFs.
  *   - [[normalizeTextCol]]: pure Column algebra (`regexp_replace` +
  *     higher-order array functions) — stays inside whole-stage codegen, no
  *     UDF serialization, scales as a narrow transformation.
  */
object Normalizer {

  /** 27 UF siglas + doc-type siglas whitelist for the line-noise filter
    * (ref: robot/core/text_normalizer.py:32-37). */
  val SiglasValidas: Set[String] = Set(
    "AC", "AL", "AP", "AM", "BA", "CE", "DF", "ES", "GO", "MA",
    "MT", "MS", "MG", "PA", "PB", "PR", "PE", "PI", "RJ", "RN",
    "RS", "RO", "RR", "SC", "SP", "SE", "TO",
    "NF", "RG", "IE", "IM", "CPF")

  /** Pure-Scala normalization, byte-equivalent to the reference pipeline. */
  def normalizeText(text: String): String = {
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

  /** Column-algebra normalization — semantically identical to
    * [[normalizeText]] but fully codegen'd (no UDF). `array_distinct`
    * preserves first-occurrence order (verified in NormalizerSpec), matching
    * the reference's `seen`-set walk (ref: text_normalizer.py:84-91). */
  def normalizeTextCol(c: Column): Column = {
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
