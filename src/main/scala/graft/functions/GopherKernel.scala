package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused single-pass kernel behind [[graft.plans.GopherQualityExpr]] —
  * the Gopher quality-rule battery (Rae 2021 §A1.1; reference behavior
  * via [[graft.operators.TextAnalysis.gopherQualityOnAlgebra]], kept as
  * the executable specification) computed in ONE walk per document: word
  * metrics (count, mean length, alpha ratio, stopword evidence), symbol
  * ratios (#/ellipsis), and line metrics (bullet/ellipsis lines), then
  * the verdict.
  *
  * Same motivation and exactness discipline as [[C4Kernel]] (docs/PERF.md
  * r13): the column-algebra form's HOF arrays get no CSE, so the kept
  * predicate re-runs the whole battery under pushdown. Primitives
  * delegate to the exact machinery the columns used — `java.util.regex`
  * for the `\s+` token split, [[C4Kernel.lowerLikeSpark]] for `lower`,
  * `UTF8String.substringSQL` for the first/last-codepoint line tests,
  * space-only trim for ltrim/rtrim, non-overlapping single-pass counting
  * for `replace`-based occurrences, codepoint counts for `length`, and
  * `BigDecimal` HALF_UP for `round(x, 6)`. Pinned by GopherQualitySpec's
  * kernel≡algebra differential; `q_gopher_quality` + the curation oracles
  * re-verified hash-exact. */
object GopherKernel {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = true),
    StructField("hash_ratio", DoubleType, nullable = true),
    StructField("ellipsis_ratio", DoubleType, nullable = true),
    StructField("pct_bullet_lines", DoubleType, nullable = false),
    StructField("pct_ellipsis_lines", DoubleType, nullable = false),
    StructField("pct_alpha_words", DoubleType, nullable = true),
    StructField("n_stop_hits", IntegerType, nullable = false),
    StructField("kept", BooleanType, nullable = false)))

  private val WsP = Pattern.compile("\\s+")
  private val NewlineP = Pattern.compile("\n")
  private val MaxStopLen: Int =
    graft.operators.TextAnalysis.GopherStopWords.map(_.length).max

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Non-overlapping left-to-right count — exactly what
    * `(length(c) − length(replace(c, needle, ''))) / len(needle)`
    * computes (replace is a single non-rescanning pass). */
  private def countNonOverlap(s: String, needle: String): Int = {
    var c = 0
    var i = s.indexOf(needle)
    while (i >= 0) { c += 1; i = s.indexOf(needle, i + needle.length) }
    c
  }

  private def ltrimStart(s: String): Int = {
    var b = 0
    while (b < s.length && s.charAt(b) == ' ') b += 1
    b
  }

  private def rtrimEnd(s: String): Int = {
    var e = s.length
    while (e > 0 && s.charAt(e - 1) == ' ') e -= 1
    e
  }

  /** NULL input behaves like "" (the algebra's coalesce). */
  def eval(in: UTF8String): InternalRow = {
    val text = if (in == null) "" else in.toString
    // word battery: one tokenization, one pass over the tokens
    var nWords = 0
    var sumLen = 0L
    var nAlpha = 0
    var stopMask = 0
    val tokens = WsP.split(text, -1)
    var t = 0
    while (t < tokens.length) {
      val w = tokens(t)
      if (w.nonEmpty) {
        nWords += 1
        sumLen += w.codePointCount(0, w.length)
        var k = 0
        var alpha = false
        while (k < w.length && !alpha) {
          val c = w.charAt(k)
          alpha = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')
          k += 1
        }
        if (alpha) nAlpha += 1
        if (w.length <= MaxStopLen) {
          val idx = graft.operators.TextAnalysis.GopherStopWords
            .indexOf(C4Kernel.lowerLikeSpark(w))
          if (idx >= 0) stopMask |= 1 << idx
        }
      }
      t += 1
    }
    val nStop = Integer.bitCount(stopMask)
    // symbol counts over the raw text
    val nHash = countNonOverlap(text, "#")
    val nEllipsis = countNonOverlap(text, "…") + countNonOverlap(text, "...")
    // line battery
    val lines = NewlineP.split(text, -1)
    var nBullet = 0
    var nEllLines = 0
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val lb = ltrimStart(l)
      if (lb < l.length) {
        val first = UTF8String.fromString(l.substring(lb)).substringSQL(1, 1).toString
        if (first == "•" || first == "‣" || first == "-" || first == "*")
          nBullet += 1
      }
      val re = rtrimEnd(l)
      if (re > 0) {
        val rt = UTF8String.fromString(l.substring(0, re))
        if (rt.substringSQL(-3, 3).toString == "..." ||
          rt.substringSQL(-1, 1).toString == "…") nEllLines += 1
      }
      i += 1
    }
    val nLines = lines.length
    // ratios + verdict (NULL when nWords == 0 — the algebra's ratio())
    def ratio(num: Double): Any =
      if (nWords == 0) null else round6(num / nWords)
    val meanLen = ratio(sumLen.toDouble)
    val hashRatio = ratio(nHash.toDouble)
    val ellipsisRatio = ratio(nEllipsis.toDouble)
    val pctAlpha = ratio(nAlpha.toDouble)
    val pctBullet = round6(nBullet.toDouble / nLines)
    val pctEll = round6(nEllLines.toDouble / nLines)
    // the UNROUNDED ratios decide, as in the algebra (round only displays)
    val kept = nWords >= 50 && nWords <= 100000 && {
      val m = sumLen.toDouble / nWords
      m >= 3d && m <= 10d
    } && nHash.toDouble / nWords <= 0.1 &&
      nEllipsis.toDouble / nWords <= 0.1 &&
      nBullet.toDouble / nLines <= 0.9 &&
      nEllLines.toDouble / nLines <= 0.3 &&
      nAlpha.toDouble / nWords >= 0.8 && nStop >= 2
    new GenericInternalRow(Array[Any](
      nWords, meanLen, hashRatio, ellipsisRatio, pctBullet, pctEll,
      pctAlpha, nStop, kept))
  }
}
