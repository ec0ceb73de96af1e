package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Gopher repetition battery (Rae 2021 Table A1): every fraction pinned on
  * a crafted page whose counts are computable by hand. */
class GopherRepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def row(text: String) =
    TextAnalysis.gopherRepetitionOn(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head

  test("duplicate line fraction counts ALL occurrences of duplicated values") {
    // 4 lines, one value twice: dup_occ = 2, frac = 2/4
    val r = row("aa bb\ncc dd\naa bb\nee ff")
    assert(r.getAs[Double]("dup_line_frac") == 0.5)
    // char frac: "aa bb" (5 chars) × 2 / total 23 chars
    assert(math.abs(r.getAs[Double]("dup_line_char_frac") - 10.0 / 23) < 1e-6)
  }

  test("paragraphs split on blank lines; lines trim before comparing") {
    val r = row("para one here\n\npara two there\n\npara one here")
    assert(math.abs(r.getAs[Double]("dup_para_frac") - 2.0 / 3) < 1e-6)
    // trimmed duplicate: trailing spaces don't defeat the match
    val r2 = row("aa bb   \ncc dd\naa bb")
    assert(math.abs(r2.getAs[Double]("dup_line_frac") - 2.0 / 3) < 1e-6)
  }

  test("top n-gram char fraction: most frequent 2-gram's char mass") {
    // "x y" appears 3 times among 6 bigram positions; len("x y") = 3
    val t = "x y x y x y z"
    val r = row(t)
    assert(math.abs(r.getAs[Double]("top2_char_frac") - 3.0 * 3 / t.length) < 1e-6)
  }

  test("duplicated n-gram char fraction sums every occurrence of c>=2 grams") {
    // words: a b c a b c — 5-grams: "a b c a b"(1), "b c a b c"(1) → dup5 = 0
    assert(row("a b c a b c").getAs[Double]("dup5_char_frac") == 0.0)
    // a b c d e a b c d e: 5-grams at 0 and 5 are both "a b c d e"? positions
    // 0..5: [a b c d e],[b c d e a],[c d e a b],[d e a b c],[e a b c d],[a b c d e]
    // → "a b c d e" ×2 (9 chars) → 18 / 19 total chars
    val t = "a b c d e a b c d e"
    assert(math.abs(row(t).getAs[Double]("dup5_char_frac") - 18.0 / t.length) < 1e-6)
  }

  test("verdict: a heavily line-duplicated page rejects, a clean page keeps") {
    val dup = (1 to 10).map(_ => "the same exact line repeats here").mkString("\n")
    assert(!row(dup).getAs[Boolean]("kept"))
    // distinct-word page: nothing repeats at any n
    val clean = (0 until 120).map(i => s"w$i").grouped(8).map(_.mkString(" ")).mkString("\n")
    assert(row(clean).getAs[Boolean]("kept"))
  }

  test("empty and null-ish pages are zeros, kept") {
    val r = row("")
    assert(r.getAs[Double]("dup_line_frac") == 0.0 &&
      r.getAs[Double]("dup10_char_frac") == 0.0 && r.getAs[Boolean]("kept"))
  }

  test("query over the corpus: planted dups reject small docs, big docs absorb them") {
    val out = TextAnalysis.gopherRepetition(spark, "/root/testdata/sf0.001")
      .select("doc_id", "kept").collect()
    val kept = out.count(_.getBoolean(1))
    assert(kept > 0 && kept < out.length, s"degenerate: $kept/${out.length}")
    // the %4 planted duplicate line must reject at least one small doc
    val rejected4 = out.exists(r => r.getLong(0) % 4 == 0 && !r.getBoolean(1))
    assert(rejected4, "no %4-planted doc rejected")
  }
}
