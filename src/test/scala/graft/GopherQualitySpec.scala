package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Gopher quality rules (Rae et al. 2021 A1.1): each rule pinned on a page
  * where exactly that rule decides. A page passing ALL rules anchors the
  * positive direction. */
class GopherQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 60 plain words averaging ~4.7 chars, two stop words, no symbols. */
  private val goodPage: String =
    (1 to 6).map(_ => "the quick brown fox jumps over that lazy sleeping dog")
      .mkString("\n")

  private def row(text: String) =
    TextAnalysis.gopherQualityOn(
      Seq((1L, text)).toDF("doc_id", "text"), col("text"))
      .collect().head

  test("the anchor page passes every rule") {
    val r = row(goodPage)
    assert(r.getAs[Int]("n_words") == 60)
    assert(r.getAs[Int]("n_stop_hits") == 2)
    assert(r.getAs[Boolean]("kept"), r.toString)
  }

  test("word-count bounds: < 50 and > 100k words both reject") {
    assert(!row("the quick brown fox with that").getAs[Boolean]("kept"))
    val huge = Array.fill(100001)("the").mkString(" ") + " be with that"
    assert(!row(huge).getAs[Boolean]("kept"))
  }

  test("mean word length bounds") {
    val short = (1 to 60).map(_ => "a b c d").mkString(" ") + " the be"
    assert(row(short).getAs[Double]("mean_word_len") < 3.0)
    assert(!row(short).getAs[Boolean]("kept"))
    val long = (1 to 60).map(_ => "extraordinarily sesquipedalian").mkString(" ") +
      " the with"
    assert(row(long).getAs[Double]("mean_word_len") > 10.0)
    assert(!row(long).getAs[Boolean]("kept"))
  }

  test("symbol-to-word ratios: hash and ellipsis") {
    val hashy = goodPage + "\n" + Array.fill(8)("#").mkString(" ")
    assert(row(hashy).getAs[Double]("hash_ratio") > 0.1)
    assert(!row(hashy).getAs[Boolean]("kept"))
    val dotty = goodPage + "\nwell... maybe... perhaps... sometimes... often... no..." +
      " hmm... yes... sure..."
    assert(row(dotty).getAs[Double]("ellipsis_ratio") > 0.1)
    assert(!row(dotty).getAs[Boolean]("kept"))
    // the unicode ellipsis counts too
    val uni = goodPage + "\n" + Array.fill(8)("…").mkString(" ")
    assert(row(uni).getAs[Double]("ellipsis_ratio") > 0.1)
  }

  test("bullet-started and ellipsis-ended line percentages") {
    // 10 bullet lines vs goodPage's 6 → 10/16 = 62.5% (kept); 60 bullets vs 6 → 91% (dropped)
    val some = goodPage + "\n" + (1 to 10).map(_ => "• the bullet with that line").mkString("\n")
    assert(row(some).getAs[Boolean]("kept"))
    val many = goodPage + "\n" + (1 to 60).map(_ => "• the bullet with that line").mkString("\n")
    assert(row(many).getAs[Double]("pct_bullet_lines") > 0.9)
    assert(!row(many).getAs[Boolean]("kept"))
    val trailing = goodPage + "\n" + (1 to 3).map(_ => "the line trails with that...").mkString("\n")
    assert(row(trailing).getAs[Double]("pct_ellipsis_lines") > 0.3)
    assert(!row(trailing).getAs[Boolean]("kept"))
  }

  test("alphabetic-word percentage") {
    val numeric = goodPage + "\n" + (1 to 30).map(i => s"$i${i * 7}").mkString(" ")
    assert(row(numeric).getAs[Double]("pct_alpha_words") < 0.8)
    assert(!row(numeric).getAs[Boolean]("kept"))
  }

  test("stop-word rule needs two DISTINCT list words") {
    val oneStop = (1 to 60).map(_ => "quick brown fox jumps the").mkString(" ")
    assert(row(oneStop).getAs[Int]("n_stop_hits") == 1)
    assert(!row(oneStop).getAs[Boolean]("kept"))
    val twoStops = oneStop + " with"
    assert(row(twoStops).getAs[Int]("n_stop_hits") == 2)
    assert(row(twoStops).getAs[Boolean]("kept"))
  }

  test("empty page: null-guarded metrics, kept=false") {
    val r = row("")
    assert(r.getAs[Int]("n_words") == 0 && !r.getAs[Boolean]("kept"))
    assert(r.isNullAt(r.fieldIndex("mean_word_len")))
  }

  test("query over the corpus exercises the verdict both ways") {
    val out = TextAnalysis.gopherQuality(spark, "/root/testdata/sf0.001")
      .select("kept").collect().map(_.getBoolean(0))
    val kept = out.count(identity)
    assert(kept > 0 && kept < out.length, s"degenerate: $kept/${out.length}")
  }

  // --- round 13: the fused kernel vs the executable specification -------

  test("fused kernel == column algebra on adversarial pages (all 9 columns)") {
    import spark.implicits._
    val good = (1 to 60).map(i => s"word$i the be").mkString(" ")
    val pages = Seq(
      "",
      " \t \n  ",
      good,                                            // kept=true shape
      good + " ####################",                  // hash ratio
      good + " " + ("..." * 30),                       // ellipsis ratio (non-overlap count)
      "......",                                        // 2 non-overlapping "..."
      (1 to 60).map(_ => "\u2022 bullet line").mkString("\n"),  // bullet lines
      (1 to 10).map(_ => "trailing ellipsis line...").mkString("\n"),
      (1 to 10).map(_ => "unicode ellipsis line\u2026").mkString("\n"),
      "  - dash bullet\n  * star bullet\n\u2023 tri bullet\nplain line",
      "THE BE TO OF AND THAT HAVE WITH uppercase stopwords " + good,
      (1 to 60).map(_ => "\u00e7\u00e3\u00f5").mkString(" "),  // no-alpha words
      (1 to 60).map(i => "w" * 11).mkString(" "),       // mean len > 10
      "short doc.",
      "tab\tseparated\ttokens count distinctly " + good,
      "astral \ud83d\ude00 token " + good,
      good + "\n" + "line ending in spaces...   ",
      "null-free \u0130stanbul \u03a3\u03bf\u03c2 unicode " + good
    )
    val docs = pages.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val cols = Seq("doc_id") ++ graft.functions.GopherKernel.schema.fieldNames
    val fused = TextAnalysis.gopherQualityOn(docs, col("text"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    val ref = TextAnalysis.gopherQualityOnAlgebra(docs, col("text"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(fused == ref)
  }

  test("fused kernel == column algebra over the real corpus and on NULL text") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = Seq("doc_id") ++ graft.functions.GopherKernel.schema.fieldNames
    val fused = TextAnalysis.gopherQualityOn(d, col("text"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    val ref = TextAnalysis.gopherQualityOnAlgebra(d, col("text"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(fused == ref)
    val n = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(TextAnalysis.gopherQualityOn(n, col("text")).collect().toSeq ==
      TextAnalysis.gopherQualityOnAlgebra(n, col("text")).collect().toSeq)
  }
}
