package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** C4 line-level cleaning (Raffel et al. 2020 §2.2): every rule pinned on
  * a hand-built page where exactly that rule decides, plus a loop
  * reimplementation differential over the real corpus. */
class C4CleanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clean(text: String) = {
    val d = Seq((1L, text)).toDF("doc_id", "text")
    TextAnalysis.c4CleanOn(d, col("text")).collect().head
  }

  test("terminal punctuation rule: period/bang/question/closing-quote keep, else drop") {
    val r = clean(Seq(
      "This line ends with a period.",     // keep
      "Does this line end right?",         // keep
      "What an exciting line this is!",    // keep
      "He said \"it ends in a quote.\"",   // keep (closing quote)
      "This line just trails off",         // drop: no terminal punct
      "This one ends with a comma,",       // drop
      "Ends with terminal punct then spaces.   " // keep: rtrim first
    ).mkString("\n"))
    assert(r.getAs[Int]("n_lines") == 7)
    assert(r.getAs[Int]("n_lines_kept") == 5)
    assert(r.getAs[String]("clean_text").linesIterator.size == 5)
  }

  test("three-word minimum: short lines drop even with terminal punctuation") {
    val r = clean("Too short.\nStill too.\nExactly three words.\nplenty of words here.")
    assert(r.getAs[Int]("n_lines_kept") == 2)
    assert(r.getAs[String]("clean_text") ==
      "Exactly three words.\nplenty of words here.")
  }

  test("javascript rule: word-bounded, case-insensitive, line-scoped") {
    val r = clean(Seq(
      "Please enable JavaScript to continue.",     // drop: the word
      "Enable javascript in your browser settings.", // drop: lowercase
      "The javascripter wrote more code anyway.",  // keep: not word-bounded
      "A perfectly ordinary line survives here."   // keep
    ).mkString("\n"))
    assert(r.getAs[Int]("n_lines_kept") == 2)
    assert(!r.getAs[String]("clean_text").toLowerCase.contains("enable"))
  }

  test("page verdict: five-sentence minimum counts runs of terminal punctuation") {
    // 4 kept lines, one ending in "!!!" — runs count once, so 4 sentences < 5
    val four = clean(Seq(
      "The first sentence sits here.",
      "The second sentence sits here.",
      "The third sentence sits here.",
      "The fourth one is very loud!!!").mkString("\n"))
    assert(four.getAs[Int]("n_sentences") == 4 && !four.getAs[Boolean]("kept"))
    // a kept line can carry two sentences — counted from the TEXT, not lines
    val five = clean(Seq(
      "The first sentence sits here.",
      "The second sentence sits here.",
      "The third sentence sits here.",
      "A fourth sentence. And a fifth!").mkString("\n"))
    assert(five.getAs[Int]("n_sentences") == 5 && five.getAs[Boolean]("kept"))
  }

  test("page verdict: lorem ipsum and curly braces reject the raw page") {
    val base = (1 to 6).map(i => s"Perfectly good sentence number $i here.")
    val lorem = clean((base :+ "And some Lorem Ipsum filler text arrives").mkString("\n"))
    assert(lorem.getAs[Boolean]("has_lorem") && !lorem.getAs[Boolean]("kept"))
    // the brace sits on a DROPPED line — the rule still fires (raw-page scope)
    val brace = clean((base :+ "function f() {").mkString("\n"))
    assert(brace.getAs[Boolean]("has_brace") && !brace.getAs[Boolean]("kept"))
    val ok = clean(base.mkString("\n"))
    assert(ok.getAs[Boolean]("kept"))
  }

  test("badWords page filter: word-bounded external list") {
    val base = (1 to 6).map(i => s"Perfectly good sentence number $i here.").mkString("\n")
    def keptWith(words: Seq[String], text: String) = {
      val d = Seq((1L, text)).toDF("doc_id", "text")
      TextAnalysis.c4CleanOn(d, col("text"), words)
        .collect().head.getAs[Boolean]("kept")
    }
    assert(keptWith(Nil, base))
    assert(!keptWith(Seq("number"), base))
    assert(keptWith(Seq("numb"), base), "must be word-bounded, not substring")
  }

  test("empty and degenerate pages") {
    val empty = clean("")
    assert(empty.getAs[Int]("n_lines_kept") == 0 &&
      empty.getAs[String]("clean_text") == "" && !empty.getAs[Boolean]("kept"))
    val spaces = clean("   \n   ")
    assert(spaces.getAs[Int]("n_lines_kept") == 0 && !spaces.getAs[Boolean]("kept"))
  }

  test("corpus differential: engine (synthetic page + kernel) ≡ loop reimplementation on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = TextAnalysis.c4Clean(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getBoolean(6), r.getString(7))).toMap
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val id = r.getLong(0); val raw = Option(r.getString(1)).getOrElse("")
        // loop replica of c4SyntheticPage
        val ws = raw.split(" ", -1)
        val punct = Array(".", "", "!", ",", "?")
        val synth = (0 until math.ceil(ws.length / 8.0).toInt).map { i =>
          ws.slice(i * 8, i * 8 + 8).mkString(" ") + punct(i % 5)
        }.mkString("\n") +
          (if (id % 17 == 0) "\nplus a lorem ipsum marker line." else "") +
          (if (id % 23 == 0) "\nint main() { return 0; }" else "") +
          (if (id % 31 == 0) "\nPlease enable javascript to continue." else "")
        val t = synth
        val lines = t.split("\n", -1)
        val kept = lines.filter { l =>
          val rt = l.replaceAll(" +$", "")
          rt.nonEmpty && ".!?\"".contains(rt.last) &&
          l.trim.split("\\s+", -1).length >= 3 &&
          !java.util.regex.Pattern.compile("\\bjavascript\\b")
            .matcher(l.toLowerCase).find()
        }
        val cleanText = kept.mkString("\n")
        val nSent = java.util.regex.Pattern.compile("[.!?]+")
          .matcher(cleanText).results().count().toInt
        val keptPage = nSent >= 5 && !t.toLowerCase.contains("lorem ipsum") &&
          !t.contains("{")
        id -> (lines.length, kept.length, nSent, keptPage, cleanText)
      }.toMap
    assert(got.size == want.size && got.nonEmpty)
    want.foreach { case (id, w) => assert(got(id) == w, s"doc $id") }
    // the corpus must actually exercise the gate both ways
    val keptN = got.values.count(_._4)
    assert(keptN > 0 && keptN < got.size,
      s"degenerate corpus: $keptN/${got.size} kept")
  }

  // --- round 13: the fused kernel vs the executable specification -------

  test("fused kernel == column algebra on adversarial pages (all 7 columns)") {
    val pages = Seq(
      "",                                     // empty text
      "\n", "\n\n",                           // empty lines, trailing split semantics
      "only one line that ends well.",
      "a.\nb!\nc?",                            // short lines, all punct
      "ends with tab\t.\nends with space . ",  // whitespace before/after punct
      "line with\ttab inside counts words.",   // \t is \s+ but not trim()'d
      "\tleading tab line ends fine here.",    // leading \t -> empty first token
      "a b c.\r\nwindows line endings here.", // \r survives the \n split, rtrim vs trim
      "Please enable JavaScript to proceed.\nplain good line stays right here.",
      "xjavascriptx is not word-bounded ok.",  // \b must NOT fire inside a word
      "javascript: at line start bounded.",    // \b fires at punctuation
      "lorem ipsum dolor sit amet etc.\n" + ("good line number one stays here.\n" * 6),
      "int main() { return 0; }\n" + ("good line number one stays here.\n" * 6),
      ("good line number one stays here.\n" * 4).stripSuffix("\n"), // 4 sentences: kept=false
      ("good line number one stays here.\n" * 5).stripSuffix("\n"), // 5 sentences: kept=true
      "multi...!!!???sentence punctuation runs here.\n" +
        "second proper line for the count.",
      "unicode \u00c7\u00e3o l\u00edngua \u03a3\u03bf\u03c2 ends properly.\n" +
        "\u0130stanbul dotted capital I line.",  // sigma/dotted-I lower corners
      "emoji \ud83d\ude00 astral chars count fine.",
      "ends with closing quote \"inside.\"",
      "null-ish   \n   \nblank-ish lines drop silently."
    )
    val docs = pages.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val cols = Seq("doc_id", "has_lorem", "has_brace", "n_lines",
      "n_lines_kept", "clean_text", "n_sentences", "kept")
    val fused = TextAnalysis.c4CleanOn(docs, col("text"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    val ref = TextAnalysis.c4CleanOnAlgebra(docs, col("text"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(fused == ref)
    // and under a badWords list (the external block-list leg)
    val bw = Seq("astral", "D\u00edA")
    val fusedB = TextAnalysis.c4CleanOn(docs, col("text"), bw)
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    val refB = TextAnalysis.c4CleanOnAlgebra(docs, col("text"), bw)
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(fusedB == refB)
  }

  test("fused kernel == column algebra over the real synthetic-page corpus") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("__p", TextAnalysis.c4SyntheticPage)
    val cols = Seq("doc_id", "has_lorem", "has_brace", "n_lines",
      "n_lines_kept", "clean_text", "n_sentences", "kept")
    val fused = TextAnalysis.c4CleanOn(d, col("__p"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    val ref = TextAnalysis.c4CleanOnAlgebra(d, col("__p"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(fused == ref)
  }

  test("fused kernel: NULL text behaves like empty (coalesce semantics)") {
    val d = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.c4CleanOn(d, col("text")).orderBy("doc_id").collect()
    val ref = TextAnalysis.c4CleanOnAlgebra(d, col("text")).orderBy("doc_id").collect()
    assert(out.toSeq == ref.toSeq)
    assert(!out(0).getAs[Boolean]("kept") && out(0).getAs[String]("clean_text") == "")
  }
}
