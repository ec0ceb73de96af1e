package graft

import graft.functions.Normalizer
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The fused normalization kernel vs its executable specification — the
  * stage-by-stage regex chain ([[Normalizer.normalizeTextReference]]).
  *
  * Each hand-written pass is differential-tested against EXACTLY the regex
  * it replaces, on generators biased to the pass's sensitive characters
  * (digit/whitespace/comma/dot density far above natural text), then the
  * whole kernel against the whole chain on adversarial strings and on the
  * real sf0.001 documents. The goal is that any divergence — including in
  * Java-regex corner semantics like default (ASCII) `\s`/`\b` and
  * leftmost-match resumption — shows up here, not in an oracle hash. */
class NormalizerFastSpec extends AnyFunSuite {

  // ---- generators -------------------------------------------------------

  private val hotChar: Gen[Char] = Gen.frequency(
    6 -> Gen.oneOf('0', '1', '2', '9'),
    4 -> Gen.oneOf(' ', '\n', '\t', '\r', '\f', '\u000B'),
    3 -> Gen.oneOf(',', '.', '/', ':'),
    2 -> Gen.oneOf('a', 'Z', '_', '-'),
    1 -> Gen.oneOf('\u00A0', '\u200B', '\u001C', '\u001D', '\u001E',
      '\u0085', '\u2028', '\u2029', '\u2009'),
    // includes lone surrogate halves of U+1D7D2 (astral digit) — the
    // passes must treat unpaired/paired surrogates exactly like the regexes
    1 -> Gen.oneOf('ç', 'É', '€', '٤', '\uD835', '\uDFD2'))
  private val hotText: Gen[String] =
    Gen.chooseNum(0, 120).flatMap(n => Gen.listOfN(n, hotChar).map(_.mkString))

  private def samples(n: Int, seedBase: Long = 7000L): Seq[String] = {
    val params = Gen.Parameters.default.withSize(100)
    (0 until n).flatMap(i =>
      hotText.apply(params, org.scalacheck.rng.Seed(seedBase + i)))
  }

  private def diff(name: String, fast: String => String, regex: String => String,
                   inputs: Seq[String]): Unit =
    inputs.foreach { in =>
      val got = fast(in)
      val want = regex(in)
      // fail() with fully-escaped message only: raw operands may hold lone
      // surrogates, which crash sbt's JUnit XML listener mid-report
      if (got != want) fail(s"$name diverged for " +
        in.take(80).map(c => f"\\u${c.toInt}%04x").mkString +
        s"\n got: ${got.map(c => f"\\u${c.toInt}%04x").mkString}" +
        s"\nwant: ${want.map(c => f"\\u${c.toInt}%04x").mkString}")
    }

  // ---- per-pass differentials vs the exact regex each pass replaces -----

  test("passCollapse ≡ stage 1-3 regex chain (char map + ws collapse + \\n collapse)") {
    def regex(s: String): String = s
      .replace("\u00A0", " ").replace("\u200B", "")
      .replace("\r\n", "\n").replace("\r", "\n")
      .replaceAll("[ \\t\\f\\x0B]+", " ")
      .replaceAll("\\n{2,}", "\n\n")
    val edges = Seq("", "\r", "\r\n", "\r\u200B\n", "\r\u200B\r\n", "\r\r\n",
      "a\u00A0\u00A0b", "\u200B", "a\t\r\tb", "\n\n\n\n", "\n \n\n\n",
      "x\u000B\f\ty", "\u00A0\n\u00A0")
    diff("passCollapse", Normalizer.passCollapse, regex, edges ++ samples(600))
  }

  test("passNumberJoin ≡ (?<=\\d)\\s+(?=\\d) removal") {
    def regex(s: String): String = s.replaceAll("(?<=\\d)\\s+(?=\\d)", "")
    val edges = Seq("1 2", "1 \n 2", "1  x 2", "15/12/2024 10:30:00",
      "٤ ٢", "1\u00852", "1 ", " 1", "12 34 56")
    diff("passNumberJoin", Normalizer.passNumberJoin, regex, edges ++ samples(600, 8000L))
  }

  test("passDateSpacing ≡ date-time re-split regex") {
    def regex(s: String): String =
      s.replaceAll("(\\d{2}/\\d{2}/\\d{4})(\\d{2}:\\d{2}:\\d{2})", "$1 $2")
    val edges = Seq("15/12/202410:30:00", "115/12/202410:30:00",
      "15/12/202410:30:0015/12/202410:30:00", "15/12/2024 10:30:00",
      "99/99/999999:99:99x")
    // date-shaped generator: mostly digits and /:
    val dateChar = Gen.frequency(8 -> Gen.numChar, 3 -> Gen.oneOf('/', ':'),
      1 -> Gen.oneOf(' ', 'x'))
    val params = Gen.Parameters.default.withSize(100)
    val dateTexts = (0 until 400).flatMap(i =>
      Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, dateChar).map(_.mkString))
        .apply(params, org.scalacheck.rng.Seed(9000L + i)))
    diff("passDateSpacing", Normalizer.passDateSpacing, regex, edges ++ dateTexts)
  }

  test("passCommaFix ≡ (\\d)\\s*,\\s*(\\d{2}) rewrite") {
    def regex(s: String): String = s.replaceAll("(\\d)\\s*,\\s*(\\d{2})", "$1,$2")
    val edges = Seq("1 , 23", "1,234", "1,2,34", "1 ,2,34", "1,23 4 , 56",
      "4 450 , 00", "1 ,, 23", ",12", "1,", "1 , 2")
    diff("passCommaFix", Normalizer.passCommaFix, regex, edges ++ samples(600, 10000L))
  }

  test("passDotFix ≡ (?<=\\d)\\s*\\.\\s*(?=\\d{3}\\b) removal") {
    def regex(s: String): String = s.replaceAll("(?<=\\d)\\s*\\.\\s*(?=\\d{3}\\b)", "")
    val edges = Seq("1.234", "1.2345", "1.234.567", "1 . 234", "1.234,56",
      "1.234x", "1.234_", "1 . . 234", "1.23", ".234", "1.234\u00A0",
      "1.234é", "9.999.999.999")
    diff("passDotFix", Normalizer.passDotFix, regex, edges ++ samples(600, 11000L))
  }

  // ---- whole-kernel differentials ---------------------------------------

  test("fused normalizeText ≡ regex-chain reference on 1,000 adversarial strings") {
    diff("normalizeText", Normalizer.normalizeText,
      Normalizer.normalizeTextReference, samples(1000, 12000L))
  }

  test("fused normalizeText ≡ reference on every real sf0.001 document") {
    val spark = TestSpark.spark
    val texts = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    assert(texts.nonEmpty)
    diff("normalizeText(real docs)", Normalizer.normalizeText,
      Normalizer.normalizeTextReference, texts.toSeq)
  }

  // ---- plan shape ---------------------------------------------------------

  test("normalizeTextCol is one native expression inside WholeStageCodegen, no regex chain") {
    val spark = TestSpark.spark
    import spark.implicits._
    // a real scan: a local Seq constant-folds through ConvertToLocalRelation
    // (which is itself a proof the expression's interpreted eval works)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(Normalizer.normalizeTextCol(col("text")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1) Project [...]": the star is the WholeStageCodegen marker — the
    // projection compiles into the scan's codegen stage
    assert(plan.contains("*(1) Project [graft_normalize_text"), plan)
    assert(!plan.contains("regexp_replace"), plan)
    assert(df.queryExecution.optimizedPlan.toString.contains(
      graft.plans.NormalizeTextExpr.FuncName), df.queryExecution.optimizedPlan.toString)
    // NULL in → NULL out, like the algebra chain it replaced (NULL via a
    // local relation exercises the interpreted path)
    val rows = Seq("NOTA 1 , 23", null).toDF("text")
      .select(Normalizer.normalizeTextCol(col("text")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows(0).contains(Normalizer.normalizeTextReference("NOTA 1 , 23")))
    assert(rows(1).isEmpty)
  }

  test("graft_normalize_text is SQL-callable once registered") {
    val spark = TestSpark.spark
    import spark.implicits._
    graft.plans.NormalizeTextExpr.ensureRegistered(spark)
    Seq("R$ 1.234,56 TOTAL").toDF("t").createOrReplaceTempView("nfs_tmp_norm")
    val out = spark.sql(
      s"SELECT ${graft.plans.NormalizeTextExpr.FuncName}(t) AS n FROM nfs_tmp_norm")
      .collect().head.getString(0)
    assert(out == Normalizer.normalizeTextReference("R$ 1.234,56 TOTAL"))
  }
}
