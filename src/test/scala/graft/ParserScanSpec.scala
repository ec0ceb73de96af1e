package graft

import graft.functions.{InvoiceParser, ParserScan}
import graft.operators.{BlockSegmentation, InvoicePipeline}
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** The prefilter scans vs their executable specifications — the direct
  * regex loops they replace ([[InvoiceParser.extractBlocksReference]],
  * [[BlockSegmentation.lineCountsReference]], plain `while (m.find())`
  * collection for the digit-anchored patterns).
  *
  * Generators are biased to the scans' sensitive inputs: marker spellings
  * under random per-char casing including the Unicode-fold corners the
  * `(?iu)` patterns accept ('ı' folds to I, 'ſ' to S), truncated marker
  * prefixes, NBSP where the regex's ASCII `\s+` must NOT match, digit runs
  * at and around the 44-digit key length, word chars against `\b`, and the
  * `1234,56` backtracking shape where a match starts MID-digit-run. */
class ParserScanSpec extends AnyFunSuite {

  // ---- generators -------------------------------------------------------

  private val markerWords = Seq(
    "PRESTADOR DE SERVIÇO", "PRESTADOR DO SERVICO", "PRESTADORSERVIÇO",
    "DADOS DO PRESTADOR", "DADOS  DO\tTOMADOR", "EMITENTE",
    "TOMADOR DE SERVIÇO", "TOMADOR   DO SERVICO", "DESTINATÁRIO", "DESTINATARIO",
    "DISCRIMINAÇÃO DOS SERVIÇOS", "DISCRIMINACAO DE PRODUTOS",
    "DESCRIÇÃO DOS SERVIÇOS", "DESCRICAO DOS SERVICOS",
    "VALOR TOTAL", "TOTAL GERAL", "TRIBUTAÇÃO", "TRIBUTACAO",
    "TOTAL DO SERVIÇO", "TOTAL DO SERVICO",
    // near-misses: prefixes that must NOT match, NBSP that ASCII \s+ rejects
    "PRESTADO", "DADOS DA EMPRESA", "EMITENT", "TOTAL", "VALOR UNITÁRIO",
    "PRESTADOR DE SERVIÇO", "TOTAL GERAL", "DESTINAT", "DISCRIMINA",
    // fold corners: 'ı' (dotless i) matches I under (?iu); 'ſ' (long s) matches S
    "PREſTADOR DE ſERVIÇO", "DEſTINATÁRıO", "DıSCRıMıNAÇÃO DOS SERVıÇOS",
    "TRıBUTAÇÃO", "VALOR TOTAL".toLowerCase)

  private def randomCase(s: String, seed: Long): String = {
    val r = new scala.util.Random(seed)
    s.map(c => if (r.nextBoolean()) Character.toUpperCase(c)
               else Character.toLowerCase(c))
  }

  private val fragment: Gen[String] = Gen.frequency(
    5 -> Gen.oneOf(markerWords),
    3 -> Gen.oneOf(markerWords).flatMap(w =>
      Gen.chooseNum(0L, 1L << 40).map(randomCase(w, _))),
    3 -> Gen.oneOf("NOTA FISCAL", "R$ 1.234,56", "12.345.678/0001-95",
      "04252011000110", "15/12/2024", "xyz", "\n", "\n\n", "  ", ": "),
    1 -> Gen.oneOf("٤٢", "𝟒", "ß", "_", "a1b2"))

  private def markerTexts(n: Int, seedBase: Long = 31000L): Seq[String] = {
    val g = Gen.chooseNum(0, 14).flatMap(k =>
      Gen.listOfN(k, fragment).map(_.mkString(" ")))
    val params = Gen.Parameters.default.withSize(100)
    (0 until n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(seedBase + i)))
  }

  private val digitChar: Gen[Char] = Gen.frequency(
    8 -> Gen.oneOf('0', '3', '9'),
    3 -> Gen.oneOf('.', ',', '/', '-', ' '),
    2 -> Gen.oneOf('a', 'Z', '_', 'R', '$'),
    1 -> Gen.oneOf('٤', 'é', ' '))

  private def digitTexts(n: Int, seedBase: Long = 47000L): Seq[String] = {
    val g = Gen.frequency(
      // free-form digit-dense noise
      4 -> Gen.chooseNum(0, 80).flatMap(k => Gen.listOfN(k, digitChar).map(_.mkString)),
      // runs hovering around the 44-digit key length, with boundary chars
      3 -> (for {
        len <- Gen.chooseNum(42, 46)
        pre <- Gen.oneOf("", " ", "a", "_", "9", "٤", ".")
        post <- Gen.oneOf("", " ", "b", "_", "0", "٤", ",")
      } yield pre + "4" * len + post),
      // CNPJ shapes, valid and mangled
      2 -> Gen.oneOf("12.345.678/0001-95", "04252011000110", "04.252.011/0001-10",
        "x04.252.011/0001-10y", "904.252.011/0001-109", "12.345.678/0001",
        "R$ 1.234,56", "TOTAL: 1234,56", "1234,56", "12.345,678", "1,23",
        "R$1.234.567,89 e R$ 0,01", "5R$ 1,00"))
    val params = Gen.Parameters.default.withSize(100)
    (0 until n).flatMap(i => g.apply(params, org.scalacheck.rng.Seed(seedBase + i)))
  }

  /** Plain reference findall: `while (m.find())`, group 1 if present. */
  private def refFindAll(p: Pattern, text: String): List[String] = {
    val m = p.matcher(text)
    val out = ArrayBuffer.empty[String]
    while (m.find()) out += (if (m.groupCount() > 0) m.group(1) else m.group())
    out.toList
  }

  private lazy val realTexts: Seq[String] = {
    val spark = TestSpark.spark
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val invoices = InvoicePipeline.syntheticCorpus(spark, "/root/testdata/sf0.001")
      .select("text").collect().map(_.getString(0)).toSeq
    docs ++ invoices ++ invoices.map(graft.functions.Normalizer.normalizeText)
  }

  // ---- block markers -----------------------------------------------------

  test("marker table: every pattern matches at its scan prefix on real corpus hits") {
    // construction already threw if a pattern lacked a known prefix; here
    // pin that the prefilter finds every hit the reference finds (superset
    // impossible: every candidate is regex-verified)
    assert(ParserScan.Markers.length == 12)
  }

  test("extractBlocks ≡ reference on adversarial marker texts") {
    (markerTexts(800) ++ Seq("", "P", "PR", "pre", "TOTAL GERAL",
      "\nVALOR TOTAL\n", "DADOS DO PRESTADOR DADOS DO TOMADOR",
      "TOTAL DO TOTAL DO SERVIÇO", "VALOR TOTAL GERAL",
      "valor total do serviço", "PREſTADOR DE SERVIÇO: ſ")).foreach { t =>
      val got = InvoiceParser.extractBlocks(t)
      val want = InvoiceParser.extractBlocksReference(t)
      if (got != want) fail(s"extractBlocks diverged for ${t.take(120)}\n got: $got\nwant: $want")
    }
  }

  test("extractBlocks ≡ reference on every real document and invoice") {
    realTexts.foreach { t =>
      assert(InvoiceParser.extractBlocks(t) == InvoiceParser.extractBlocksReference(t))
    }
  }

  test("lineCounts ≡ merged-alternation reference on adversarial and real texts") {
    (markerTexts(400, 33000L) ++ realTexts).foreach { t =>
      val got = BlockSegmentation.lineCounts(t)
      val want = BlockSegmentation.lineCountsReference(t)
      if (got != want) fail(s"lineCounts diverged for ${t.take(120)}\n got: $got\nwant: $want")
    }
  }

  // ---- digit-anchored scans ----------------------------------------------

  test("digitAnchoredFindAll(KeyPattern, boundary) ≡ find() loop") {
    (digitTexts(800) ++ realTexts).foreach { t =>
      val got = ParserScan.digitAnchoredFindAll(InvoiceParser.KeyPattern, t, boundaryStart = true)
      val want = refFindAll(InvoiceParser.KeyPattern, t)
      if (got != want) fail(s"key scan diverged for ${t.take(120)}\n got: $got\nwant: $want")
    }
  }

  test("digitAnchoredFindAll(CnpjPattern, boundary) ≡ find() loop") {
    (digitTexts(800, 48000L) ++ realTexts).foreach { t =>
      val got = ParserScan.digitAnchoredFindAll(InvoiceParser.CnpjPattern, t, boundaryStart = true)
      val want = refFindAll(InvoiceParser.CnpjPattern, t)
      if (got != want) fail(s"cnpj scan diverged for ${t.take(120)}\n got: $got\nwant: $want")
    }
  }

  test("digitAnchoredFindAll(ValuePattern) ≡ find() loop incl. mid-run starts") {
    // "1234,56": the full pattern's leftmost match starts at the SECOND
    // digit (\d{1,3} exhausts backtracking at the first) — the scan must
    // try every digit position, not just run starts
    val edges = Seq("1234,56", "12345,67", "999.1234,56", "R$ 1234,56",
      "1.234.567,89", ",56", "1,2,3", "12,34,56")
    (edges ++ digitTexts(800, 49000L) ++ realTexts).foreach { t =>
      val got = ParserScan.digitAnchoredFindAll(InvoiceParser.ValuePattern, t, boundaryStart = false)
      val want = refFindAll(InvoiceParser.ValuePattern, t)
      if (got != want) fail(s"value scan diverged for ${t.take(120)}\n got: $got\nwant: $want")
    }
  }

  // ---- digitsOnly ---------------------------------------------------------

  test("digitsOnly ≡ replaceAll(\\\\D) incl. unicode digits and surrogates") {
    val edges = Seq("", "abc", "123", "a1b2c3", "٤٢", "𝟒",
      "1𝟒2", "\uD835", "\uDFD2", "12.345.678/0001-95")
    (edges ++ digitTexts(400, 50000L)).foreach { s =>
      assert(ParserScan.digitsOnly(s) == s.replaceAll("\\D", ""),
        s"digitsOnly diverged for ${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("removeAccents ASCII fast path ≡ NFKD+Mn strip") {
    def ref(s: String) = java.util.regex.Pattern.compile("\\p{Mn}")
      .matcher(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD))
      .replaceAll("")
    val edges = Seq("", "ACME LTDA", "AÇÃO É", "café", "ﬁ", "½", "ſ", "ı",
      "EMPRESA ÀÉÎÕÜ ME", " ", "á")
    (edges ++ markerTexts(200, 51000L)).foreach { s =>
      assert(InvoiceParser.removeAccents(s) == ref(s),
        s"removeAccents diverged for ${s.take(80)}")
    }
  }
}
