package graft

import graft.functions.{InvoiceParser, Normalizer, Validators}
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized consistency + totality guards:
  *   - the pure-Scala and Column normalizers must agree on ARBITRARY input
  *     (the cross-check fixtures in NormalizerSpec are hand-picked; this
  *     fuzzes the space with fiscal-document-ish alphabets);
  *   - every parser/validator entry point must be total (risk register
  *     §7.4.4: a UDF exception kills a Spark task).
  */
class FuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  /** Alphabet biased toward the pipeline's sensitive characters. */
  private val fiscalChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\u2009', '\t', '\n', '\r'), // thin space: a distinct whitespace edge
    2 -> Gen.oneOf('.', ',', '/', '-', ':', '$'),
    2 -> Gen.oneOf('0', '1', '5', '9'),
    1 -> Gen.oneOf('ç', 'Ã', 'É', 'ã', 'é', 'Ç', 'í'),
    1 -> Gen.oneOf(' ', '​', ' ', ''),
    1 -> Gen.oneOf('R', '¥', '€', '£'))
  private val fiscalText: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, fiscalChar).map(_.mkString))

  private def samples(n: Int): Seq[String] = {
    val params = Gen.Parameters.default.withSize(100)
    (0 until n).flatMap(i =>
      fiscalText.apply(params, org.scalacheck.rng.Seed(i.toLong)))
  }

  test("fused kernel, regex reference, and both Column normalizers agree on 400 random fiscal-ish strings") {
    val inputs = samples(400)
    val df = inputs.toDF("text")
    val fromExpr = df
      .select(Normalizer.normalizeTextCol(col("text")).as("n"))
      .collect().map(_.getString(0))
    val fromAlgebra = df
      .select(Normalizer.normalizeTextColAlgebra(col("text")).as("n"))
      .collect().map(_.getString(0))
    inputs.indices.foreach { i =>
      val in = inputs(i)
      // the regex chain is the specification; everything must match IT
      val want = Normalizer.normalizeTextReference(in)
      val hex = in.take(60).map(c => f"\\u${c.toInt}%04x").mkString
      assert(Normalizer.normalizeText(in) == want, s"fused kernel diverged for $hex")
      assert(fromExpr(i) == want, s"NormalizeTextExpr diverged for $hex")
      assert(fromAlgebra(i) == want, s"column algebra diverged for $hex")
    }
  }

  test("parser is total and idempotent on random input") {
    samples(300).foreach { s =>
      val r1 = InvoiceParser.extractFromText(s)
      val r2 = InvoiceParser.extractFromText(s)
      assert(r1 == r2)
    }
  }

  test("validators are total on random input") {
    checkProp(Prop.forAll(fiscalText) { s =>
      Validators.cnpjValidator(s).confianca >= 0 &&
      Validators.nfeKeyValidator(s).confianca >= 0 &&
      Validators.monetaryValueValidator(s).confianca >= 0 &&
      Validators.currencyDetector(s).nonEmpty
    })
  }

  test("block segmentation is total and spans the input") {
    samples(300).foreach { s =>
      val blocks = InvoiceParser.extractBlocks(s)
      assert(blocks.keySet == Set("HEADER", "ISSUER", "RECIPIENT", "ITEMS", "FINANCIALS"))
      // every block is a substring of the input (or empty)
      blocks.values.filter(_.nonEmpty).foreach(b =>
        assert(b.split("\n").forall(seg => seg.isEmpty || s.contains(seg.take(20)))))
    }
  }

  private def checkProp(p: Prop): Unit = {
    val res = scCheck(Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }
}
