package graft

import graft.functions.Normalizer
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Ports tests/unit/test_normalizer.py and cross-checks the pure-Scala and
  * Column implementations against each other. */
class NormalizerSpec extends AnyFunSuite {

  // ref: tests/unit/test_normalizer.py:6-15 — unicode noise fixture
  val noisy: String =
    "NOTA FISCAL​ ELETRONICA\n" +
      "VALOR: 400 , 00\n" +
      "VALOR: 400 , 00\n" +
      "AB\n" +
      "SP\n" +
      "DATA: 15/12/2024 10:30:00\n"

  test("unicode removal, spaced money tightened, digits survive") {
    val out = Normalizer.normalizeText(noisy)
    assert(!out.contains(" ") && !out.contains("​"))
    assert(out.contains("400,00"))
    assert(out.contains("15/12/2024"))
  }

  test("order-preserving dedup keeps one copy (ref: test_normalizer.py:25)") {
    val out = Normalizer.normalizeText(noisy)
    assert(out.split("\n").count(_.contains("400,00")) == 1)
  }

  test("noise lines dropped, siglas kept") {
    val out = Normalizer.normalizeText(noisy).split("\n")
    assert(!out.contains("AB")) // <3 effective chars? 'AB' is len 2, no digit, not a sigla
    assert(out.contains("SP")) // UF sigla whitelisted
  }

  test("glued date+time re-split (ref: text_normalizer.py:52-61)") {
    val out = Normalizer.normalizeText("EMISSAO: 15/12/2024 10:30:00\n")
    assert(out.contains("15/12/2024 10:30:00"))
  }

  test("join_split_numbers merges digit runs across whitespace") {
    assert(Normalizer.normalizeText("TOTAL 4 450 , 00 FIM") == "TOTAL 4450,00 FIM")
  }

  test("thousands dots removed, decimal comma kept") {
    assert(Normalizer.normalizeText("R$ 1.234,56") == "R$ 1234,56")
    assert(Normalizer.normalizeText("R$ 4.450,00") == "R$ 4450,00")
  }

  test("empty and whitespace-only input") {
    assert(Normalizer.normalizeText("") == "")
    assert(Normalizer.normalizeText("   \n\n  ") == "")
  }

  test("column implementation matches pure-Scala on a fixture corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val fixtures = Seq(
      noisy,
      "EMISSAO: 15/12/2024 10:30:00",
      "a\nb\nc\na\nb",
      "linha com  espacos   multiplos",
      "1 2 3 4 5",
      "R$ 1.234,56 e R$ 1 . 500 , 00",
      "", "SP\nRJ\nXX\nAB1",
      "linha\n\n\n\nlinha2",
      "CNPJ: 04.252.011/0001-10"
    )
    val df = fixtures.toDF("text")
    val rows = df
      .select(Normalizer.normalizeTextCol(col("text")).as("norm"))
      .collect()
      .map(_.getString(0))
    val algebra = df
      .select(Normalizer.normalizeTextColAlgebra(col("text")).as("norm"))
      .collect()
      .map(_.getString(0))
    val expected = fixtures.map(Normalizer.normalizeText)
    rows.zip(expected).zip(fixtures).foreach { case ((got, want), in) =>
      assert(got == want, s"mismatch for input ${in.take(40)}: got=[$got] want=[$want]")
    }
    algebra.zip(expected).zip(fixtures).foreach { case ((got, want), in) =>
      assert(got == want, s"algebra mismatch for ${in.take(40)}: got=[$got] want=[$want]")
    }
  }

  test("array_distinct preserves first-occurrence order (risk register §7.4.2)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Seq(Seq("b", "a", "b", "c", "a")).toDF("arr")
      .select(array_distinct(col("arr")).as("d")).collect()(0).getSeq[String](0)
    assert(out == Seq("b", "a", "c"))
  }
}
