package graft

import graft.functions.Validators._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}

/** Ports the reference validator matrix
  * (ref: tests/unit/test_validators.py) plus ScalaCheck properties for the
  * money parser's locale logic. */
class ValidatorsSpec extends AnyFunSuite {

  private def checkProp(p: Prop): Unit = {
    val res = scCheck(Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // --- CNPJ (ref: tests/unit/test_validators.py:26-80) ---
  test("valid CNPJs pass checksum and format") {
    for (c <- Seq("04.252.011/0001-10", "11.222.333/0001-81", "33.000.167/0001-01")) {
      val v = cnpjValidator(c)
      assert(v.valido, s"$c should be valid: ${v.erro}")
      assert(v.cnpj_formatado.contains(c))
      assert(v.confianca == 95)
    }
  }

  test("matriz vs filial") {
    assert(cnpjValidator("04.252.011/0001-10").tipo.contains("matriz"))
    // same root, branch 0002 with recomputed DVs
    val digits = "042520110002"
    val d1 = Seq(5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2).zip(digits).map { case (p, c) => p * (c - '0') }.sum % 11
    val dv1 = if (d1 < 2) 0 else 11 - d1
    val d2 = Seq(6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2).zip(digits + dv1).map { case (p, c) => p * (c - '0') }.sum % 11
    val dv2 = if (d2 < 2) 0 else 11 - d2
    assert(cnpjValidator(digits + s"$dv1$dv2").tipo.contains("filial"))
  }

  test("invalid CNPJ classes: checksum, length, repetition") {
    assert(!cnpjValidator("12.345.678/0001-00").valido) // bad checksum
    assert(!cnpjValidator("123").valido)                // bad length
    assert(!cnpjValidator("11.111.111/1111-11").valido) // all repeated
    assert(cnpjValidator("11.111.111/1111-11").erro.contains("CNPJ com todos dígitos repetidos"))
    assert(!cnpjValidator("").valido)
  }

  test("unformatted CNPJ accepted") {
    assert(cnpjValidator("04252011000110").valido)
    assert(cnpjValidator("04252011000110").cnpj_formatado.contains("04.252.011/0001-10"))
  }

  // --- currency detection (ref: robot/core/validators.py:52-63) ---
  test("currency detector priority order") {
    assert(currencyDetector("R$ 100,00") == "BRL")
    assert(currencyDetector("$ 1200.50") == "USD")
    assert(currencyDetector("US$ 5.00") == "USD")
    assert(currencyDetector("€ 999,99") == "EUR")
    assert(currencyDetector("£ 500.25") == "GBP")
    assert(currencyDetector("¥ 100000") == "JPY") // JPY shadows CNY for bare ¥
    assert(currencyDetector("RMB 3") == "CNY")
    assert(currencyDetector("400,00") == "BRL") // default
  }

  // --- money matrix (ref: tests/unit/test_validators.py:105-124) ---
  test("multi-currency money matrix") {
    val cases = Seq(
      ("400,00", "BRL", BigDecimal("400.00"), "R$ 400,00"),
      ("R$ 1.234,56", "BRL", BigDecimal("1234.56"), "R$ 1.234,56"),
      ("$ 1200.50", "USD", BigDecimal("1200.50"), "$ 1,200.50"),
      ("€ 999,99", "EUR", BigDecimal("999.99"), "€ 999,99"),
      ("¥ 100000", "JPY", BigDecimal("100000"), "¥ 100,000"),
      ("£ 500.25", "GBP", BigDecimal("500.25"), "£ 500.25")
    )
    for ((in, moeda, dec, fmt) <- cases) {
      val v = monetaryValueValidator(in)
      assert(v.valido, s"$in: ${v.erro}")
      assert(v.moeda.contains(moeda), s"$in moeda=${v.moeda}")
      assert(v.valor_decimal.contains(dec), s"$in dec=${v.valor_decimal}")
      assert(v.valor_formatado.contains(fmt), s"$in fmt=${v.valor_formatado}")
    }
  }

  test("invalid money: negative, alpha, >2 decimals, empty") {
    assert(!monetaryValueValidator("-100,00").valido)
    assert(!monetaryValueValidator("abc").valido)
    // BR path: lone comma becomes the decimal point → 1.2345 → >2 decimals
    assert(monetaryValueValidator("1,2345").erro.contains("Mais de 2 casas decimais"))
    assert(!monetaryValueValidator("").valido)
    assert(!monetaryValueValidator("99999999999,99").valido) // > 1e9
  }

  test("fiscal context rejects foreign currency (ref: test_validators.py:128-162)") {
    val v = monetaryValueValidator("$ 100.00", fiscalContext = true)
    assert(!v.valido && v.confianca == 100)
    assert(monetaryValueValidator("R$ 100,00", fiscalContext = true).valido)
    assert(!monetaryValueValidator("€ 10,00", moedaEsperada = Some("BRL")).valido)
    assert(validatorValorFiscalBrasileiro("1.500,00").valido)
    assert(!validatorValorFiscalBrasileiro("$ 15.00").valido)
  }

  test("BR locale disambiguation (ref: validators.py:287-296)") {
    assert(monetaryValueValidator("1.500,00").valor_decimal.contains(BigDecimal("1500.00")))
    assert(monetaryValueValidator("1500,00").valor_decimal.contains(BigDecimal("1500.00")))
    assert(monetaryValueValidator("$ 1,500.00").valor_decimal.contains(BigDecimal("1500.00")))
  }

  // --- NF-e key layers (ref: tests/unit/test_validators.py:199-229) ---
  test("nfe key: valid key round trip") {
    val k = "35241204252011000110550010000000011000000070"
    val v = nfeKeyValidator(k)
    assert(v.valido, v.erro.toString)
    assert(v.uf.contains("35"))
    assert(v.ano_mes.contains("2024-12"))
    assert(v.modelo.contains("NF-e"))
    assert(v.cnpj_emitente.contains("04.252.011/0001-10"))
    assert(v.chave_formatada.contains(k.grouped(4).mkString(" ")))
    assert(v.confianca == 90)
  }

  test("nfe key failure layers") {
    // prefix(22) + 21 filler digits + 1 DV digit = 44
    def key(uf: String, aamm: String, cnpj: String, modelo: String) =
      uf + aamm + cnpj + modelo + "0" * 21 + "0"
    assert(nfeKeyValidator("123").erro.get.contains("44 dígitos"))
    assert(nfeKeyValidator(key("99", "2412", "04252011000110", "55")).erro.get.contains("UF"))
    assert(nfeKeyValidator(key("35", "9912", "04252011000110", "55")).erro.get.contains("implausível"))
    assert(nfeKeyValidator(key("35", "2413", "04252011000110", "55")).erro.get.contains("Mês"))
    assert(nfeKeyValidator(key("35", "2412", "04252011000110", "99")).erro.get.contains("Modelo"))
    assert(nfeKeyValidator(key("35", "2412", "04252011000111", "55")).erro.get.contains("CNPJ"))
    // bad check digit (fixture: tests/unit/test_validators.py:199-229)
    assert(nfeKeyValidator("35241204252011000110550010000012345012345678").erro.get.contains("verificador"))
  }

  test("century pivot: year digits < 8 map to 21xx (ref: validators.py:169)") {
    def key(aamm: String) = "35" + aamm + "04252011000110" + "55" + "0" * 21 + "0"
    // 07 ⇒ 2107, out of the 2008..2030 window ⇒ invalid
    assert(nfeKeyValidator(key("0712")).erro.get.contains("2107"))
    // 08 ⇒ 2008, plausible (must not fail at the year layer)
    assert(nfeKeyValidator(key("0812")).erro.forall(!_.contains("implausível")))
  }

  test("every validator returns confianca in [0,100] (ref: test_validators.py:256-268)") {
    val inputs = Seq("04.252.011/0001-10", "bogus", "", "11.111.111/1111-11")
    inputs.foreach(i => assert((0 to 100).contains(cnpjValidator(i).confianca)))
    Seq("R$ 1,00", "-5", "x", "1.500,00").foreach(i =>
      assert((0 to 100).contains(monetaryValueValidator(i).confianca)))
  }

  // --- ScalaCheck: locale round-trip property (upgrade over the reference) ---
  test("property: BR-formatted cents round-trip through the validator") {
    checkProp(Prop.forAll(Gen.chooseNum(0L, 99999999999L)) { cents =>
      val br = s"${cents / 100},${"%02d".format(cents % 100)}"
      val v = monetaryValueValidator(br)
      v.valido && v.valor_decimal.contains(BigDecimal(cents) / 100)
    })
  }

  test("property: US-formatted cents parse identically under USD") {
    checkProp(Prop.forAll(Gen.chooseNum(0L, 99999999999L)) { cents =>
      val us = s"$$ ${cents / 100}.${"%02d".format(cents % 100)}"
      val v = monetaryValueValidator(us)
      v.valido && v.moeda.contains("USD") && v.valor_decimal.contains(BigDecimal(cents) / 100)
    })
  }
}
