package graft

import graft.functions.{InvoiceParser, Normalizer}
import org.scalatest.funsuite.AnyFunSuite

/** Golden e2e parse of the canonical NFS-e fixture
  * (ref: tests/e2e/test_pipeline_core.py:56-148) with EXACT expected values
  * captured from the reference implementation, plus the block/party unit
  * tests (ref: tests/unit/test_parser_blocks.py). */
class InvoiceParserSpec extends AnyFunSuite {

  /** Verbatim fixture (ref: tests/e2e/test_pipeline_core.py:62-95). */
  val textoNfseCompleto: String = """
    PREFEITURA MUNICIPAL DE SÃO PAULO
    NOTA FISCAL DE SERVIÇOS ELETRÔNICA - NFS-e

    Número: 123456
    Data de Emissão: 15/12/2024 10:30:00
    Competência: 12/2024

    PRESTADOR DE SERVIÇOS
    EMPRESA ABC TECNOLOGIA LTDA
    CNPJ: 04.252.011/0001-10
    Inscrição Municipal: 123.456.789-0
    Endereço: Rua Teste, 123 - São Paulo/SP

    TOMADOR DE SERVIÇOS
    CLIENTE XYZ INDÚSTRIA S.A.
    CNPJ: 11.222.333/0001-81
    Endereço: Av Principal, 456 - São Paulo/SP

    DISCRIMINAÇÃO DOS SERVIÇOS
    Desenvolvimento de software customizado        10 HRS    R$ 200,00    R$ 2.000,00
    Consultoria em arquitetura de sistemas         5 HRS    R$ 250,00    R$ 1.250,00
    Treinamento técnico da equipe                  8 HRS    R$ 150,00    R$ 1.200,00

    VALOR TOTAL DOS SERVIÇOS: R$ 4.450,00

    TRIBUTOS:
    ISS (5%): R$ 222,50

    VALOR LÍQUIDO: R$ 4.227,50

    OBSERVAÇÕES:
    Serviços prestados conforme contrato 2024/001
    """

  lazy val norm: String = Normalizer.normalizeText(textoNfseCompleto)
  lazy val result = InvoiceParser.extractFromText(norm, Some("nfse_sample.txt"))

  test("normalization strips thousands dots inside CNPJs (observed reference behavior)") {
    assert(norm.contains("CNPJ: 04252011/0001-10"))
    assert(norm.contains("R$ 4450,00"))
    assert(norm.startsWith("PREFEITURA MUNICIPAL"))
  }

  test("golden: dates") {
    assert(result.emission_date.contains("15/12/2024 10:30:00"))
    assert(result.competence_date.contains("12/2024"))
  }

  test("golden: issuer") {
    assert(result.issuer.flatMap(_.name).contains("EMPRESA ABC TECNOLOGIA LTDA"))
    assert(result.issuer.flatMap(_.cnpj_cpf).contains("04.252.011/0001-10"))
  }

  test("golden: recipient (trailing-dot strip of S.A.)") {
    assert(result.recipient.flatMap(_.name).contains("CLIENTE XYZ INDÚSTRIA S.A"))
    assert(result.recipient.flatMap(_.cnpj_cpf).contains("11.222.333/0001-81"))
  }

  test("golden: items — exact descriptions and the 000,00 partial-token quirk") {
    assert(result.items.length == 3)
    val it = result.items
    assert(it(0).description == "Desenvolvimento de software customizado 10 HRS 2")
    assert(it(0).unit_value.contains("000,00")) // VALUE_PATTERN can only bite 3 digits of 2000,00
    assert(it(0).raw.contains("Desenvolvimento de software customizado 10 HRS R$ 200,00 R$ 2000,00"))
    assert(it(1).description == "Consultoria em arquitetura de sistemas 5 HRS 1")
    assert(it(1).unit_value.contains("250,00"))
    assert(it(2).description == "Treinamento técnico da equipe 8 HRS 1")
    assert(it(2).unit_value.contains("200,00"))
  }

  test("golden: total — VALOR LÍQUIDO outranks VALOR TOTAL (ref: parser.py:304-309)") {
    assert(result.financials.total.contains("R$ 4.227,50"))
  }

  test("golden: no access key in fixture; raw_text preserved") {
    assert(result.chave_acesso.isEmpty)
    assert(result.raw_text.length > 100)
    assert(result.source_filename.contains("nfse_sample.txt"))
  }

  // --- block segmentation (ref: tests/unit/test_parser_blocks.py:22-49) ---
  test("blocks do not leak into neighbors") {
    val blocks = InvoiceParser.extractBlocks(norm)
    assert(blocks("HEADER").contains("PREFEITURA"))
    assert(blocks("ISSUER").contains("ABC TECNOLOGIA"))
    assert(!blocks("ISSUER").contains("XYZ"))
    assert(blocks("RECIPIENT").contains("XYZ"))
    assert(!blocks("RECIPIENT").contains("Desenvolvimento"))
    assert(blocks("ITEMS").contains("Desenvolvimento"))
    assert(!blocks("ITEMS").contains("4450,00"))
    assert(blocks("FINANCIALS").contains("4450,00"))
  }

  test("no markers ⇒ whole text is HEADER (ref: parser.py:171-174)") {
    val blocks = InvoiceParser.extractBlocks("texto sem marcadores conhecidos")
    assert(blocks("HEADER") == "texto sem marcadores conhecidos")
    assert(blocks("ISSUER") == "")
  }

  test("duplicate PRESTADOR blocks concatenate (ref: legacy_parser_reference.py:305-325)") {
    val txt = "PRESTADOR DE SERVIÇOS\nEMPRESA UM LTDA\nEMITENTE DA NFS-e\nEMPRESA DOIS LTDA"
    val blocks = InvoiceParser.extractBlocks(txt)
    assert(blocks("ISSUER").contains("EMPRESA UM") && blocks("ISSUER").contains("EMPRESA DOIS"))
  }

  // --- party name cleaning (ref: tests/unit/test_parser_blocks.py:8-20) ---
  test("stopword-only names rejected") {
    assert(InvoiceParser.cleanPartyName("PRESTADOR DE SERVIÇOS").isEmpty)
    assert(InvoiceParser.cleanPartyName("DADOS DO PRESTADOR").isEmpty)
    assert(InvoiceParser.cleanPartyName("CNPJ CPF NIF").isEmpty)
    assert(InvoiceParser.cleanPartyName("").isEmpty)
    assert(InvoiceParser.cleanPartyName("   ").isEmpty)
    assert(InvoiceParser.cleanPartyName("EMPRESA ABC LTDA").contains("EMPRESA ABC LTDA"))
    assert(InvoiceParser.cleanPartyName("  empresa   abc ltda.  ").contains("EMPRESA ABC LTDA"))
  }

  test("real-layout positional trap: name after CNPJ/CPF/NIF label (ref: test_parser_blocks.py:51-79)") {
    val block = """PRESTADOR DE SERVIÇOS
CNPJ / CPF / NIF
27.865.757/0001-02
PEST COMBAT GESTAO AMBIENTAL LTDA
RUA EXEMPLO, 123"""
    val party = InvoiceParser.extractPartyFromBlock(block)
    assert(party.flatMap(_.name).contains("PEST COMBAT GESTAO AMBIENTAL LTDA"))
    assert(party.flatMap(_.cnpj_cpf).contains("27.865.757/0001-02"))
  }

  // --- degradation (ref: tests/e2e/test_pipeline_robustez.py:71-97) ---
  test("incomplete document degrades to None, never throws") {
    val r = InvoiceParser.extractFromText("DOCUMENTO VAZIO SEM DADOS FISCAIS")
    assert(r.issuer.isEmpty || r.issuer.flatMap(_.cnpj_cpf).isEmpty)
    assert(r.financials.total.isEmpty)
    assert(r.chave_acesso.isEmpty)
    assert(r.items.isEmpty)
  }

  test("empty document → all-None (ref: legacy_parser_reference.py:264-280)") {
    val r = InvoiceParser.extractFromText("")
    assert(r.emission_date.isEmpty && r.competence_date.isEmpty && r.chave_acesso.isEmpty)
    assert(r.items.isEmpty)
  }

  test("checksum-invalid CNPJs yield cnpj_cpf=null (ref: legacy_parser_reference.py:60-73)") {
    val block = "PRESTADOR DE SERVIÇOS\nEMPRESA TESTE LTDA\nCNPJ: 12.345.678/0001-00"
    val party = InvoiceParser.extractPartyFromBlock(block)
    assert(party.flatMap(_.cnpj_cpf).isEmpty)
    assert(party.flatMap(_.name).contains("EMPRESA TESTE LTDA"))
  }

  test("idempotence: same input ⇒ identical output (ref: test_pipeline_robustez.py:50-68)") {
    val r1 = InvoiceParser.extractFromText(norm)
    val r2 = InvoiceParser.extractFromText(norm)
    assert(r1 == r2)
  }

  test("valid access key found globally (ref: parser.py:78-85)") {
    val key = "35241204252011000110550010000000011000000070"
    val txt = s"NOTA FISCAL\nCHAVE DE ACESSO: $key\nPRESTADOR DE SERVIÇOS\nEMPRESA X LTDA"
    val r = InvoiceParser.extractFromText(txt)
    assert(r.chave_acesso.contains(key.grouped(4).mkString(" ")))
  }

  test("mojibake must not crash (ref: legacy_parser_reference.py:283-302)") {
    val r = InvoiceParser.extractFromText("NOTA Ã‡Ã£o FISCAL � dados")
    assert(r.raw_text.nonEmpty)
  }
}
