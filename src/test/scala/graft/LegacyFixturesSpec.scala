package graft

import graft.functions.{InvoiceParser, Normalizer}
import org.scalatest.funsuite.AnyFunSuite

/** The legacy golden corpus (ref: tests/legacy/legacy_parser_reference.py:9-73)
  * with EXACT expected values captured from the reference implementation —
  * including its degradation quirks:
  *   - bare `PRESTADOR`/`TOMADOR` headers do NOT match the block markers
  *     (they require the SERVIÇO suffix / DADOS DO / EMITENTE forms), so
  *     nfe_completa yields NO parties despite having CNPJs;
  *   - bare `DISCRIMINAÇÃO` does not open an ITEMS block, so
  *     documento_sem_cnpj yields no items;
  *   - VALUE_PATTERN's 3-digit cap makes `1.500,00`→(normalized)`1500,00`
  *     match only `500,00`.
  */
class LegacyFixturesSpec extends AnyFunSuite {

  private def parse(text: String) =
    InvoiceParser.extractFromText(Normalizer.normalizeText(text))

  val nfseSimples: String = """
    NOTA FISCAL DE SERVIÇOS ELETRÔNICA - NFS-e

    PRESTADOR DE SERVIÇOS
    EMPRESA ABC CONSULTORIA LTDA
    CNPJ: 04.252.011/0001-10

    TOMADOR DE SERVIÇOS
    CLIENTE XYZ INDÚSTRIA S.A.
    CNPJ: 11.222.333/0001-81

    DISCRIMINAÇÃO DOS SERVIÇOS
    Consultoria em TI - 10 horas      R$ 150,00    R$ 1.500,00
    Treinamento técnico - 5 horas     R$ 200,00    R$ 1.000,00

    DATA DE EMISSÃO: 15/12/2024
    COMPETÊNCIA: 12/2024

    VALOR TOTAL DOS SERVIÇOS: R$ 2.500,00
    """

  test("nfse_simples: full extraction with plain emission date") {
    val r = parse(nfseSimples)
    assert(r.emission_date.contains("15/12/2024"))
    assert(r.competence_date.contains("12/2024"))
    assert(r.issuer.flatMap(_.name).contains("EMPRESA ABC CONSULTORIA LTDA"))
    assert(r.issuer.flatMap(_.cnpj_cpf).contains("04.252.011/0001-10"))
    assert(r.recipient.flatMap(_.name).contains("CLIENTE XYZ INDÚSTRIA S.A"))
    assert(r.recipient.flatMap(_.cnpj_cpf).contains("11.222.333/0001-81"))
    assert(r.financials.total.contains("R$ 2.500,00"))
    assert(r.items.map(_.description) == Seq(
      "Consultoria em TI - 10 horas 1", "Treinamento técnico - 5 horas 1"))
    assert(r.items.flatMap(_.unit_value) == Seq("500,00", "000,00"))
  }

  val nfeCompleta: String = """
    DANFE - DOCUMENTO AUXILIAR DA NOTA FISCAL ELETRÔNICA

    EMISSÃO: 10/12/2024 14:30:00

    PRESTADOR
    FORNECEDOR ABC LTDA
    CNPJ: 33.000.167/0001-01

    TOMADOR
    COMPRADOR XYZ S.A.
    CNPJ: 04.252.011/0001-10

    DISCRIMINAÇÃO DOS PRODUTOS
    Produto A - Unidade: PC - Qtd: 10    R$ 100,00    R$ 1.000,00
    Produto B - Unidade: KG - Qtd: 5     R$ 300,00    R$ 1.500,00

    VALOR TOTAL: R$ 2.500,00
    VALOR LÍQUIDO: R$ 2.500,00
    """

  test("nfe_completa: bare PRESTADOR/TOMADOR headers do not open party blocks") {
    val r = parse(nfeCompleta)
    assert(r.emission_date.contains("10/12/2024 14:30:00"))
    assert(r.competence_date.isEmpty)
    assert(r.issuer.isEmpty)    // quirk: marker needs the SERVIÇO suffix
    assert(r.recipient.isEmpty)
    assert(r.financials.total.contains("R$ 2.500,00")) // via VALOR LÍQUIDO priority
    assert(r.items.map(_.description) == Seq(
      "Produto A - Unidade: PC - Qtd: 10 1", "Produto B - Unidade: KG - Qtd: 5 1"))
    assert(r.items.flatMap(_.unit_value) == Seq("000,00", "500,00"))
  }

  val documentoSemCnpj: String = """
    PRESTADOR DE SERVIÇOS
    Empresa Sem CNPJ
    CNPJ: 12.345.678/0001-00

    TOMADOR
    Cliente Teste
    CNPJ: 11.111.111/1111-11

    DISCRIMINAÇÃO
    Serviço teste    R$ 1.000,00

    TOTAL GERAL: R$ 1.000,00
    """

  test("documento_sem_cnpj: invalid CNPJs degrade, bare DISCRIMINAÇÃO opens no items") {
    val r = parse(documentoSemCnpj)
    assert(r.emission_date.isEmpty && r.competence_date.isEmpty)
    assert(r.issuer.flatMap(_.name).contains("EMPRESA SEM CNPJ"))
    assert(r.issuer.flatMap(_.cnpj_cpf).isEmpty) // checksum-invalid → null
    assert(r.recipient.isEmpty) // bare TOMADOR is not a marker
    assert(r.items.isEmpty)     // bare DISCRIMINAÇÃO is not a marker
    assert(r.financials.total.contains("R$ 1.000,00")) // TOTAL GERAL priority 1
  }
}
