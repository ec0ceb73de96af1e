package graft.model

/** Typed data model mirroring the reference's record catalog
  * (ref: robot/schema/models.py:4-45, robot/schema/orchestrator_models.py:6-49).
  *
  * Monetary values and dates are deliberately carried as *strings* end-to-end
  * — the reference's internal contract forbids the parser from converting to
  * float (ref: tests/contract/internal_core_contract.md:13-21); validated
  * decimals live in parallel columns instead.
  */

/** One extracted invoice line item (ref: robot/schema/models.py:4-10). */
case class Item(
    description: String,
    quantity: Option[Double] = None,
    unit: Option[String] = None,
    unit_value: Option[String] = None,
    cfop: Option[String] = None,
    raw: Option[String] = None
)

/** Issuer/recipient party (ref: robot/schema/models.py:19-25). */
case class Party(
    name: Option[String] = None,
    cnpj_cpf: Option[String] = None,
    address: Option[String] = None,
    municipal_insc: Option[String] = None,
    email: Option[String] = None,
    phone: Option[String] = None
)

/** Financial summary (ref: robot/schema/models.py:13-16). */
case class Financials(
    total: Option[String] = None,
    taxes: Option[Map[String, String]] = None,
    payment_method: Option[String] = None
)

/** Full extraction payload (ref: robot/schema/models.py:28-45). */
case class InvoiceExtractionResult(
    emission_date: Option[String],
    competence_date: Option[String],
    chave_acesso: Option[String],
    issuer: Option[Party],
    recipient: Option[Party],
    items: Seq[Item],
    financials: Financials,
    raw_text: String,
    tenant_id: Option[String] = None,
    source_filename: Option[String] = None
)

/** One semantic validation finding
  * (ref: robot/schema/orchestrator_models.py:6-10). severity ∈ {warning,error}. */
case class ValidationIssue(
    code: String,
    field: String,
    message: String,
    severity: String
)

/** CNPJ validation outcome (ref: robot/core/validators.py:65-122).
  * `tipo` ∈ {matriz, filial}; confianca ∈ [0,100]. */
case class CnpjValidation(
    valido: Boolean,
    erro: Option[String] = None,
    cnpj_limpo: Option[String] = None,
    cnpj_formatado: Option[String] = None,
    tipo: Option[String] = None,
    confianca: Int = 100
)

/** NF-e access-key validation outcome (ref: robot/core/validators.py:126-234). */
case class NfeKeyValidation(
    valido: Boolean,
    erro: Option[String] = None,
    chave_limpa: Option[String] = None,
    chave_formatada: Option[String] = None,
    uf: Option[String] = None,
    ano_mes: Option[String] = None,
    cnpj_emitente: Option[String] = None,
    modelo: Option[String] = None,
    confianca: Int = 100
)

/** The VALIDATE stage's three re-validations, fused into one struct so a
  * single UDF call produces them (field names are the column names
  * TrustScoring reads). */
case class TrustChecks(
    cnpj: CnpjValidation,
    total: MoneyValidation,
    key: NfeKeyValidation
)

/** Monetary-value validation outcome (ref: robot/core/validators.py:239-357).
  * `valor_decimal` quantized to 2 decimal places on the valid path. */
case class MoneyValidation(
    valido: Boolean,
    erro: Option[String] = None,
    valor_decimal: Option[BigDecimal] = None,
    valor_formatado: Option[String] = None,
    moeda: Option[String] = None,
    fiscal_brasil: Option[Boolean] = None,
    confianca: Int = 100
)
