package graft.operators

import graft.functions.Udfs
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VALIDATE-stage semantics as pure column algebra
  * (ref: robot/orchestrator.py:33-116, 250-290).
  *
  * The reference folds a penalty table into a clamped trust score while
  * collecting ordered issues; here that is a horizontal aggregate over the
  * parsed payload struct — `when`-chains and `greatest`, no shuffle, fused
  * into the same whole-stage-codegen pass as the parse projection. Validator
  * re-runs (the reference re-validates parse output, orchestrator.py:63,93,105)
  * use the same total UDFs as the parser, so semantics cannot drift.
  */
object TrustScoring {

  /** Penalty table (ref: robot/orchestrator.py:34-41). */
  val PenaltyMissingIssuer = 1.0
  val PenaltyInvalidIssuer = 1.0
  val PenaltyMissingTotal = 0.5
  val PenaltyInvalidTotal = 0.3 // literal at orchestrator.py:101
  val PenaltyMissingRecipient = 0.1
  val PenaltyInvalidKey = 0.2

  /** Severity is a static property of the issue code
    * (ref: orchestrator.py:55-111 — MISSING_RECIPIENT, INVALID_KEY and
    * INVALID_TOTAL_FORMAT are warnings, the rest errors). */
  private val WarningCodes = Set("MISSING_RECIPIENT", "INVALID_KEY", "INVALID_TOTAL_FORMAT")

  private def issue(code: String, field: String, message: Column): Column =
    struct(lit(code).as("code"), lit(field).as("field"), message.as("message"),
      lit(if (WarningCodes(code)) "warning" else "error").as("severity"))

  /** The three validator re-runs the VALIDATE stage needs
    * (orchestrator.py:63,93,105), evaluated ONCE into a struct column —
    * materialize this as its own attribute (single-evaluation UDFs) so the
    * many field reads in [[issuesFrom]]/[[scoreFrom]] don't re-invoke the
    * validators through projection collapse. */
  def checksCol(inv: Column): Column =
    Udfs.validateChecks(
      inv.getField("issuer").getField("cnpj_cpf"),
      inv.getField("financials").getField("total"),
      inv.getField("chave_acesso"))

  /** Ordered issue list (ref: robot/orchestrator.py:49-113). `inv` is the
    * payload struct column produced by the parse stage. Convenience form —
    * hot paths use [[issuesFrom]] with a materialized checks attribute. */
  def issuesCol(inv: Column): Column = {
    val cnpjVal = Udfs.cnpjValidate(inv.getField("issuer").getField("cnpj_cpf"))
    val totalVal = Udfs.moneyValidateFiscal(inv.getField("financials").getField("total"))
    val keyVal = Udfs.nfeKeyValidate(inv.getField("chave_acesso"))
    issuesWith(inv, cnpjVal, totalVal, keyVal)
  }

  /** Issues from a pre-evaluated checks struct. */
  def issuesFrom(inv: Column, checks: Column): Column =
    issuesWith(inv, checks.getField("cnpj"), checks.getField("total"), checks.getField("key"))

  private def issuesWith(inv: Column, cnpjVal: Column, totalVal: Column, keyVal: Column): Column = {
    val issuerCnpj = inv.getField("issuer").getField("cnpj_cpf")
    val recipientCnpj = inv.getField("recipient").getField("cnpj_cpf")
    val total = inv.getField("financials").getField("total")
    val chave = inv.getField("chave_acesso")

    val candidates = array(
      when(issuerCnpj.isNull,
        issue("MISSING_ISSUER", "issuer.cnpj_cpf", lit("CNPJ do emitente não encontrado"))),
      when(issuerCnpj.isNotNull && !cnpjVal.getField("valido"),
        issue("INVALID_ISSUER_CNPJ", "issuer.cnpj_cpf",
          concat(lit("CNPJ inválido: "), coalesce(cnpjVal.getField("erro"), lit(""))))),
      when(recipientCnpj.isNull,
        issue("MISSING_RECIPIENT", "recipient", lit("Tomador não identificado"))),
      when(total.isNull,
        issue("MISSING_TOTAL", "financials.total", lit("Valor total não encontrado"))),
      when(total.isNotNull && !totalVal.getField("valido"),
        issue("INVALID_TOTAL_FORMAT", "financials.total",
          concat(lit("Formato inválido: "), coalesce(totalVal.getField("erro"), lit(""))))),
      when(chave.isNotNull && !keyVal.getField("valido"),
        issue("INVALID_KEY", "chave_acesso",
          concat(lit("Chave inválida: "), coalesce(keyVal.getField("erro"), lit("")))))
    )
    filter(candidates, c => c.isNotNull)
  }


  /** Clamped trust score (ref: robot/orchestrator.py:43-116):
    * 1.0 − Σ penalties, floor 0.0, rounded to 2 places like
    * `round(score, 2)` at orchestrator.py:280. Convenience form — hot
    * paths use [[scoreFrom]]. */
  def trustScore(inv: Column): Column =
    scoreWith(inv,
      Udfs.cnpjValidate(inv.getField("issuer").getField("cnpj_cpf")),
      Udfs.moneyValidateFiscal(inv.getField("financials").getField("total")),
      Udfs.nfeKeyValidate(inv.getField("chave_acesso")))

  /** Trust score from a pre-evaluated checks struct. */
  def scoreFrom(inv: Column, checks: Column): Column =
    scoreWith(inv, checks.getField("cnpj"), checks.getField("total"), checks.getField("key"))

  private def scoreWith(inv: Column, cnpjVal: Column, totalVal: Column, keyVal: Column): Column = {
    val issuerCnpj = inv.getField("issuer").getField("cnpj_cpf")
    val recipientCnpj = inv.getField("recipient").getField("cnpj_cpf")
    val total = inv.getField("financials").getField("total")
    val chave = inv.getField("chave_acesso")
    val score = lit(1.0) -
      when(issuerCnpj.isNull, PenaltyMissingIssuer)
        .when(!cnpjVal.getField("valido"), PenaltyInvalidIssuer)
        .otherwise(0.0) -
      when(recipientCnpj.isNull, PenaltyMissingRecipient).otherwise(0.0) -
      when(total.isNull, PenaltyMissingTotal)
        .when(!totalVal.getField("valido"), PenaltyInvalidTotal)
        .otherwise(0.0) -
      when(chave.isNotNull && !keyVal.getField("valido"),
        PenaltyInvalidKey).otherwise(0.0)
    round(greatest(lit(0.0), score), 2)
  }

  /** Status decision (ref: robot/orchestrator.py:257-263): any error-severity
    * issue ⇒ error; any issue or score<1 ⇒ partial; else success. */
  def status(issues: Column, score: Column): Column =
    when(exists(issues, i => i.getField("severity") === "error"), "error")
      .when(size(issues) > 0 || score < 1.0, "partial")
      .otherwise("success")
}
