package graft.functions

import graft.model.InvoiceExtractionResult
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Registered UDF surface of the engine (SURVEY §2.12).
  *
  * All UDFs wrap total functions — they never throw, so a malformed value
  * degrades the row instead of killing the task (risk register §7.4.4).
  * Struct-returning: one call per document/value, encoder-derived schemas.
  */
object Udfs {

  /** CNPJ checksum validation → struct (ref: robot/core/validators.py:65-122). */
  val cnpjValidate: UserDefinedFunction =
    udf((s: String) => Validators.cnpjValidator(if (s == null) "" else s))

  /** NF-e access-key validation → struct (ref: robot/core/validators.py:126-234). */
  val nfeKeyValidate: UserDefinedFunction =
    udf((s: String) => Validators.nfeKeyValidator(if (s == null) "" else s))

  /** Monetary validation, generic context (ref: robot/core/validators.py:239-357). */
  val moneyValidate: UserDefinedFunction =
    udf((s: String) => Validators.monetaryValueValidator(if (s == null) "" else s))

  /** Monetary validation under Brazilian fiscal rules
    * (ref: robot/core/validators.py:361-370). */
  val moneyValidateFiscal: UserDefinedFunction =
    udf((s: String) => Validators.validatorValorFiscalBrasileiro(if (s == null) "" else s))

  /** Currency detection (ref: robot/core/validators.py:52-63). */
  val currencyDetect: UserDefinedFunction =
    udf((s: String) => Validators.currencyDetector(if (s == null) "" else s))

  /** Accent strip (ref: robot/core/parser.py:18-20). */
  val removeAccents: UserDefinedFunction =
    udf((s: String) => if (s == null) null else InvoiceParser.removeAccents(s))

  /** Party-name normalization + stopword rejection
    * (ref: robot/core/parser.py:32-70). */
  val cleanPartyName: UserDefinedFunction =
    udf((s: String) => InvoiceParser.cleanPartyName(if (s == null) "" else s))

  /** Full block-segmentation parse of ALREADY-NORMALIZED text → payload
    * struct (ref: robot/core/parser.py:321-379). Document-local; pairs with
    * [[Normalizer.normalizeTextCol]] for the EP1 pipeline. */
  val parseInvoice: UserDefinedFunction =
    udf((text: String, src: String) =>
      InvoiceParser.extractFromText(if (text == null) "" else text, Option(src)))

  /** Fused normalize→parse in one UDF call, marked non-deterministic.
    *
    * NOT because it is (it's pure) — because CollapseProject inlines
    * deterministic expressions into every downstream reference: with the
    * validate stage reading ~12 fields of the payload struct, the parse
    * (and the normalization feeding it) re-executed per field, benchmarked
    * 50× slower than single evaluation. Non-deterministic expressions are
    * never duplicated, so the document is normalized+parsed exactly once
    * per row. The cheap validator UDFs downstream stay deterministic so
    * codegen-level common-subexpression elimination dedupes them. */
  val normalizeAndParse: UserDefinedFunction =
    udf((raw: String, src: String) =>
      InvoiceParser.extractFromText(
        Normalizer.normalizeText(if (raw == null) "" else raw), Option(src)))
      .asNondeterministic()

  /** Block segmentation alone → map of block name → span
    * (ref: robot/core/parser.py:134-208). */
  val extractBlocks: UserDefinedFunction =
    udf((text: String) => InvoiceParser.extractBlocks(if (text == null) "" else text))

  /** Normalization alone as a single-evaluation UDF. The Column-algebra
    * [[Normalizer.normalizeTextCol]] is semantically identical (FuzzSpec)
    * but its interpreted HOF lambdas benchmark ~100× slower per document —
    * use this form when the normalized text is actually materialized. */
  val normalizeText: UserDefinedFunction =
    udf((raw: String) => Normalizer.normalizeText(if (raw == null) "" else raw))
      .asNondeterministic()

  /** Single-evaluation variant for the pre-normalized pipeline hot path
    * (same semantics; non-determinism marker only pins evaluation count —
    * see [[normalizeAndParse]]). */
  val parseInvoiceOnce: UserDefinedFunction = parseInvoice.asNondeterministic()

  /** The VALIDATE stage's three re-runs fused into ONE call: each separate
    * struct-returning UDF invocation pays its own eval/conversion frame
    * per row, and the three always run together ([[graft.operators
    * .TrustScoring.checksCol]]). Field names match the per-validator
    * struct column names (cnpj/total/key), so the fused schema is
    * byte-identical to the three-call struct it replaces. */
  val validateChecks: UserDefinedFunction =
    udf((cnpj: String, total: String, chave: String) => graft.model.TrustChecks(
      Validators.cnpjValidator(if (cnpj == null) "" else cnpj),
      Validators.validatorValorFiscalBrasileiro(if (total == null) "" else total),
      Validators.nfeKeyValidator(if (chave == null) "" else chave)))
      .asNondeterministic()

  /** Register everything for SQL use. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("cnpj_validate", cnpjValidate)
    spark.udf.register("nfe_key_validate", nfeKeyValidate)
    spark.udf.register("money_validate", moneyValidate)
    spark.udf.register("money_validate_fiscal", moneyValidateFiscal)
    spark.udf.register("currency_detect", currencyDetect)
    spark.udf.register("remove_accents", removeAccents)
    spark.udf.register("clean_party_name", cleanPartyName)
    spark.udf.register("parse_invoice", parseInvoice)
    spark.udf.register("extract_blocks", extractBlocks)
  }
}
