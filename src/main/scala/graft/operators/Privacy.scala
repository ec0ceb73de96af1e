package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub step every training-data
  * pipeline runs before a corpus ships: find personal identifiers
  * (emails, Brazilian CPF/CNPJ documents, phone numbers), count them per
  * document, and replace them with typed placeholders.
  *
  * All pure column algebra (`regexp_extract_all` / chained
  * `regexp_replace`) — codegen'd, narrow, runs at scan speed; patterns are
  * RE2-compatible (no lookaround) so the DuckDB oracle executes the
  * IDENTICAL regexes. Counts are computed on the original text per
  * pattern (the patterns are mutually non-overlapping by construction:
  * a CPF's three dot-groups cannot occur inside a CNPJ or email), then
  * redaction applies most-specific-first.
  */
object Privacy {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val CnpjRe = "\\d{2}\\.\\d{3}\\.\\d{3}/\\d{4}-\\d{2}"
  val CpfRe = "\\d{3}\\.\\d{3}\\.\\d{3}-\\d{2}"
  val PhoneRe = "\\(\\d{2}\\) \\d{4,5}-\\d{4}"

  /** Deterministic PII-bearing corpus built from the customer table: the
    * customer name plus, on modular-arithmetic schedules, a synthetic
    * email / CPF / phone / CNPJ — so the redaction query has known, varied
    * PII density and the oracle reconstructs the identical corpus in SQL. */
  def contactCorpus(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    def pad(c: Column, n: Int): Column = lpad(c.cast("string"), n, "0")
    graft.sources.Tables.read(spark, dir, "customer").select(
      k.as("cust_id"),
      concat(
        col("c_name"),
        when(k % 3 === 0,
          concat(lit(" contato: user"), k.cast("string"), lit("@example.com.br")))
          .otherwise(""),
        when(k % 4 === 0,
          concat(lit(" CPF: "), pad((k * 7) % 1000, 3), lit("."),
            pad((k * 13) % 1000, 3), lit("."), pad((k * 17) % 1000, 3),
            lit("-"), pad(k % 100, 2)))
          .otherwise(""),
        when(k % 5 === 0,
          concat(lit(" tel (11) 9"), pad((k * 3) % 10000, 4), lit("-"),
            pad((k * 11) % 10000, 4)))
          .otherwise(""),
        when(k % 7 === 0, lit(" CNPJ: 04.252.011/0001-10")).otherwise("")
      ).as("text"))
  }

  /** Per-document PII counts + the redacted text. Redaction order is
    * most-specific-first (CNPJ → CPF → phone → email); each placeholder
    * is typed so downstream filters can key on what was removed. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    def n(re: String): Column = size(regexp_extract_all(t, lit(re), lit(0)))
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, CnpjRe, "[CNPJ]"),
            CpfRe, "[CPF]"),
          PhoneRe, "[PHONE]"),
        EmailRe, "[EMAIL]")
    // input-sorted, projection after: a sort above the 8 regex passes makes
    // the range sampler run them all twice (PERF.md r10 sampler note)
    contactCorpus(spark, dir).orderBy("cust_id").select(
      col("cust_id"),
      n(EmailRe).as("n_emails"),
      n(CnpjRe).as("n_cnpjs"),
      n(CpfRe).as("n_cpfs"),
      n(PhoneRe).as("n_phones"),
      redacted.as("redacted")
    )
  }

  private val CorpusSql = """corpus AS (
  SELECT c_custkey AS cust_id,
    c_name
    || CASE WHEN c_custkey % 3 = 0 THEN ' contato: user' || CAST(c_custkey AS VARCHAR) || '@example.com.br' ELSE '' END
    || CASE WHEN c_custkey % 4 = 0 THEN ' CPF: ' || lpad(CAST((c_custkey*7)%1000 AS VARCHAR),3,'0') || '.' || lpad(CAST((c_custkey*13)%1000 AS VARCHAR),3,'0') || '.' || lpad(CAST((c_custkey*17)%1000 AS VARCHAR),3,'0') || '-' || lpad(CAST(c_custkey%100 AS VARCHAR),2,'0') ELSE '' END
    || CASE WHEN c_custkey % 5 = 0 THEN ' tel (11) 9' || lpad(CAST((c_custkey*3)%10000 AS VARCHAR),4,'0') || '-' || lpad(CAST((c_custkey*11)%10000 AS VARCHAR),4,'0') ELSE '' END
    || CASE WHEN c_custkey % 7 = 0 THEN ' CNPJ: 04.252.011/0001-10' ELSE '' END
    AS text
  FROM customer
)"""

  val piiRedactSql: String = s"""
WITH $CorpusSql
SELECT cust_id,
  CAST(len(regexp_extract_all(text, '$EmailRe')) AS INTEGER) AS n_emails,
  CAST(len(regexp_extract_all(text, '$CnpjRe')) AS INTEGER) AS n_cnpjs,
  CAST(len(regexp_extract_all(text, '$CpfRe')) AS INTEGER) AS n_cpfs,
  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS INTEGER) AS n_phones,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
    '$CnpjRe', '[CNPJ]', 'g'),
    '$CpfRe', '[CPF]', 'g'),
    '$PhoneRe', '[PHONE]', 'g'),
    '$EmailRe', '[EMAIL]', 'g') AS redacted
FROM corpus ORDER BY cust_id
""".trim
}
