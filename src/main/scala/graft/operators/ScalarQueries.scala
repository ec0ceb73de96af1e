package graft.operators

import graft.functions.{Normalizer, Udfs}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Granular differential queries for the scalar operator layer (SURVEY
  * §2.2 normalization, §2.5 validators): inputs are derived
  * deterministically from the TPC-H tables with identical arithmetic in
  * Spark and in the DuckDB oracle; the Spark side runs the REAL operator
  * (UDF / column pipeline) while the oracle recomputes expected outputs
  * from first principles (mod-11 checksums as explicit digit sums, locale
  * parsing as CASE arithmetic, normalization as direct string
  * construction).
  *
  * All are narrow per-row transformations — scan-speed at any scale.
  */
object ScalarQueries {

  import InvoicePipeline.{ValidCnpjsFmt, ValidKeys, InvalidKeys}

  private def litArray(xs: Seq[String]): Column = array(xs.map(lit): _*)

  private def sqlCase(expr: String, xs: Seq[String]): String =
    s"(CASE $expr " + xs.zipWithIndex.map { case (v, i) => s"WHEN $i THEN '$v'" }.mkString(" ") + " END)"

  // ------------------------------------------------------------------
  // V1: CNPJ checksum validation (ref: robot/core/validators.py:65-122)
  // ------------------------------------------------------------------

  /** Candidate construction, mirrored in SQL: four input classes. */
  private def cnpjCandidate(k: Column): Column =
    when(k % 8 === 3, lit("11.111.111/1111-11")) // repeated digits
      .when(k % 8 === 7, lit("123")) // bad length
      .when(k % 4 === 0, element_at(litArray(ValidCnpjsFmt), (k % 10).cast("int") + 1))
      .otherwise(lpad(((k * 48271 + 7) % 100000000000000L).cast("string"), 14, "0"))

  def cnpjValidate(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val v = Udfs.cnpjValidate(cnpjCandidate(k))
    // input-sorted, projection after (the moneyValidate sampler rationale)
    graft.sources.Tables.read(spark, dir, "customer")
      .orderBy("c_custkey").select(
      k.as("id"),
      cnpjCandidate(k).as("input"),
      v.getField("valido").as("valido"),
      v.getField("erro").as("erro"),
      v.getField("cnpj_formatado").as("formatado"),
      v.getField("tipo").as("tipo"),
      v.getField("confianca").as("confianca")
    )
  }

  /** Full mod-11 checksum recomputed in SQL as explicit digit sums. */
  val cnpjValidateSql: String = {
    val cnpjCase = sqlCase("k%10", ValidCnpjsFmt)
    val pesos1 = Seq(5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)
    val pesos2 = Seq(6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)
    def digit(i: Int) = s"CAST(substr(limpo,$i,1) AS INTEGER)"
    val soma1 = pesos1.zipWithIndex.map { case (w, i) => s"${digit(i + 1)}*$w" }.mkString("+")
    val soma2 = pesos2.zipWithIndex.map { case (w, i) => s"${digit(i + 1)}*$w" }.mkString("+")
    s"""
WITH cand AS (
  SELECT c_custkey AS k,
    CASE WHEN c_custkey%8=3 THEN '11.111.111/1111-11'
         WHEN c_custkey%8=7 THEN '123'
         WHEN c_custkey%4=0 THEN $cnpjCase
         ELSE lpad(CAST((c_custkey*48271+7)%100000000000000 AS VARCHAR),14,'0') END AS input
  FROM customer
), cleaned AS (
  SELECT k, input, regexp_replace(input, '[^0-9]', '', 'g') AS limpo FROM cand
), dv AS (
  SELECT k, input, limpo,
    CASE WHEN ($soma1)%11 < 2 THEN 0 ELSE 11-(($soma1)%11) END AS dv1,
    CASE WHEN ($soma2)%11 < 2 THEN 0 ELSE 11-(($soma2)%11) END AS dv2
  FROM cleaned WHERE length(limpo) = 14 AND limpo <> repeat(substr(limpo,1,1),14)
)
SELECT k AS id, input, valido, erro, formatado, tipo, confianca FROM (
  SELECT k, input, FALSE AS valido,
    'CNPJ deve ter 14 dígitos (recebido ' || length(limpo) || ')' AS erro,
    NULL AS formatado, NULL AS tipo, 100 AS confianca
  FROM cleaned WHERE length(limpo) <> 14
  UNION ALL
  SELECT k, input, FALSE, 'CNPJ com todos dígitos repetidos', NULL, NULL, 100
  FROM cleaned WHERE length(limpo) = 14 AND limpo = repeat(substr(limpo,1,1),14)
  UNION ALL
  SELECT k, input,
    CASE WHEN ${digit(13)} = dv1 AND ${digit(14)} = dv2 THEN TRUE ELSE FALSE END,
    CASE WHEN ${digit(13)} <> dv1 THEN 'Dígito verificador 1 incorreto (esperado ' || dv1 || ')'
         WHEN ${digit(14)} <> dv2 THEN 'Dígito verificador 2 incorreto (esperado ' || dv2 || ')'
         ELSE NULL END,
    CASE WHEN ${digit(13)} = dv1 AND ${digit(14)} = dv2
         THEN substr(limpo,1,2)||'.'||substr(limpo,3,3)||'.'||substr(limpo,6,3)||'/'||substr(limpo,9,4)||'-'||substr(limpo,13,2)
         ELSE NULL END,
    CASE WHEN ${digit(13)} = dv1 AND ${digit(14)} = dv2
         THEN (CASE WHEN substr(limpo,9,4) = '0001' THEN 'matriz' ELSE 'filial' END)
         ELSE NULL END,
    CASE WHEN ${digit(13)} = dv1 AND ${digit(14)} = dv2 THEN 95 ELSE 99 END
  FROM dv
) ORDER BY id
""".trim
  }

  // ------------------------------------------------------------------
  // V2: NF-e access key validation (ref: robot/core/validators.py:126-234)
  // ------------------------------------------------------------------

  private[graft] def keyCandidate(k: Column): Column = {
    val idx = (k % 4).cast("int") + 1
    when(k % 5 === 0, element_at(litArray(ValidKeys), idx))
      .when(k % 5 === 1, element_at(litArray(InvalidKeys), idx)) // bad DV
      .when(k % 5 === 2, concat(lit("99"), element_at(litArray(ValidKeys), idx).substr(3, 42)))
      .when(k % 5 === 3, concat(element_at(litArray(ValidKeys), idx).substr(1, 20), lit("99"),
        element_at(litArray(ValidKeys), idx).substr(23, 22)))
      .otherwise(lit("123"))
  }

  def nfeKeyValidate(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val v = Udfs.nfeKeyValidate(keyCandidate(k))
    // input-sorted, projection after (the moneyValidate sampler rationale)
    graft.sources.Tables.read(spark, dir, "orders")
      .orderBy("o_orderkey").select(
      k.as("id"),
      keyCandidate(k).as("input"),
      v.getField("valido").as("valido"),
      v.getField("erro").as("erro"),
      v.getField("chave_formatada").as("formatada"),
      v.getField("uf").as("uf"),
      v.getField("ano_mes").as("ano_mes"),
      v.getField("cnpj_emitente").as("cnpj_emitente"),
      v.getField("modelo").as("modelo"),
      v.getField("confianca").as("confianca")
    )
  }

  /** Oracle from the known literal key classes: expected outputs are
    * direct CASE literals (inputs are fixed keys + deterministic
    * corruption, so every expected field is known in advance). */
  val nfeKeyValidateSql: String = {
    val keysFmt = ValidKeys.map(_.grouped(4).mkString(" "))
    val emit = Seq("04.252.011/0001-10", "00.000.123/0001-22",
      "00.008.042/0001-79", "00.015.961/0001-70")
    val dvEsp = ValidKeys.map(_.last)
    val dvRec = InvalidKeys.map(_.last)
    val dvMsg = dvEsp.zip(dvRec).map { case (e, r) =>
      s"Dígito verificador incorreto (esperado $e, recebido $r)"
    }
    s"""
WITH cand AS (
  SELECT o_orderkey AS k, o_orderkey%5 AS cls, CAST(o_orderkey%4 AS INTEGER) AS idx FROM orders
)
SELECT k AS id,
  CASE cls WHEN 0 THEN ${sqlCase("idx", ValidKeys)}
           WHEN 1 THEN ${sqlCase("idx", InvalidKeys)}
           WHEN 2 THEN '99' || substr(${sqlCase("idx", ValidKeys)}, 3, 42)
           WHEN 3 THEN substr(${sqlCase("idx", ValidKeys)}, 1, 20) || '99' || substr(${sqlCase("idx", ValidKeys)}, 23, 22)
           ELSE '123' END AS input,
  CASE WHEN cls = 0 THEN TRUE ELSE FALSE END AS valido,
  CASE cls WHEN 1 THEN ${sqlCase("idx", dvMsg)}
           WHEN 2 THEN 'Código UF inválido: 99'
           WHEN 3 THEN 'Modelo inválido: 99 (esperado 55=NF-e ou 65=NFC-e)'
           WHEN 4 THEN 'Chave deve ter 44 dígitos (recebido 3)'
           ELSE NULL END AS erro,
  CASE WHEN cls = 0 THEN ${sqlCase("idx", keysFmt)} ELSE NULL END AS formatada,
  CASE WHEN cls = 0 THEN '35' ELSE NULL END AS uf,
  CASE WHEN cls = 0 THEN '2024-12' ELSE NULL END AS ano_mes,
  CASE WHEN cls = 0 THEN ${sqlCase("idx", emit)} ELSE NULL END AS cnpj_emitente,
  CASE WHEN cls = 0 THEN 'NF-e' ELSE NULL END AS modelo,
  CASE cls WHEN 0 THEN 90 WHEN 1 THEN 99 WHEN 2 THEN 100 WHEN 3 THEN 95 ELSE 100 END AS confianca
FROM cand ORDER BY id
""".trim
  }

  // ------------------------------------------------------------------
  // V3+V4: currency detection + monetary parsing
  // (ref: robot/core/validators.py:52-63, 239-357)
  // ------------------------------------------------------------------

  /** Money-string construction: 6 locale variants + 1 invalid, cents
    * derived from the key. BR variant 2 carries a thousands dot. */
  private def moneyCandidate(k: Column): Column = {
    val cents = (k * 37 + 11) % 100000000L // < 1e6 reais
    val ip = (cents / 100).cast("long")
    val cc = lpad((cents % 100).cast("string"), 2, "0")
    val ipDot = when(ip >= 1000,
      concat((ip / 1000).cast("long").cast("string"), lit("."),
        lpad((ip % 1000).cast("string"), 3, "0")))
      .otherwise(ip.cast("string"))
    val ipComma = when(ip >= 1000,
      concat((ip / 1000).cast("long").cast("string"), lit(","),
        lpad((ip % 1000).cast("string"), 3, "0")))
      .otherwise(ip.cast("string"))
    val jpy = (cents % 900 + 100).cast("string") // 3 digits, no grouping
    when(k % 7 === 0, concat(ip.cast("string"), lit(","), cc))
      .when(k % 7 === 1, concat(lit("R$ "), ip.cast("string"), lit(","), cc))
      .when(k % 7 === 2, concat(lit("R$ "), ipDot, lit(","), cc))
      .when(k % 7 === 3, concat(lit("$ "), ipComma, lit("."), cc))
      .when(k % 7 === 4, concat(lit("€ "), ip.cast("string"), lit(","), cc))
      .when(k % 7 === 5, concat(lit("¥ "), jpy))
      .otherwise(lit("R$ abc"))
  }

  def moneyValidate(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val cand = moneyCandidate(k)
    val v = Udfs.moneyValidate(cand)
    // sort the INPUT, project after: the range partitioner's sampling pass
    // computes full child rows, so a sort ABOVE the UDF projection runs
    // the whole chain twice — deterministic UDFs included (the
    // InvoicePipeline sampler fix, generalized; PERF.md round 10)
    graft.sources.Tables.read(spark, dir, "orders")
      .orderBy("o_orderkey").select(
      k.as("id"),
      cand.as("input"),
      Udfs.currencyDetect(cand).as("moeda_detectada"),
      v.getField("valido").as("valido"),
      v.getField("valor_decimal").cast("double").as("valor"),
      v.getField("valor_formatado").as("formatado"),
      v.getField("fiscal_brasil").as("fiscal_brasil"),
      v.getField("confianca").as("confianca")
    )
  }

  val moneyValidateSql: String = """
WITH cand AS (
  SELECT o_orderkey AS k, (o_orderkey*37+11)%100000000 AS cents FROM orders
), parts AS (
  SELECT k, cents, cents//100 AS ip, lpad(CAST(cents%100 AS VARCHAR),2,'0') AS cc,
    cents%900+100 AS jpy,
    CASE WHEN cents//100 >= 1000
      THEN CAST(cents//100//1000 AS VARCHAR) || '.' || lpad(CAST(cents//100%1000 AS VARCHAR),3,'0')
      ELSE CAST(cents//100 AS VARCHAR) END AS ip_dot,
    CASE WHEN cents//100 >= 1000
      THEN CAST(cents//100//1000 AS VARCHAR) || ',' || lpad(CAST(cents//100%1000 AS VARCHAR),3,'0')
      ELSE CAST(cents//100 AS VARCHAR) END AS ip_comma
  FROM cand
)
SELECT k AS id,
  CASE k%7 WHEN 0 THEN CAST(ip AS VARCHAR)||','||cc
           WHEN 1 THEN 'R$ '||CAST(ip AS VARCHAR)||','||cc
           WHEN 2 THEN 'R$ '||ip_dot||','||cc
           WHEN 3 THEN '$ '||ip_comma||'.'||cc
           WHEN 4 THEN '€ '||CAST(ip AS VARCHAR)||','||cc
           WHEN 5 THEN '¥ '||CAST(jpy AS VARCHAR)
           ELSE 'R$ abc' END AS input,
  CASE k%7 WHEN 3 THEN 'USD' WHEN 4 THEN 'EUR' WHEN 5 THEN 'JPY' ELSE 'BRL' END AS moeda_detectada,
  CASE WHEN k%7 = 6 THEN FALSE ELSE TRUE END AS valido,
  CASE k%7 WHEN 5 THEN CAST(jpy AS DOUBLE) WHEN 6 THEN NULL
           ELSE CAST(cents AS DOUBLE)/100 END AS valor,
  CASE k%7 WHEN 3 THEN '$ '||ip_comma||'.'||cc
           WHEN 4 THEN '€ '||ip_dot||','||cc
           WHEN 5 THEN '¥ '||CAST(jpy AS VARCHAR)
           WHEN 6 THEN NULL
           ELSE 'R$ '||ip_dot||','||cc END AS formatado,
  CASE WHEN k%7 = 6 THEN NULL WHEN k%7 IN (3,4,5) THEN FALSE ELSE TRUE END AS fiscal_brasil,
  CASE WHEN k%7 = 6 THEN 100 ELSE 95 END AS confianca
FROM parts ORDER BY id
""".trim

  // ------------------------------------------------------------------
  // P10+P11: accent strip + party-name cleaning (golden-value oracle —
  // fixed input classes, expected outputs captured from the reference)
  // ------------------------------------------------------------------

  private val NameInputs = Seq(
    "EMPRESA ABC TECNOLOGIA LTDA", "  empresa   beta ltda.  ",
    "PRESTADOR DE SERVIÇOS", "CLIENTE XYZ INDÚSTRIA S.A.",
    "DADOS DO PRESTADOR", "João da Silva Comércio ME", "CNPJ CPF NIF", "A B")
  private val NameExpected = Seq(
    Some("EMPRESA ABC TECNOLOGIA LTDA"), Some("EMPRESA BETA LTDA"),
    None, Some("CLIENTE XYZ INDÚSTRIA S.A"),
    None, Some("JOÃO DA SILVA COMÉRCIO ME"), None, None)
  private val AccentExpected = Seq(
    "EMPRESA ABC TECNOLOGIA LTDA", "  empresa   beta ltda.  ",
    "PRESTADOR DE SERVICOS", "CLIENTE XYZ INDUSTRIA S.A.",
    "DADOS DO PRESTADOR", "Joao da Silva Comercio ME", "CNPJ CPF NIF", "A B")

  def cleanNames(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val input = element_at(litArray(NameInputs), (k % 8).cast("int") + 1)
    // input-sorted, projection after (the moneyValidate sampler rationale)
    graft.sources.Tables.read(spark, dir, "customer")
      .orderBy("c_custkey").select(
      k.as("id"),
      input.as("input"),
      Udfs.cleanPartyName(input).as("cleaned"),
      Udfs.removeAccents(input).as("sem_acentos")
    )
  }

  val cleanNamesSql: String = {
    val cleanedCase = "(CASE c_custkey%8 " + NameExpected.zipWithIndex.map {
      case (Some(v), i) => s"WHEN $i THEN '$v'"
      case (None, i)    => s"WHEN $i THEN NULL"
    }.mkString(" ") + " END)"
    s"""
SELECT c_custkey AS id,
  ${sqlCase("c_custkey%8", NameInputs)} AS input,
  $cleanedCase AS cleaned,
  ${sqlCase("c_custkey%8", AccentExpected)} AS sem_acentos
FROM customer ORDER BY id
""".trim
  }

  // ------------------------------------------------------------------
  // P1-P8: normalization pipeline as a direct differential
  // (ref: robot/core/text_normalizer.py:63-92)
  // ------------------------------------------------------------------

  /** Constructed messy text per order row: nbsp/zwsp noise, spaced money,
    * glued date+time, short noise lines, sigla lines, duplicate lines. */
  def normalize(spark: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val dateBr = date_format(col("o_orderdate"), "dd/MM/yyyy")
    val messy = concat(
      lit("DOC "), k.cast("string"), lit("​TESTE\n\n"),
      lit("VALOR:  4 . 450 , 00\n"),
      lit("DATA: "), dateBr, lit(" 10:30:00\n"),
      lit("AB\nSP\nX1\n"),
      lit("DOC "), k.cast("string"), lit("TESTE"))
    // input-sorted, projection after (the moneyValidate sampler rationale)
    graft.sources.Tables.read(spark, dir, "orders")
      .orderBy("o_orderkey").select(
      k.as("id"),
      Normalizer.normalizeTextCol(messy).as("norm_text")
    )
  }

  /** Expected output constructed directly: nbsp→space+zwsp-deleted makes
    * line 1 == the duplicate tail line (dedup keeps one), money tightens
    * to 4450,00, the glued date+time is re-split, AB drops (short, no
    * digit), SP survives (UF sigla), X1 survives (has digit). */
  val normalizeSql: String = """
SELECT o_orderkey AS id,
  'DOC ' || CAST(o_orderkey AS VARCHAR) || 'TESTE' || chr(10) ||
  'VALOR: 4450,00' || chr(10) ||
  'DATA: ' || strftime(o_orderdate, '%d/%m/%Y') || ' 10:30:00' || chr(10) ||
  'SP' || chr(10) || 'X1' AS norm_text
FROM orders ORDER BY id
""".trim
}
