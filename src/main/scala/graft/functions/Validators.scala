package graft.functions

import graft.model.{CnpjValidation, MoneyValidation, NfeKeyValidation}

import java.math.RoundingMode
import java.text.{DecimalFormat, DecimalFormatSymbols}
import java.util.Locale
import scala.util.Try

/** Deterministic scalar validation library — the engine's UDF surface.
  *
  * Semantics mirror the reference byte-for-byte where observable:
  *   - CNPJ checksum: robot/core/validators.py:65-122 (official Receita mod-11
  *     weights).
  *   - NF-e 44-digit access key, 6 validation layers:
  *     robot/core/validators.py:126-234.
  *   - Multi-currency monetary parsing with BR/US locale disambiguation:
  *     robot/core/validators.py:239-357.
  *
  * All functions are total (never throw) so they are safe inside Spark tasks
  * — a malformed row degrades to an invalid result, never a task failure.
  */
object Validators {

  /** Per-currency parsing/formatting config
    * (ref: robot/core/validators.py:13-50). Ordered — detection priority is
    * the insertion order of the reference's dict. */
  final case class CurrencyConfig(
      symbols: List[String],
      decimalSeparator: Char,
      thousandSeparator: Char,
      fiscalBrasil: Boolean
  )

  val CurrencyTable: List[(String, CurrencyConfig)] = List(
    "BRL" -> CurrencyConfig(List("R$", "BRL"), ',', '.', fiscalBrasil = true),
    "USD" -> CurrencyConfig(List("$", "USD", "US$"), '.', ',', fiscalBrasil = false),
    "EUR" -> CurrencyConfig(List("€", "EUR"), ',', '.', fiscalBrasil = false),
    "GBP" -> CurrencyConfig(List("£", "GBP"), '.', ',', fiscalBrasil = false),
    "JPY" -> CurrencyConfig(List("¥", "JPY"), '.', ',', fiscalBrasil = false),
    "CNY" -> CurrencyConfig(List("¥", "CNY", "RMB"), '.', ',', fiscalBrasil = false)
  )
  private val currencyMap: Map[String, CurrencyConfig] = CurrencyTable.toMap

  /** Symbol scan in table priority order; prefix/suffix beats substring within
    * one currency entry; default BRL (ref: robot/core/validators.py:52-63). */
  def currencyDetector(value: String): String = {
    val v = value.toUpperCase(Locale.ROOT).trim
    CurrencyTable
      .collectFirst {
        case (code, cfg)
            if cfg.symbols.exists(s =>
              v.startsWith(s) || v.endsWith(s) || v.contains(s)) =>
          code
      }
      .getOrElse("BRL")
  }

  // hand loop ≡ replaceAll("\\D", "") — this ran once per candidate line in
  // party extraction, recompiling the pattern each call (ParserScanSpec)
  private def digitsOnly(s: String): String = ParserScan.digitsOnly(s)

  /** Mod-11 check digit over a digit string (ref: validators.py:88-91). */
  private def mod11Digit(base: String, pesos: Seq[Int]): Int = {
    val soma = base.zip(pesos).map { case (d, p) => (d - '0') * p }.sum
    val resto = soma % 11
    if (resto < 2) 0 else 11 - resto
  }

  private val Pesos1 = Seq(5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)
  private val Pesos2 = Seq(6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)

  /** CNPJ validation with checksum (ref: robot/core/validators.py:65-122). */
  def cnpjValidator(cnpj: String): CnpjValidation = {
    val limpo = digitsOnly(Option(cnpj).getOrElse(""))
    if (limpo.length != 14)
      CnpjValidation(valido = false,
        erro = Some(s"CNPJ deve ter 14 dígitos (recebido ${limpo.length})"),
        confianca = 100)
    else if (limpo == limpo.head.toString * 14)
      CnpjValidation(valido = false,
        erro = Some("CNPJ com todos dígitos repetidos"), confianca = 100)
    else {
      val dv1 = mod11Digit(limpo.substring(0, 12), Pesos1)
      if (limpo(12) - '0' != dv1)
        CnpjValidation(valido = false,
          erro = Some(s"Dígito verificador 1 incorreto (esperado $dv1)"),
          confianca = 99)
      else {
        val dv2 = mod11Digit(limpo.substring(0, 13), Pesos2)
        if (limpo(13) - '0' != dv2)
          CnpjValidation(valido = false,
            erro = Some(s"Dígito verificador 2 incorreto (esperado $dv2)"),
            confianca = 99)
        else
          CnpjValidation(
            valido = true,
            cnpj_limpo = Some(limpo),
            cnpj_formatado = Some(formatCnpj(limpo)),
            tipo = Some(if (limpo.substring(8, 12) == "0001") "matriz" else "filial"),
            confianca = 95
          )
      }
    }
  }

  def formatCnpj(limpo: String): String =
    s"${limpo.substring(0, 2)}.${limpo.substring(2, 5)}.${limpo.substring(5, 8)}/${limpo.substring(8, 12)}-${limpo.substring(12)}"

  private val UfsValidas = Set(
    "11", "12", "13", "14", "15", "16", "17",
    "21", "22", "23", "24", "25", "26", "27", "28", "29",
    "31", "32", "33", "35",
    "41", "42", "43",
    "50", "51", "52", "53")

  /** NF-e key DV: cyclic weights 2..9 right-to-left over 43 digits
    * (ref: robot/core/validators.py:208-213). */
  private val PesosNfe: Seq[Int] = Seq(4, 3, 2) ++ Seq.fill(5)(Seq(9, 8, 7, 6, 5, 4, 3, 2)).flatten

  /** 44-digit NF-e access key validation, layered exactly like the reference:
    * length → UF → temporal plausibility (century pivot at 8) → model ∈
    * {55,65} → embedded CNPJ (recurses into [[cnpjValidator]]) → mod-11 DV
    * (ref: robot/core/validators.py:126-234). */
  def nfeKeyValidator(chave: String): NfeKeyValidation = {
    val limpa = digitsOnly(Option(chave).getOrElse(""))
    if (limpa.length != 44)
      return NfeKeyValidation(valido = false,
        erro = Some(s"Chave deve ter 44 dígitos (recebido ${limpa.length})"),
        confianca = 100)

    val uf = limpa.substring(0, 2)
    val anoMes = limpa.substring(2, 6)
    val cnpj = limpa.substring(6, 20)
    val modelo = limpa.substring(20, 22)
    val dv = limpa.substring(43)

    if (!UfsValidas.contains(uf))
      return NfeKeyValidation(valido = false,
        erro = Some(s"Código UF inválido: $uf"), confianca = 100)

    val ano = anoMes.substring(0, 2).toInt
    val mes = anoMes.substring(2, 4).toInt
    val anoCompleto = if (ano >= 8) 2000 + ano else 2100 + ano
    if (anoCompleto < 2008 || anoCompleto > 2030)
      return NfeKeyValidation(valido = false,
        erro = Some(s"Ano implausível: $anoCompleto"), confianca = 95)
    if (mes < 1 || mes > 12)
      return NfeKeyValidation(valido = false,
        erro = Some(f"Mês inválido: $mes%02d"), confianca = 100)

    if (modelo != "55" && modelo != "65")
      return NfeKeyValidation(valido = false,
        erro = Some(s"Modelo inválido: $modelo (esperado 55=NF-e ou 65=NFC-e)"),
        confianca = 95)

    val valCnpj = cnpjValidator(cnpj)
    if (!valCnpj.valido)
      return NfeKeyValidation(valido = false,
        erro = Some(s"CNPJ inválido na chave: ${valCnpj.erro.getOrElse("")}"),
        confianca = 99)

    val soma = limpa.substring(0, 43).zip(PesosNfe).map { case (d, p) => (d - '0') * p }.sum
    val resto = soma % 11
    val dvCalc = if (resto == 0 || resto == 1) 0 else 11 - resto
    if (dv.toInt != dvCalc)
      return NfeKeyValidation(valido = false,
        erro = Some(s"Dígito verificador incorreto (esperado $dvCalc, recebido $dv)"),
        confianca = 99)

    NfeKeyValidation(
      valido = true,
      chave_limpa = Some(limpa),
      chave_formatada = Some(limpa.grouped(4).mkString(" ")),
      uf = Some(uf),
      ano_mes = Some(f"$anoCompleto-$mes%02d"),
      cnpj_emitente = valCnpj.cnpj_formatado,
      modelo = Some(if (modelo == "55") "NF-e" else "NFC-e"),
      confianca = 90
    )
  }

  /** Python `f"{v:,.2f}"` equivalent: comma thousands, fixed decimals,
    * HALF_EVEN rounding (Python Decimal formatting default). */
  private def usFormat(v: BigDecimal, decimals: Int): String = {
    val sym = new DecimalFormatSymbols(Locale.US)
    val pat = if (decimals == 0) "#,##0" else "#,##0." + ("0" * decimals)
    val df = new DecimalFormat(pat, sym)
    df.setRoundingMode(RoundingMode.HALF_EVEN)
    df.format(v.bigDecimal)
  }

  /** BRL/EUR display format: US format with '.'↔',' swapped
    * (ref: robot/core/validators.py:339,344 swap-trick). */
  private def brFormat(v: BigDecimal): String =
    usFormat(v, 2).replace(',', 'X').replace('.', ',').replace('X', '.')

  /** Full monetary parse + plausibility validation
    * (ref: robot/core/validators.py:239-357).
    *
    * Locale disambiguation for comma-decimal currencies: `1.500,00 → 1500.00`,
    * lone `,` → `.`; dot-decimal currencies just strip `,`
    * (ref: validators.py:287-296). Plausibility: reject negative, > 1e9, and
    * more than 2 decimal places (ref: validators.py:309-336).
    */
  def monetaryValueValidator(
      valor: String,
      fiscalContext: Boolean = false,
      moedaEsperada: Option[String] = None
  ): MoneyValidation = {
    val original = Option(valor).getOrElse("")
    val trimmed = original.trim
    val moeda = currencyDetector(trimmed)

    if (fiscalContext && moeda != "BRL")
      return MoneyValidation(valido = false,
        erro = Some(s"Contexto fiscal brasileiro deve usar Real (R$$), não: $moeda"),
        moeda = Some(moeda), confianca = 100)
    moedaEsperada.foreach { esperada =>
      if (moeda != esperada)
        return MoneyValidation(valido = false,
          erro = Some(s"Moeda esperada $esperada, recebida $moeda"),
          moeda = Some(moeda), confianca = 95)
    }

    val cfg = currencyMap(moeda)
    // Symbol strip is case-sensitive on the ORIGINAL string, like the
    // reference (detection uppercases, stripping does not — validators.py:280).
    var limpo = trimmed
    cfg.symbols.foreach(s => limpo = limpo.replace(s, ""))
    limpo = limpo.trim

    limpo =
      if (cfg.decimalSeparator == ',') {
        if (limpo.contains(',') && limpo.contains('.'))
          limpo.replace(".", "").replace(',', '.')
        else if (limpo.contains(',')) limpo.replace(',', '.')
        else limpo
      } else limpo.replace(",", "")
    limpo = limpo.replace(" ", "")

    // Python Decimal accepts the special values Infinity/-Infinity (and the
    // reference then classifies them via its bounds checks); NaN makes the
    // reference RAISE from an uncaught comparison — as a total function we
    // degrade NaN to a format error instead (deliberate divergence).
    limpo.toLowerCase(Locale.ROOT) match {
      case "infinity" | "inf" | "+infinity" | "+inf" =>
        return MoneyValidation(valido = false,
          erro = Some("Valor absurdo: R$ Infinity"),
          moeda = Some(moeda), confianca = 90)
      case "-infinity" | "-inf" =>
        return MoneyValidation(valido = false, erro = Some("Valor negativo"),
          moeda = Some(moeda), confianca = 100)
      case _ => ()
    }

    val parsed = Try(BigDecimal(limpo)).toOption
    parsed match {
      case None =>
        MoneyValidation(valido = false,
          erro = Some(s"Formato inválido: não é um número válido ($original)"),
          moeda = Some(moeda), confianca = 100)
      case Some(v) if v < 0 =>
        MoneyValidation(valido = false, erro = Some("Valor negativo"),
          moeda = Some(moeda), confianca = 100)
      case Some(v) if v > BigDecimal("1000000000") =>
        MoneyValidation(valido = false,
          erro = Some(s"Valor absurdo: R$$ ${usFormat(v, 2)}"),
          moeda = Some(moeda), confianca = 90)
      case Some(v) if v.setScale(2, BigDecimal.RoundingMode.HALF_EVEN) != v =>
        MoneyValidation(valido = false, erro = Some("Mais de 2 casas decimais"),
          moeda = Some(moeda), confianca = 80)
      case Some(v) =>
        val formatado = moeda match {
          case "BRL"         => "R$ " + brFormat(v)
          case "USD"         => "$ " + usFormat(v, 2)
          case "GBP"         => "£ " + usFormat(v, 2)
          case "EUR"         => "€ " + brFormat(v)
          case "JPY" | "CNY" => "¥ " + usFormat(v, 0)
          case other         => s"$other ${usFormat(v, 2)}"
        }
        MoneyValidation(
          valido = true,
          valor_decimal = Some(v.setScale(2, BigDecimal.RoundingMode.HALF_EVEN)),
          valor_formatado = Some(formatado),
          moeda = Some(moeda),
          fiscal_brasil = Some(cfg.fiscalBrasil),
          confianca = 95
        )
    }
  }

  /** Shortcut: Brazilian fiscal context, expects BRL
    * (ref: robot/core/validators.py:361-370). */
  def validatorValorFiscalBrasileiro(valor: String): MoneyValidation =
    monetaryValueValidator(valor, fiscalContext = true, moedaEsperada = Some("BRL"))
}
