package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static NF-e access-key validity kernel shared by interpreted eval and
  * generated code. Boolean distillation of the 6 layers in
  * `Validators.nfeKeyValidator` (ref: robot/core/validators.py:126-234):
  * 44 digits → UF code → temporal plausibility (century pivot at 8, year
  * 2008–2030, month 1–12) → model ∈ {55, 65} → embedded CNPJ checksum
  * (shares [[CnpjChecksum.isValidDigits]] — identical weights) → cyclic
  * mod-11 DV over the leading 43 digits. Agreement with the struct
  * validator on all its input classes is pinned in PlansSpec. */
object NfeChecksum {

  /** Valid IBGE UF codes as a 100-slot lookup (branch-free membership). */
  private val UfValid: Array[Boolean] = {
    val a = new Array[Boolean](100)
    Seq(11, 12, 13, 14, 15, 16, 17,
      21, 22, 23, 24, 25, 26, 27, 28, 29,
      31, 32, 33, 35,
      41, 42, 43,
      50, 51, 52, 53).foreach(a(_) = true)
    a
  }

  /** Cyclic DV weights over 43 digits (ref: validators.py:208-213). */
  private val Pesos: Array[Int] =
    Array(4, 3, 2) ++ Array.fill(5)(Array(9, 8, 7, 6, 5, 4, 3, 2)).flatten

  /** Allocation-light variant over UTF8String: digits are single-byte in
    * UTF-8, so a byte scan suffices on the codegen hot path. */
  def isValidU8(chave: UTF8String): Boolean = {
    if (chave == null) return false
    val n = chave.numBytes()
    val d = new Array[Byte](44)
    var count = 0
    var i = 0
    while (i < n) {
      val b = chave.getByte(i)
      if (b >= '0' && b <= '9') {
        if (count >= 44) return false // >44 digits can never validate
        d(count) = b
        count += 1
      }
      i += 1
    }
    if (count != 44) return false
    isValidDigits(d)
  }

  private def isValidDigits(d: Array[Byte]): Boolean = {
    val uf = (d(0) - '0') * 10 + (d(1) - '0')
    if (!UfValid(uf)) return false
    val ano = (d(2) - '0') * 10 + (d(3) - '0')
    val anoCompleto = if (ano >= 8) 2000 + ano else 2100 + ano
    if (anoCompleto < 2008 || anoCompleto > 2030) return false
    val mes = (d(4) - '0') * 10 + (d(5) - '0')
    if (mes < 1 || mes > 12) return false
    val modelo = (d(20) - '0') * 10 + (d(21) - '0')
    if (modelo != 55 && modelo != 65) return false
    if (!CnpjChecksum.isValidDigits(java.util.Arrays.copyOfRange(d, 6, 20))) return false
    var s = 0
    var i = 0
    while (i < 43) { s += (d(i) - '0') * Pesos(i); i += 1 }
    val resto = s % 11
    val dv = if (resto == 0 || resto == 1) 0 else 11 - resto
    d(43) - '0' == dv
  }

  def isValid(chave: String): Boolean =
    chave != null && isValidU8(UTF8String.fromString(chave))
}

/** Native Catalyst expression for NF-e access-key validity — the hot-path
  * alternative to the struct-returning `Udfs.nfeKeyValidate` when only
  * validity is needed (filters, trust scoring): codegen'd, null-safe
  * (NULL in → NULL out, like [[CnpjIsValid]]), deterministic. Registered
  * as SQL `nfe_key_is_valid` by [[GraftExtensions]] and simplified by
  * [[SimplifyFiscalValidation]]. */
case class NfeKeyIsValid(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfe_key_is_valid requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "nfe_key_is_valid"

  override def nullSafeEval(input: Any): Any =
    NfeChecksum.isValidU8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfeChecksum.isValidU8($c)")

  override protected def withNewChildInternal(newChild: Expression): NfeKeyIsValid =
    copy(child = newChild)
}
