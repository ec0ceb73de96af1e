package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static checksum kernel shared by interpreted eval and generated code.
  * Mirrors robot/core/validators.py:65-122 exactly (digit strip, length,
  * repetition, two mod-11 check digits with the official Receita weights). */
object CnpjChecksum {
  private val Pesos1 = Array(5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)
  private val Pesos2 = Array(6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2)

  /** Allocation-free variant over UTF8String: digits are single-byte in
    * UTF-8, so a byte scan suffices — no String copy per row on the
    * codegen hot path. */
  def isValidU8(cnpj: UTF8String): Boolean = {
    if (cnpj == null) return false
    val n = cnpj.numBytes()
    val digits = new Array[Byte](14)
    var count = 0
    var i = 0
    while (i < n) {
      val b = cnpj.getByte(i)
      if (b >= '0' && b <= '9') {
        if (count >= 14) return false // >14 digits can never validate
        digits(count) = b
        count += 1
      }
      i += 1
    }
    if (count != 14) return false
    isValidDigits(digits)
  }

  private[plans] def isValidDigits(d: Array[Byte]): Boolean = {
    var allSame = true
    var i = 1
    while (i < 14 && allSame) { allSame = d(i) == d(0); i += 1 }
    if (allSame) return false
    var s1 = 0; i = 0
    while (i < 12) { s1 += (d(i) - '0') * Pesos1(i); i += 1 }
    val dv1 = if (s1 % 11 < 2) 0 else 11 - s1 % 11
    if (d(12) - '0' != dv1) return false
    var s2 = 0; i = 0
    while (i < 13) { s2 += (d(i) - '0') * Pesos2(i); i += 1 }
    val dv2 = if (s2 % 11 < 2) 0 else 11 - s2 % 11
    d(13) - '0' == dv2
  }

  /** String form — also the parser's per-line filter
    * (`extractPartyFromBlock` reads ONLY `.valido`, so the full
    * `Validators.cnpjValidator` — digit projection, error-message
    * interpolation, result case class — was allocation per candidate
    * line for one boolean; PlansSpec pins ≡ `.valido`). */
  def isValid(cnpj: String): Boolean =
    cnpj != null && isValidU8(UTF8String.fromString(cnpj))
}

/** Native Catalyst expression for CNPJ checksum validation — the hot-path
  * alternative to the struct-returning `Udfs.cnpjValidate` when only
  * validity is needed (filters, trust scoring): codegen'd (stays inside
  * whole-stage codegen, no UDF serialization boundary), null-safe,
  * deterministic.
  *
  * SURVEY §7.3 deliberately shipped v1 with plain UDFs; this is the
  * profiling-justified promotion path demonstrated end-to-end: expression →
  * [[GraftExtensions]] SQL registration → [[SimplifyFiscalValidation]]
  * optimizer rule.
  *
  * NULL semantics are SQL-idiomatic (NULL in → NULL out), which differs
  * from `Udfs.cnpjValidate` where a NULL input yields `valido = false` —
  * a migration between the two must adjust NULL handling (e.g.
  * `coalesce(cnpj_is_valid(c), false)`), especially under negation. */
case class CnpjIsValid(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cnpj_is_valid requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "cnpj_is_valid"

  override def nullSafeEval(input: Any): Any =
    CnpjChecksum.isValidU8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CnpjChecksum.isValidU8($c)")

  override protected def withNewChildInternal(newChild: Expression): CnpjIsValid =
    copy(child = newChild)
}

/** Domain-specific simplification (the SURVEY §4 "hand-rolled optimization
  * → Catalyst rule" slot): the fiscal checksums only read digits, so
  * case-mapping and trimming wrappers are no-ops — strip them and save a
  * string allocation per row. Covers both [[CnpjIsValid]] and
  * [[NfeKeyIsValid]]. */
object SimplifyFiscalValidation extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{StringTrim, Upper, Lower}
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CnpjIsValid(Upper(c)) => CnpjIsValid(c)
      case CnpjIsValid(Lower(c)) => CnpjIsValid(c)
      case CnpjIsValid(StringTrim(c, None)) => CnpjIsValid(c)
      case NfeKeyIsValid(Upper(c)) => NfeKeyIsValid(c)
      case NfeKeyIsValid(Lower(c)) => NfeKeyIsValid(c)
      case NfeKeyIsValid(StringTrim(c, None)) => NfeKeyIsValid(c)
    }
}
