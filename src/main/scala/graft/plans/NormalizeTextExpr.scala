package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the full document-normalization pipeline
  * (ref: robot/core/text_normalizer.py:63-92) — one call into the fused
  * single-scan kernel [[graft.functions.Normalizer.normalizeText]] per row.
  *
  * This replaces an 11-node `regexp_replace`/higher-order-function chain in
  * the plan: that chain is codegen'd but each node drives the java.util.regex
  * NFA over the whole document (plus array materialization for the line
  * dedup), which made normalization the dominant cost of the three most
  * expensive projection queries under the honest full-materialization bench
  * action. Codegen emits a static kernel call, so the expression stays inside
  * the WholeStageCodegen span like any built-in.
  *
  * NULL semantics match the old column chain: NULL in → NULL out (the
  * normalize UDFs coalesce NULL to "" themselves, unchanged). */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${NormalizeTextExpr.FuncName} requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType
  override def prettyName: String = NormalizeTextExpr.FuncName

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.functions.Normalizer.normalizeText(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(graft.functions.Normalizer.normalizeText(" +
        s"$c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeTextExpr {
  val FuncName = "graft_normalize_text"

  def builder(children: Seq[Expression]): Expression = {
    require(children.length == 1, s"$FuncName takes exactly 1 argument")
    NormalizeTextExpr(children.head)
  }

  /** Idempotent per-session SQL registration (same pattern as
    * [[CappedCollectLong.ensureRegistered]]). The Column API path
    * ([[graft.functions.Normalizer.normalizeTextCol]]) builds the
    * expression directly and needs no registration. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val id = FunctionIdentifier(FuncName)
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(id))
      registry.registerFunction(id,
        new ExpressionInfo(classOf[NormalizeTextExpr].getName, FuncName),
        builder _)
  }
}
