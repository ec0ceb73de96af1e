package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Native struct-returning expression for the C4 line-cleaning verdict —
  * one [[graft.functions.C4Kernel.eval]] call per evaluation site (see the
  * kernel scaladoc for the HOF-no-CSE motivation and the exactness
  * discipline). `badRegex` is the pre-built word-bounded block-list
  * pattern (None for the default empty list) — a constructor literal, so
  * the plan stays deterministic and the kernel caches the compiled form.
  *
  * NULL semantics: NULL in behaves like "" (the column algebra coalesces
  * first), so the output struct is never null — `nullable = false` lets
  * downstream field extractions skip null branches entirely. */
case class C4CleanExpr(child: Expression, badRegex: Option[String])
    extends UnaryExpression {

  override def dataType: DataType = graft.functions.C4Kernel.schema
  override def nullable: Boolean = false
  override def prettyName: String = "graft_c4_clean"

  override def eval(input: InternalRow): Any =
    graft.functions.C4Kernel.eval(
      child.eval(input).asInstanceOf[UTF8String], badRegex.orNull)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val badRef = ctx.addReferenceObj("badRegex", badRegex.orNull,
      "java.lang.String")
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = graft.functions.C4Kernel.eval(
        ${c.isNull} ? null : ${c.value}, $badRef);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): C4CleanExpr =
    copy(child = newChild)
}
