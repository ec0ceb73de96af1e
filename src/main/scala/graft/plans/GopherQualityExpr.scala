package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/** Native struct-returning expression for the Gopher quality battery —
  * one [[graft.functions.GopherKernel.eval]] call per evaluation site
  * (see the kernel scaladoc; the [[C4CleanExpr]] pattern). NULL in
  * behaves like "" and the struct is never null. */
case class GopherQualityExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = graft.functions.GopherKernel.schema
  override def nullable: Boolean = false
  override def prettyName: String = "graft_gopher_quality"

  override def eval(input: InternalRow): Any =
    graft.functions.GopherKernel.eval(
      child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      InternalRow ${ev.value} = graft.functions.GopherKernel.eval(
        ${c.isNull} ? null : ${c.value});
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): GopherQualityExpr =
    copy(child = newChild)
}
