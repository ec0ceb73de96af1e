package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Lives under `org.apache.spark.sql` for `private[sql]` access to the
  * Column ↔ Expression bridge (`classic.ExpressionUtils`). Spark 4 made
  * `new Column(expr)` private when Column moved to ColumnNode; this is the
  * sanctioned in-process equivalent, letting library code attach a native
  * Catalyst expression (e.g. [[graft.plans.NormalizeTextExpr]]) to an
  * arbitrary caller Column without requiring per-session SQL function
  * registration at analysis time. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
