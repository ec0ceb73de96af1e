package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions for SQL use and installs the domain optimizer rule.
  *
  * Enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` on the session builder.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def unary(name: String, build: Expression => Expression)
      (children: Seq[Expression]): Expression = {
    if (children.length != 1)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> "1",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    build(children.head)
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cnpj_is_valid"),
      new ExpressionInfo(classOf[CnpjIsValid].getName, "cnpj_is_valid"),
      unary("cnpj_is_valid", CnpjIsValid) _))
    ext.injectFunction((
      FunctionIdentifier("nfe_key_is_valid"),
      new ExpressionInfo(classOf[NfeKeyIsValid].getName, "nfe_key_is_valid"),
      unary("nfe_key_is_valid", NfeKeyIsValid) _))
    ext.injectFunction((
      FunctionIdentifier(CappedCollectLong.FuncName),
      new ExpressionInfo(classOf[CappedCollectLong].getName, CappedCollectLong.FuncName),
      CappedCollectLong.builder _))
    ext.injectFunction((
      FunctionIdentifier(ArgMaxStruct.FuncName),
      new ExpressionInfo(classOf[ArgMaxStruct].getName, ArgMaxStruct.FuncName),
      ArgMaxStruct.builder _))
    ext.injectFunction((
      FunctionIdentifier(ArgMaxBest.FuncName),
      new ExpressionInfo(classOf[ArgMaxBest].getName, ArgMaxBest.FuncName),
      ArgMaxBest.builder _))
    ext.injectFunction((
      FunctionIdentifier(NormalizeTextExpr.FuncName),
      new ExpressionInfo(classOf[NormalizeTextExpr].getName, NormalizeTextExpr.FuncName),
      NormalizeTextExpr.builder _))
    ext.injectOptimizerRule(_ => SimplifyFiscalValidation)
  }
}
