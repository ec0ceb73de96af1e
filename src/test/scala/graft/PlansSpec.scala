package graft

import graft.functions.Validators
import graft.plans.CnpjChecksum
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expression + extensions: SQL registration, codegen
  * execution, optimizer rule, and agreement with the scalar validator. */
class PlansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("cnpj_is_valid registered via SparkSessionExtensions and usable from SQL") {
    val out = spark.sql(
      """SELECT cnpj_is_valid('04.252.011/0001-10') AS a,
        |       cnpj_is_valid('12.345.678/0001-00') AS b,
        |       cnpj_is_valid(NULL) AS c""".stripMargin).collect()(0)
    assert(out.getBoolean(0))
    assert(!out.getBoolean(1))
    assert(out.isNullAt(2))
  }

  test("native expression agrees with the scalar validator on a corpus") {
    val candidates = (0 until 2000).map { k =>
      if (k % 4 == 0) graft.operators.InvoicePipeline.ValidCnpjsFmt(k % 10)
      else f"${(k.toLong * 48271 + 7) % 100000000000000L}%014d"
    }
    candidates.foreach { c =>
      assert(CnpjChecksum.isValid(c) == Validators.cnpjValidator(c).valido, c)
    }
    // and through the engine, where whole-stage codegen compiles doGenCode
    val viaSql = candidates.toDF("c")
      .selectExpr("c", "cnpj_is_valid(c) AS v").collect()
    viaSql.foreach(r => assert(r.getBoolean(1) == CnpjChecksum.isValid(r.getString(0))))
  }

  test("optimizer rule strips case/trim wrappers around the checksum") {
    val plan = spark.sql(
      "SELECT cnpj_is_valid(upper(trim(' 04.252.011/0001-10 '))) AS v")
    assert(plan.collect()(0).getBoolean(0)) // correctness preserved
    val optimized = plan.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("upper("), s"upper not stripped:\n$optimized")
  }

  test("expression runs inside whole-stage codegen (no UDF boundary)") {
    // a parquet scan source, so the projection isn't constant-folded away
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .selectExpr("cnpj_is_valid(c_name) AS v")
    val physical = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert(physical.contains("*(1) Project [cnpj_is_valid"), physical)
    assert(!physical.contains("BatchEvalPython") && !physical.contains("ScalaUDF"))
    assert(df.count() == 150) // and it executes (codegen compiles)
  }
}
