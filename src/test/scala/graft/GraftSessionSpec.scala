package graft

import org.scalatest.funsuite.AnyFunSuite

/** The library front door wires extensions + UDFs + conventions. */
class GraftSessionSpec extends AnyFunSuite {

  test("GraftSession exposes native expressions, UDFs, UTC, and AQE skew handling") {
    // pin the shared test session FIRST so this spec never becomes the
    // JVM's session creator (that would drop TestSpark's temp warehouse
    // static conf for every later suite); TestSpark carries
    // GraftExtensions, so the reuse path exercises the probe + the
    // per-session registration, and runtime confs still apply
    TestSpark.spark
    val spark = GraftSession.getOrCreate(_.master("local[4]"))
    // native codegen expression from GraftExtensions
    assert(spark.sql("SELECT cnpj_is_valid('04.252.011/0001-10')").collect()(0).getBoolean(0))
    // registered UDF surface
    assert(spark.sql("SELECT cnpj_validate('04.252.011/0001-10').valido").collect()(0).getBoolean(0))
    // conventions
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
  }
}
