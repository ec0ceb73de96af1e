package graft

import org.scalatest.funsuite.AnyFunSuite

/** The library front door wires extensions + UDFs + conventions. */
class GraftSessionSpec extends AnyFunSuite {

  test("GraftSession exposes native expressions, UDFs, UTC, and AQE skew handling") {
    // getOrCreate against the already-running test session context: the
    // builder configs apply where the session is fresh; the per-session
    // registration (UDFs) must happen regardless
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
