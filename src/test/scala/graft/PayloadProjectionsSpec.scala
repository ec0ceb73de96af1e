package graft

import graft.operators.{InvoicePipeline, PayloadProjections}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's payload-transform contract assertions
  * (ref: tests/contract/test_payload_transform.py:51-108) against the
  * golden fixture. */
class PayloadProjectionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  lazy val processed =
    InvoicePipeline.process(Seq(graft.tools.GoldenFixture.text).toDF("text"))

  test("ERP projection carries supplier tax id and >= 3 line items") {
    val row = PayloadProjections.toErp(processed).collect()(0)
    assert(row.getString(0) == "NFS-e")
    assert(row.getString(1) == "15/12/2024 10:30:00")
    val supplier = row.getStruct(2)
    assert(supplier.getString(0) == "04.252.011/0001-10")
    assert(supplier.getString(1) == "EMPRESA ABC TECNOLOGIA LTDA")
    assert(row.getSeq[org.apache.spark.sql.Row](4).length >= 3)
    assert(row.getString(5) == "R$ 4.227,50")
  }

  test("analytics projection emits the event shape") {
    val row = PayloadProjections.toAnalytics(processed)
      .select("event_time", "event_type", "issuer_cnpj", "items_count", "has_key")
      .collect()(0)
    assert(row.getString(1) == "invoice_processed")
    assert(row.getString(2) == "04.252.011/0001-10")
    assert(row.getInt(3) >= 3)
    assert(!row.getBoolean(4)) // golden fixture has no access key
  }

  test("projections serialize to JSON round-trippably (ref: test_payload_schema.py:79-99)") {
    val json = PayloadProjections.toErp(processed)
      .select(org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(col("*"))).as("j"))
      .collect()(0).getString(0)
    val back = spark.read.json(Seq(json).toDS())
    assert(back.select("supplier.tax_id").collect()(0).getString(0) == "04.252.011/0001-10")
  }
}
