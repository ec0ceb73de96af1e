package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Destination-specific payload adapters — the routing projections the
  * reference's contract suite pins (ref:
  * tests/contract/test_payload_transform.py:51-108): an ERP shape and an
  * analytics-event shape, both pure column algebra over the processed
  * `invoice` struct. */
object PayloadProjections {

  /** ERP adapter (ref: test_payload_transform.py:51-84). */
  def toErp(processed: DataFrame, inv: Column = col("invoice")): DataFrame =
    processed.select(
      lit("NFS-e").as("document_type"),
      inv.getField("emission_date").as("issue_date"),
      struct(
        inv.getField("issuer").getField("cnpj_cpf").as("tax_id"),
        inv.getField("issuer").getField("name").as("name")).as("supplier"),
      struct(
        inv.getField("recipient").getField("cnpj_cpf").as("tax_id"),
        inv.getField("recipient").getField("name").as("name")).as("customer"),
      transform(inv.getField("items"), i => struct(
        i.getField("description").as("description"),
        i.getField("unit_value").as("amount"))).as("line_items"),
      inv.getField("financials").getField("total").as("total_amount"))

  /** Analytics-event adapter (ref: test_payload_transform.py:89-108). */
  def toAnalytics(processed: DataFrame, inv: Column = col("invoice")): DataFrame =
    processed.select(
      inv.getField("emission_date").as("event_time"),
      lit("invoice_processed").as("event_type"),
      inv.getField("issuer").getField("cnpj_cpf").as("issuer_cnpj"),
      inv.getField("financials").getField("total").as("total_value"),
      size(inv.getField("items")).as("items_count"),
      inv.getField("chave_acesso").isNotNull.as("has_key"))
}
