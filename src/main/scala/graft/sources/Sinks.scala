package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Output sinks (SURVEY §2.1 S5/S6/S7).
  *
  * The reference's legacy sink appends one extracted record per request to
  * a pandas DataFrame → CSV (main.py:27-30, with the latent `.xlsx`-named-
  * CSV bug — we write honest formats); the event sink serializes the
  * envelope for Redis Streams / webhooks (orchestrator_models.py:51-66).
  *
  * Scale notes: every sink partitions by tenant where multi-tenancy is in
  * play (BusinessContext.tenant_id is the reference's isolation key,
  * api/schemas.py:11-33) — partition pruning then serves per-tenant reads
  * without scanning the corpus.
  */
object Sinks {

  /** S5: CSV append sink (header managed by Spark; honest extension). */
  def appendCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).option("header", "true").csv(path)

  /** Parquet sink partitioned by tenant — the corpus-scale default. */
  def tenantPartitionedParquet(df: DataFrame, path: String,
                               tenantCol: String = "tenant_id"): Unit =
    df.write.mode(SaveMode.Append).partitionBy(tenantCol).parquet(path)

  /** S6: event-envelope JSON lines (the Redis-Streams/webhook contract,
    * ref: orchestrator_models.py:51-66). One JSON object per document. */
  def eventEnvelopeJson(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode(SaveMode.Append).text(path)

  /** S7: JDBC audit sink (declared-but-unwritten in the reference,
    * rpa_config.py:45) — provided as the standard Spark JDBC writer. */
  def jdbcAudit(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)
}
