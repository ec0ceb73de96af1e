package graft.streaming

import graft.operators.Orchestrate
import graft.sources.DocumentSource
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** EP3 serving analogue — the request-driven end of the pipeline
  * (ref: api/main.py:45-94 HTTP→validate→dispatch→sink, with the
  * dependency gates of api/dependencies.py:12-49).
  *
  * The reference serves one HTTP upload per request; the Spark-first
  * rendering splits that into the two halves a cluster deployment
  * actually has:
  *
  *   1. [[submit]] — the synchronous front half (the FastAPI handler's
  *      job): admission-gate a batch of upload requests (size cap, magic
  *      number, tenant context — the same checks, as columns), append the
  *      ACCEPTED payloads to a landing zone, and return one receipt row
  *      per request (the 202-vs-4xx response body).
  *   2. [[serve]] — the asynchronous back half (the planned Celery/Redis
  *      worker pool, rpa_config.py:31-42): a Structured Streaming query
  *      over the landing zone, rate-limited by `maxFilesPerTrigger` (the
  *      admission-control knob — backpressure is declared, not hand-built),
  *      running decode → normalize → parse → validate per micro-batch and
  *      routing per-status inside `foreachBatch`: successful extractions to
  *      the event-envelope JSON sink, degraded documents to a quarantine
  *      table for replay — the reference's 422 path, made durable.
  *
  * Scale notes: both halves are embarrassingly parallel per document; the
  * landing zone is plain parquet so a 1000-executor cluster picks up
  * micro-batches with ordinary file-source listing (at higher request
  * rates the same two functions bind to a Kafka topic via
  * [[StreamingPipeline.invoiceStreamFromKafka]] — the landing zone is the
  * brokerless rendering). Checkpointing makes the dispatch exactly-once
  * per request; the quarantine keeps failures replayable instead of
  * dropping them with an HTTP error code nobody persisted.
  */
object Serving {

  /** What the HTTP front-end hands over per upload. */
  val RequestSchema: StructType = new StructType()
    .add("request_id", "string").add("tenant_id", "string")
    .add("filename", "string").add("content", "binary")

  val MaxUploadBytes: Long = 10L * 1024 * 1024

  /** Admission decision per request: null reason = accepted. Mirrors the
    * reference's dependency gates in order (api/dependencies.py:12-49 —
    * size cap, then content magic, then business context). */
  def gateReason(maxBytes: Long = MaxUploadBytes): org.apache.spark.sql.Column =
    when(col("content").isNull || length(col("content")) === 0, "EMPTY_BODY")
      .when(length(col("content")) > maxBytes, "FILE_TOO_LARGE")
      .when(substring(col("content"), 1, 4) =!= lit("%PDF".getBytes), "INVALID_CONTENT_TYPE")
      .when(col("tenant_id").isNull || col("tenant_id") === "", "MISSING_CONTEXT")
      .otherwise(lit(null).cast("string"))

  /** Gate a batch of upload requests, append the accepted payloads to the
    * landing zone, and return the receipts (request_id, accepted, reason)
    * — the synchronous response the reference's handler sends. */
  def submit(requests: DataFrame, landingDir: String,
             maxBytes: Long = MaxUploadBytes): DataFrame = {
    val spark = requests.sparkSession
    import spark.implicits._
    // persist pins ONE evaluation of the gate: the landing write below is
    // an action, and the receipts read afterwards would otherwise
    // RE-EVALUATE `requests` — a non-deterministic or since-changed source
    // could then land a request the receipt reports rejected (or vice
    // versa). The cache is populated by the write's full-partition scans,
    // so receipts read what was actually gated. Receipts are materialized
    // EAGERLY (one small row per request — the 202-vs-4xx response body,
    // never the payload) so the cache — which pins the binary payloads —
    // can be released before returning: a long-lived serving session
    // calling submit per request batch must not accumulate cached
    // partitions until memory pressure evicts them.
    val gated = requests.withColumn("reason", gateReason(maxBytes)).persist()
    try {
      gated.filter(col("reason").isNull)
        .select("request_id", "tenant_id", "filename", "content")
        .write.mode(SaveMode.Append).parquet(landingDir)
      gated.select(col("request_id"), col("reason").isNull.as("accepted"), col("reason"))
        .as[(String, Boolean, String)].collect().toSeq
        .toDF("request_id", "accepted", "reason")
    } finally gated.unpersist(blocking = false)
  }

  /** The dispatcher: stream the landing zone, decode (real PDF extraction
    * — the same codec as the batch S1/S2 sources), run the orchestrated
    * pipeline, route per-status. Returns the started query; stop it (or
    * use the AvailableNow trigger default and await) to drain. */
  def serve(spark: SparkSession, landingDir: String, envelopeDir: String,
            quarantineDir: String, checkpointDir: String,
            maxFilesPerTrigger: Int = 8): StreamingQuery = {
    import spark.implicits._
    val requests = spark.readStream
      .schema(RequestSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
    val decoded = requests
      .select(col("request_id"), col("tenant_id"), col("filename"), col("content"))
      .as[(String, String, String, Array[Byte])]
      .mapPartitions(_.map { case (rid, tenant, name, bytes) =>
        (rid, tenant, DocumentSource.PdfTextExtractor.extract(name, bytes).text)
      })
      .toDF("request_id", "tenant_id", "text")
    decoded.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // foreachBatch is AT-LEAST-once: if the second write fails after
        // the first succeeded, the whole batch retries. Both sinks
        // therefore partition by batch_id with DYNAMIC partition
        // overwrite — a retry REPLACES its own batch partition instead of
        // appending a duplicate, making the dispatch idempotent per batch
        // (and exactly-once end-to-end given the checkpointed source).
        val processed = Orchestrate.run(batch, tenantCol = col("tenant_id"))
          .localCheckpoint()
        Orchestrate.toEventEnvelope(processed.filter(col("status") =!= "error"))
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").text(envelopeDir)
        processed.filter(col("status") === "error")
          .select(col("request_id"), col("tenant_id"), col("trace_id"),
            col("norm_text"), col("validation_issues.code").as("issue_codes"),
            col("trust_score"))
          .withColumn("batch_id", lit(batchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(quarantineDir)
        ()
      }
      .start()
  }
}
