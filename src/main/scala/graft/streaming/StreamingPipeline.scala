package graft.streaming

import graft.operators.InvoicePipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface (SURVEY §2.10): the reference is
  * request-driven (FastAPI + planned Celery/Redis workers,
  * rpa_config.py:31-42) with an event-envelope contract but no streaming
  * runtime; here the identical batch pipeline runs under micro-batches.
  *
  * Per-document processing is stateless, so the invoice stream needs no
  * watermark; the event-window aggregation carries a watermark so state is
  * bounded (late events beyond 1 hour are dropped — at 100 TB/day the
  * alternative is unbounded state growth).
  */
object StreamingPipeline {

  /** Schema of a landing-zone document row (what a binaryFile/Kafka source
    * or upstream extractor emits). */
  val DocSchema: StructType = new StructType()
    .add("doc_id", "long").add("text", "string")

  /** File-source micro-batch stream over a landing directory of parquet
    * document files → full invoice pipeline. */
  def invoiceStream(spark: SparkSession, landingDir: String): DataFrame = {
    val stream = spark.readStream
      .schema(DocSchema)
      .option("maxFilesPerTrigger", 8) // bound micro-batch size
      .parquet(landingDir)
    InvoicePipeline.process(stream)
      .select(col("doc_id"),
        col("invoice.issuer.cnpj_cpf").as("issuer_cnpj"),
        col("invoice.financials.total").as("total"),
        col("trust_score"), col("status"))
  }

  /** [[invoiceStream]] with replay protection in front: documents are
    * fingerprinted on the sha-256 of their NORMALIZED text (the EP2
    * audit-hash — byte-identical re-uploads AND trivially-reformatted
    * replays collapse to one fingerprint), anti-joined against the
    * [[StatefulOps.dedupLedger]] state ledger, and only first-seen content
    * flows into the parse pipeline. Exactly-once-per-content across
    * micro-batches and restarts (the ledger lives in the checkpointed
    * state store). */
  def dedupedInvoiceStream(spark: SparkSession, landingDir: String): DataFrame = {
    import spark.implicits._
    // normalize ONCE: the ledger doc carries the normalized text forward,
    // so the parse stage uses processNormalized instead of re-running the
    // normalization kernel on every surviving document
    val stream = spark.readStream
      .schema(DocSchema)
      .option("maxFilesPerTrigger", 8)
      .parquet(landingDir)
      .select(col("doc_id"),
        graft.functions.Udfs.normalizeText(col("text")).as("text"))
      .select(col("doc_id"), sha2(col("text"), 256).as("fingerprint"), col("text"))
      .as[StatefulOps.LedgerDoc]
    val firstSeen = StatefulOps.dedupLedger(stream).toDF()
    InvoicePipeline.processNormalized(firstSeen, "text")
      .select(col("doc_id"), col("fingerprint"),
        col("invoice.issuer.cnpj_cpf").as("issuer_cnpj"),
        col("invoice.financials.total").as("total"),
        col("trust_score"), col("status"))
  }

  /** One record as Spark's `kafka` source emits it — key/value are BINARY,
    * plus the topic/partition/offset coordinates and the broker timestamp.
    * (`timestampType`: 0 = NoTimestampType, 1 = CreateTime, 2 =
    * LogAppendTime — the source's int encoding.) */
  case class KafkaRecord(
      key: Array[Byte], value: Array[Byte], topic: String,
      partition: Int, offset: Long, timestamp: java.sql.Timestamp,
      timestampType: Int)

  /** SURVEY §2.10's `readStream.format("kafka")` leg: the invoice pipeline
    * over a Kafka-shaped stream. No broker ships in this container, so the
    * transform is factored to take ANY DataFrame with the kafka source's
    * exact schema — production binds
    * `spark.readStream.format("kafka").option("subscribe", …).load()`,
    * tests bind a MemoryStream[KafkaRecord]; the pipeline under test is
    * byte-identical either way (the kafka source contributes only the
    * seven-column contract modeled by [[KafkaRecord]]).
    *
    * Decoding mirrors the upload path: the record key is the document id
    * (UTF-8 digits — the envelope identity the reference keys events by),
    * the value is the document payload, decoded with the same UTF-8-strict
    * /latin-1-fallback policy as [[graft.sources.DocumentSource]]. Kafka
    * coordinates ride along so downstream sinks can record provenance. */
  def invoiceStreamFromKafka(records: DataFrame): DataFrame = {
    import records.sparkSession.implicits._
    val decoded = records
      .select(col("key"), col("value"), col("topic"), col("partition"), col("offset"))
      .as[(Array[Byte], Array[Byte], String, Int, Long)]
      .map { case (key, value, topic, partition, offset) =>
        val id = new String(if (key == null) Array.empty[Byte] else key,
          java.nio.charset.StandardCharsets.UTF_8)
        val (text, _) = graft.sources.DocumentSource.PdfTextExtractor
          .decodeText(if (value == null) Array.empty[Byte] else value)
        (id.toLongOption.getOrElse(-1L), text, topic, partition, offset)
      }
      .toDF("doc_id", "text", "topic", "partition", "offset")
    InvoicePipeline.process(decoded)
      .select(col("doc_id"),
        col("invoice.issuer.cnpj_cpf").as("issuer_cnpj"),
        col("invoice.financials.total").as("total"),
        col("trust_score"), col("status"),
        col("topic"), col("partition"), col("offset"))
  }

  /** Event-bus envelope projection (ref: orchestrator_models.py:51-66
    * `map_to_event_contract`): the streaming sink contract, as JSON. */
  def eventEnvelope(processed: DataFrame): DataFrame =
    processed.select(to_json(struct(
      // id covers the full payload: true replays (same doc, same result)
      // dedupe on it; a re-extraction with a changed payload gets a new id
      sha2(concat_ws(":", col("doc_id"), col("issuer_cnpj"), col("total"),
        col("trust_score"), col("status")), 256).as("event_id"),
      lit("fiscal.extraction.completed").as("event_type"),
      date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX").as("timestamp"),
      struct(
        struct(col("issuer_cnpj"), col("total"), col("trust_score"), col("status")).as("payload")
      ).as("data")
    )).as("value"))

  /** Windowed event-time aggregation with watermark over a streaming
    * events source — tumbling 1-hour windows per event type. */
  def windowedEventCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("events"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("events"), col("sum_value"))

  /** Streaming gap-based sessionization via the built-in `session_window`
    * (merging-session state is Spark-managed; watermark bounds it — the
    * Spark-first alternative to hand-rolling a
    * `flatMapGroupsWithState` sessionizer).
    *
    * Boundary semantics differ from the batch [[graft.operators.EventOps
    * .sessionize]] at EXACT-gap spacing: `session_window` closes a session
    * when the next event is ≥ gap after the previous (windows abut but
    * don't overlap), the batch walk keeps it open on strictly-greater
    * gaps. Identical for every gap ≠ the boundary; documented rather than
    * papered over. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("events"))

  /** Stream–static join: enrich the event stream with a dimension table
    * (the classic fact-stream ⋈ broadcast-dim shape — the static side is
    * re-broadcast per micro-batch, no state needed), then windowed
    * aggregation per enriched key. */
  def enrichedEventCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("events"))
      .select(col("w.start").as("window_start"), col("c_mktsegment"), col("events"))

  /** Stream–stream inner join with event-time bounds — the attribution
    * query shape (click → purchase within 30 minutes, per user). Both
    * sides carry watermarks and the join condition bounds purchase time
    * to a window after the click, so Spark can expire buffered state:
    * a click older than watermark + 30 min can never match again and is
    * dropped. Without BOTH the watermarks and the time-bound condition
    * the state store grows forever — this is the canonical unbounded
    * -state trap at 100 TB/day. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
                      within: String = "30 minutes"): DataFrame =
    clicks.withWatermark("click_ts", "1 hour")
      .join(purchases.withWatermark("purchase_ts", "1 hour"),
        expr(s"""user_id = p_user_id AND
                 purchase_ts >= click_ts AND
                 purchase_ts <= click_ts + INTERVAL $within"""))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("click_ts"), col("purchase_ts"),
        (unix_millis(col("purchase_ts")) - unix_millis(col("click_ts")))
          .as("delay_ms"))

  /** Write helper: single-trigger drain (AvailableNow) to an in-memory or
    * file sink — used by tests and by batch-catchup deployments. */
  def drainAvailableNow(df: DataFrame, queryName: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode(OutputMode.Append())
      .queryName(queryName)
      .format("memory")
}
