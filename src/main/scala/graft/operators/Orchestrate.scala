package graft.operators

import graft.functions.{Normalizer, Udfs}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EP2: the orchestrated pipeline with observability — the Spark analogue
  * of `Orchestrator.process` (ref: robot/orchestrator.py:118-298).
  *
  * Emits one PipelineResult-shaped row per document: ids, stage events
  * (the ordered 4-event audit trail: READ → NORMALIZE → PARSE → VALIDATE),
  * SHA-256 lineage hashes, reduction ratio, payload, issues, trust score,
  * status. Exceptions become row-level degradation + FAILURE-free SUCCESS
  * events with NULL fields — Spark rows never abort the job (risk register
  * §7.4.4); the reference's ABORT policy is represented by `status=error`.
  *
  * Everything is one narrow `select` — per-stage timing in a fused
  * columnar plan is a single pass, so `duration_sec` is reported as "0.0"
  * (the whole point of fusing is that stages no longer run separately;
  * wall-clock per document is visible in the Spark UI / metrics instead).
  */
object Orchestrate {

  private def detail(kv: (String, Column)*): Column =
    map(kv.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*)

  private def event(stage: String, details: Column): Column = struct(
    current_timestamp().as("timestamp"),
    lit(stage).as("stage"),
    lit("SUCCESS").as("status"),
    details.as("details"),
    lit("CONTINUE").as("error_policy"))

  /** Full orchestrated run over a corpus with `text` (+ optional tenant)
    * columns. */
  def run(docs: DataFrame, textCol: String = "text",
          tenantCol: Column = lit("unknown_tenant"),
          sourceCol: Column = lit(null).cast("string")): DataFrame = {
    val raw = col(textCol)
    val inputHash = sha2(raw.cast("binary"), 256)

    val staged = docs
      .withColumn("tenant_id", tenantCol)
      .withColumn("trace_id", expr("uuid()"))
      .withColumn("start_time", current_timestamp())
      .withColumn("input_hash", inputHash)
      .withColumn("execution_id",
        concat(tenantCol, lit("_"), substring(inputHash, 1, 12)))
      // fused single-evaluation normalize+parse (see Udfs.normalizeAndParse)
      .withColumn("invoice", Udfs.normalizeAndParse(raw, sourceCol))
      .withColumn("norm_text", Normalizer.normalizeTextCol(raw))

    val staged2 = staged.withColumn("checks", TrustScoring.checksCol(col("invoice")))
    val issues = TrustScoring.issuesFrom(col("invoice"), col("checks"))
    val score = TrustScoring.scoreFrom(col("invoice"), col("checks"))

    val readEvent = event("READ", detail(
      "duration_sec" -> lit("0.0"),
      "input_source" -> coalesce(sourceCol, lit("memory")),
      "size_bytes" -> length(raw.cast("binary"))))
    val normalizeEvent = event("NORMALIZE", detail(
      "duration_sec" -> lit("0.0"),
      "raw_text_hash_sha256" -> col("input_hash"),
      "normalized_text_hash_sha256" -> sha2(col("norm_text").cast("binary"), 256),
      "reduction_ratio" ->
        when(length(raw) > 0,
          round(lit(1.0) - length(col("norm_text")).cast("double") / length(raw), 2))
          .otherwise(lit(0.0))))
    val parseEvent = event("PARSE", detail(
      "duration_sec" -> lit("0.0"),
      "items_count" -> size(col("invoice.items")),
      "issuer_found" -> col("invoice.issuer").isNotNull,
      "recipient_found" -> col("invoice.recipient").isNotNull,
      "total_value" -> col("invoice.financials.total")))

    staged2
      .withColumn("validation_issues", issues)
      .withColumn("trust_score", score)
      .withColumn("status", TrustScoring.status(col("validation_issues"), col("trust_score")))
      .withColumn("events", array(
        readEvent, normalizeEvent, parseEvent,
        event("VALIDATE", detail(
          "duration_sec" -> lit("0.0"),
          "trust_score" -> col("trust_score"),
          "issues_count" -> size(col("validation_issues")),
          "critical_errors" -> exists(col("validation_issues"),
            i => i.getField("severity") === "error")))))
      .withColumn("end_time", current_timestamp())
      .drop("checks")
  }

  /** Event-bus envelope (ref: orchestrator_models.py:51-66
    * `map_to_event_contract`): PipelineResult row → JSON value column.
    *
    * `metrics.total_duration_ms` is kept for schema parity with the
    * reference contract but is ALWAYS 0 by construction: Spark pins
    * `current_timestamp()` to one per-query value, so `start_time` and
    * `end_time` coincide (same reason `duration_sec` is "0.0" — see the
    * file header: a fused columnar plan has no per-document wall clock;
    * consumers needing latency must read Spark's task metrics/UI). */
  def toEventEnvelope(result: DataFrame): DataFrame =
    result.select(to_json(struct(
      sha2(concat_ws(":", col("trace_id"), col("execution_id")), 256).as("event_id"),
      lit("fiscal.extraction.completed").as("event_type"),
      date_format(col("end_time"), "yyyy-MM-dd'T'HH:mm:ssXXX").as("timestamp"),
      struct(
        struct(col("invoice"), col("trust_score"), col("status")).as("payload"),
        col("events").as("audit_trail"),
        struct(
          (unix_millis(col("end_time")) - unix_millis(col("start_time")))
            .as("total_duration_ms")).as("metrics")
      ).as("data"))).as("value"))
}
