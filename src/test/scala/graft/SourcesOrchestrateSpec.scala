package graft

import graft.operators.Orchestrate
import graft.sources.{DocumentSource, Sinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Sources (S1/S2/S5/S6) and the orchestrated EP2 projection. */
class SourcesOrchestrateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("S1: binaryFile directory scan with encoding detection") {
    val dir = Files.createTempDirectory("graft-src").toString
    Files.write(Paths.get(dir, "a.txt"), "NOTA FISCAL UTF8 ação".getBytes("UTF-8"))
    Files.write(Paths.get(dir, "b.txt"), "LATIN1 ação".getBytes("ISO-8859-1"))
    Files.write(Paths.get(dir, "c.pdf"), ("%PDF-1.4 fake" + "x" * 100).getBytes)
    val docs = DocumentSource.readDirectory(spark, dir).collect()
      .map(d => d.path.split('/').last -> d).toMap
    assert(docs("a.txt").encoding == "utf-8" && docs("a.txt").text.contains("ação"))
    assert(docs("b.txt").encoding == "latin-1" && docs("b.txt").text.contains("ação"))
    // c.pdf carries the %PDF magic but no parseable structure: the row
    // degrades (0 pages, empty text) instead of raising — totality policy;
    // real-PDF extraction is covered by PdfTextCodecSpec
    assert(docs("c.pdf").encoding == "unknown" && docs("c.pdf").extration_method == "embedded")
    assert(docs("c.pdf").page_count == 0 && docs("c.pdf").size_bytes == 0L)
  }

  test("S2: bytes column decode + upload gate") {
    val df = Seq(
      ("ok.pdf", ("%PDF-1.7 tiny").getBytes),
      ("not_pdf.bin", "plain bytes".getBytes)
    ).toDF("path", "content")
    val gated = df.filter(DocumentSource.uploadGate()).collect()
    assert(gated.length == 1 && gated(0).getString(0) == "ok.pdf")
    val decoded = DocumentSource.fromBytes(df, "path", "content").collect()
    assert(decoded.length == 2)
  }

  test("EP2: orchestrated run emits the ordered 4-event audit trail") {
    val docs = Seq(GoldenStreamFixtures.valid, "LIXO").toDF("text")
    val out = Orchestrate.run(docs, tenantCol = lit("tenant-a"))
    val row = out.filter(col("status") === "success")
      .select(col("events.stage"), col("trace_id"), col("execution_id"),
        col("trust_score"), size(col("events")).as("n"))
      .collect()(0)
    assert(row.getSeq[String](0) == Seq("READ", "NORMALIZE", "PARSE", "VALIDATE"))
    assert(row.getString(1).length == 36) // uuid
    assert(row.getString(2).startsWith("tenant-a_"))
    assert(row.getDouble(3) == 1.0)
    assert(row.getInt(4) == 4)
  }

  test("EP2: event details carry lineage hashes and counts") {
    val docs = Seq(GoldenStreamFixtures.valid).toDF("text")
    val out = Orchestrate.run(docs)
    val details = out.select(col("events").getItem(1).getField("details")).collect()(0)
      .getMap[String, String](0)
    assert(details("raw_text_hash_sha256").length == 64)
    assert(details("normalized_text_hash_sha256").length == 64)
    assert(details.contains("reduction_ratio"))
    val parseDetails = out.select(col("events").getItem(2).getField("details")).collect()(0)
      .getMap[String, String](0)
    assert(parseDetails("items_count") == "0") // fixture has no ITEMS block
    assert(parseDetails("issuer_found") == "true")
  }

  test("EP2: envelope JSON carries payload, audit trail and metrics") {
    val out = Orchestrate.run(Seq(GoldenStreamFixtures.valid).toDF("text"))
    val json = Orchestrate.toEventEnvelope(out).collect()(0).getString(0)
    val parsed = spark.read.json(Seq(json).toDS())
    val r = parsed.select("event_type", "data.payload.status",
      "data.metrics.total_duration_ms").collect()(0)
    assert(r.getString(0) == "fiscal.extraction.completed")
    assert(r.getString(1) == "success")
    assert(r.getLong(2) >= 0L)
  }

  test("S5/S6: csv append + envelope json sinks write readable output") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val df = Seq((1L, "ok"), (2L, "also ok")).toDF("id", "msg")
    Sinks.appendCsv(df, s"$dir/csv")
    Sinks.appendCsv(df, s"$dir/csv") // append twice
    assert(spark.read.option("header", "true").csv(s"$dir/csv").count() == 4)
    Sinks.eventEnvelopeJson(df, s"$dir/json")
    val back = spark.read.json(s"$dir/json")
    assert(back.count() == 2 && back.columns.sorted.sameElements(Array("id", "msg")))
  }

  test("S7: JDBC audit sink round-trips through an embedded Derby database") {
    // Derby ships in /opt/spark/jars (Spark's own hive-metastore
    // dependency), so the JDBC writer is exercised against a REAL JDBC
    // database — in-memory, zero setup, same code path as any external DB
    val url = "jdbc:derby:memory:graftaudit;create=true"
    val audit = Seq(
      (1L, "04.252.011/0001-10", 1.0, "success"),
      (2L, null.asInstanceOf[String], 0.0, "error")
    ).toDF("doc_id", "issuer_cnpj", "trust_score", "status")
    Sinks.jdbcAudit(audit, url, "audit_log")
    Sinks.jdbcAudit(audit, url, "audit_log") // append semantics: no clobber
    val back = spark.read.jdbc(url, "audit_log", new java.util.Properties())
    assert(back.count() == 4)
    val row = back.filter(col("doc_id") === 1L).collect()(0)
    assert(row.getAs[String]("issuer_cnpj") == "04.252.011/0001-10")
    assert(row.getAs[Double]("trust_score") == 1.0)
    // nulls survive the round-trip
    assert(back.filter(col("issuer_cnpj").isNull).count() == 2)
  }

  test("tenant-partitioned parquet enables partition pruning") {
    val dir = Files.createTempDirectory("graft-tenant").toString
    val df = Seq((1L, "a", "t1"), (2L, "b", "t2")).toDF("id", "v", "tenant_id")
    Sinks.tenantPartitionedParquet(df, s"$dir/pq")
    val pruned = spark.read.parquet(s"$dir/pq").filter(col("tenant_id") === "t1")
    assert(pruned.count() == 1)
    // partition dir exists on disk → pruning is physical, not just a filter
    assert(Files.exists(Paths.get(s"$dir/pq/tenant_id=t1")))
  }
}
