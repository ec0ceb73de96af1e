package graft

import graft.streaming.Serving
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** EP3 serving analogue: submit (admission gates + landing zone) and serve
  * (streaming dispatch with per-status routing), end-to-end over a REAL
  * PDF upload — the full HTTP→validate→dispatch→sink flow of
  * api/main.py:45-94 under Spark. */
class ServingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("EP3: gate → landing → dispatch → per-status sinks, exactly once") {
    val base = Files.createTempDirectory("graft-serving").toString
    val (landing, envelopes, quarantine, ckpt) =
      (s"$base/landing", s"$base/envelopes", s"$base/quarantine", s"$base/ckpt")

    val invoicePdf = PdfFixtures.singlePage(GoldenStreamFixtures.valid.split('\n').toSeq)
    val garbagePdf = ("%PDF-1.4 no structure here" + "x" * 200).getBytes("ISO-8859-1")
    val requests = Seq(
      ("r1", "tenant-a", "nota.pdf", invoicePdf),
      ("r2", "tenant-a", "broken.pdf", garbagePdf),
      ("r3", "tenant-a", "notes.txt", "plain text upload".getBytes("UTF-8")),
      ("r4", "tenant-a", "huge.pdf", Array.fill[Byte](11 * 1024 * 1024)('x')),
      ("r5", "", "orphan.pdf", invoicePdf)
    ).toDF("request_id", "tenant_id", "filename", "content")

    // --- front half: admission gates + receipts -------------------------
    val receipts = Serving.submit(requests, landing)
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(receipts("r1") == ((true, null)))
    assert(receipts("r2") == ((true, null))) // magic passes; parse decides later
    assert(receipts("r3") == ((false, "INVALID_CONTENT_TYPE")))
    assert(receipts("r4") == ((false, "FILE_TOO_LARGE")))
    assert(receipts("r5") == ((false, "MISSING_CONTEXT")))
    assert(spark.read.parquet(landing).count() == 2) // only accepted payloads land

    // --- back half: streaming dispatch ----------------------------------
    val q = Serving.serve(spark, landing, envelopes, quarantine, ckpt)
    q.awaitTermination(120000)

    // r1: real PDF extraction → successful parse → envelope sink
    val env = spark.read.json(envelopes)
    assert(env.count() == 1)
    val e = env.select("event_type", "data.payload.status",
      "data.payload.invoice.issuer.cnpj_cpf", "data.payload.invoice.financials.total")
      .collect()(0)
    assert(e.getString(0) == "fiscal.extraction.completed")
    assert(e.getString(1) == "success")
    assert(e.getString(2) == "04.252.011/0001-10")
    assert(e.getString(3) == "R$ 100,00")

    // r2: magic-valid but structurally dead PDF → degraded row → quarantine
    val quar = spark.read.parquet(quarantine)
    assert(quar.count() == 1)
    val qr = quar.collect()(0)
    assert(qr.getAs[String]("request_id") == "r2")
    assert(qr.getAs[String]("tenant_id") == "tenant-a")
    assert(qr.getAs[Double]("trust_score") < 1.0)

    // --- exactly-once: a second drain over the same checkpoint re-reads
    // nothing (the dispatch is idempotent per request)
    val q2 = Serving.serve(spark, landing, envelopes, quarantine, ckpt)
    q2.awaitTermination(120000)
    assert(spark.read.json(envelopes).count() == 1)
    assert(spark.read.parquet(quarantine).count() == 1)

    // new submission after the first drain is picked up incrementally
    Serving.submit(Seq(("r6", "tenant-b", "nota2.pdf", invoicePdf))
      .toDF("request_id", "tenant_id", "filename", "content"), landing)
    val q3 = Serving.serve(spark, landing, envelopes, quarantine, ckpt)
    q3.awaitTermination(120000)
    assert(spark.read.json(envelopes).count() == 2)
    assert(spark.read.parquet(quarantine).count() == 1)
  }
}
