package graft

import graft.streaming.IngestGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming corpus-ingestion gate end-to-end over two micro-batches:
  * corpus dups dropped, within-batch copies collapsed, a doc ADMITTED in
  * batch 0 must gate batch 1 (the landing zone is the ledger), near-dups
  * dropped with the corpus match in the receipt. */
class IngestGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("two-batch ingest: landing converges, receipts name every arrival") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val corpusDir = s"$root/corpus"
    val landing = s"$root/landing"
    val receiptsDir = s"$root/receipts"
    val ckpt = s"$root/ckpt"
    Seq((1L, "a b c d e f g"), (2L, "x y z w q r s"))
      .toDF("doc_id", "text").write.parquet(s"$corpusDir/documents.parquet")

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    mem.addData(
      (10L, "a b c d e f g"), // exact dup of corpus doc 1 → drop
      (11L, "fresh new document content entirely unlike others"), // admit
      (12L, "fresh new document content entirely unlike others")) // within-batch copy of 11 → drop
    IngestGate.start(corpusDir, stream, landing, receiptsDir, ckpt)
      .awaitTermination()

    val landed1 = spark.read.parquet(landing).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(landed1.toSeq == Seq(11L), s"batch-0 landing: ${landed1.toSeq}")

    mem.addData(
      (20L, "fresh new document content entirely unlike others"), // exact dup of LANDED 11 → drop
      (21L, "a b c d e f h"), // near dup of corpus doc 1 (j = 2/3) → drop
      (22L, "another wholly distinct body of text to admit"))     // admit
    IngestGate.start(corpusDir, stream, landing, receiptsDir, ckpt)
      .awaitTermination()

    val landed2 = spark.read.parquet(landing).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(landed2.toSeq == Seq(11L, 22L), s"batch-1 landing: ${landed2.toSeq}")

    val receipts = spark.read.parquet(receiptsDir)
      .collect().map(r => r.getLong(0) -> (
        (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          r.getBoolean(5), r.getLong(6)))).toMap
    assert(receipts.size == 6, s"one receipt per arrival: $receipts")
    val (e10, d10, dup10, b0) = receipts(10L)
    assert(e10 && dup10 && d10.contains(1L), s"10: ${receipts(10L)}")
    assert(!receipts(11L)._3, "11 must be admitted")
    val (e12, d12, dup12, _) = receipts(12L)
    assert(e12 && dup12 && d12.contains(11L), "12 is a within-batch copy of 11")
    val (e20, d20, dup20, b1) = receipts(20L)
    assert(e20 && dup20, s"20 is an exact dup of the LANDED doc 11: ${receipts(20L)}")
    val (e21, d21, dup21, _) = receipts(21L)
    assert(!e21 && dup21 && d21.contains(1L), s"21 near-dups corpus doc 1: ${receipts(21L)}")
    assert(!receipts(22L)._3, "22 must be admitted")
    assert(b0 != b1, "the two arrivals ran in different micro-batches")
  }
}
