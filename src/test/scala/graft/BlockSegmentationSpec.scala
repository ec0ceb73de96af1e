package graft

import graft.functions.{InvoiceParser, Normalizer}
import graft.operators.{BlockSegmentation, InvoicePipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The columnar (window-based) block segmentation must agree line-for-line
  * with the UDF (character-offset) segmentation on normalized fiscal
  * documents — SURVEY §2.4's two physical strategies for the same logical
  * operator. */
class BlockSegmentationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def lineSet(block: String): Seq[String] =
    block.split("\n").filter(_.nonEmpty).toSeq

  test("columnar segmentation equals UDF segmentation on 150 synthetic invoices") {
    val corpus = InvoicePipeline.syntheticCorpus(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 150)
      .withColumn("norm", Normalizer.normalizeTextCol(col("text")))
      .select("doc_id", "norm")
    val columnar = BlockSegmentation.segment(corpus, "doc_id", "norm")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r => r.getString(1) -> r.getString(2)).toMap).toMap
    corpus.collect().foreach { row =>
      val (id, norm) = (row.getLong(0), row.getString(1))
      val udf = InvoiceParser.extractBlocks(norm)
      val col = columnar(id)
      for (bt <- Seq("HEADER", "ISSUER", "RECIPIENT", "ITEMS", "FINANCIALS")) {
        val udfLines = lineSet(udf.getOrElse(bt, ""))
        val colLines = col.get(bt).map(lineSet).getOrElse(Seq.empty)
        assert(udfLines == colLines, s"doc $id block $bt:\nudf=$udfLines\ncol=$colLines")
      }
    }
  }

  test("lineCounts kernel equals the windowed counts query on the corpus") {
    val dir = "/root/testdata/sf0.001"
    val kernel = BlockSegmentation.query(spark, dir).collect().map(r => r.getLong(0) -> r).toMap
    val windowed = BlockSegmentation.queryWindowed(spark, dir).collect()
    assert(windowed.length == kernel.size)
    windowed.foreach { w =>
      val k = kernel(w.getLong(0))
      for (i <- 1 to 5)
        assert(k.getLong(i) == w.getLong(i), s"doc ${w.getLong(0)} col $i: ${k} vs ${w}")
    }
  }

  test("lineCounts kernel edge cases: empty text, marker-first text, no markers") {
    // empty text → one empty HEADER line (posexplode_outer of split("", "\n"))
    assert(BlockSegmentation.lineCounts("") ==
      graft.operators.BlockLineCounts(1, 0, 0, 0, 0))
    assert(BlockSegmentation.lineCounts(null) ==
      graft.operators.BlockLineCounts(1, 0, 0, 0, 0))
    // marker on the first line → zero HEADER lines
    assert(BlockSegmentation.lineCounts("PRESTADOR DE SERVIÇOS\nACME LTDA") ==
      graft.operators.BlockLineCounts(0, 2, 0, 0, 0))
    // no markers anywhere → everything is HEADER
    assert(BlockSegmentation.lineCounts("a\nb\nc") ==
      graft.operators.BlockLineCounts(3, 0, 0, 0, 0))
    // trailing newline keeps its empty line, like Spark's split
    assert(BlockSegmentation.lineCounts("a\n") ==
      graft.operators.BlockLineCounts(2, 0, 0, 0, 0))
  }

  test("columnar segmentation matches on the golden fixture") {
    import spark.implicits._
    val norm = Normalizer.normalizeText(graft.tools.GoldenFixture.text)
    val out = BlockSegmentation.segment(Seq((1L, norm)).toDF("doc_id", "text"))
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    val udf = InvoiceParser.extractBlocks(norm)
    Seq("HEADER", "ISSUER", "RECIPIENT", "ITEMS", "FINANCIALS").foreach { bt =>
      assert(lineSet(udf(bt)) == out.get(bt).map(lineSet).getOrElse(Seq.empty), bt)
    }
  }
}
