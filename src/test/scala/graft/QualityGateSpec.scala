package graft

import graft.operators.QualityClassifier
import graft.streaming.QualityGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming quality gate vs its batch equivalent: per-batch scores
  * must equal [[QualityClassifier.scoreDocs]] run as a plain batch over
  * the same rows (the gate adds delivery plumbing, never semantics),
  * receipts name every arrival, and only above-threshold docs land. */
class QualityGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("two-batch gate: receipts complete, landing thresholded, scores ≡ batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-qgate").toString

    // fit offline on the real corpus with source-derived labels
    val labeled = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        col("source").isin(QualityClassifier.PositiveSources: _*).as("label"),
        col("text"))
    val dim = 64
    val (model, totals) = QualityClassifier.train(spark, labeled, dim)
    model.persist(); totals.persist()

    val arrivals = Seq(
      (101L, "some plainly ordinary arriving text"),
      (102L, "another arriving document with different tokens"),
      (103L, ""))
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF.toDF("doc_id", "text")
    // doc 102 is redelivered WITHIN the batch: the gate must collapse it
    // to one representative (one receipt, single-copy score) instead of
    // blending both copies' token counts into a doubled score
    mem.addData(arrivals :+ (102L, "another arriving document with different tokens"): _*)

    // threshold at the batch-computed median so BOTH outcomes occur
    val batchScores = QualityClassifier.scoreDocs(
      arrivals.toDF("doc_id", "text"), model, totals, dim)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val threshold = batchScores.values.toSeq.sorted.apply(1)

    QualityGate.start(stream, model, totals,
      s"$root/landing", s"$root/receipts", s"$root/ckpt",
      dim = dim, threshold = threshold).awaitTermination()

    val receiptRows = spark.read.parquet(s"$root/receipts").collect()
    assert(receiptRows.length == arrivals.length,
      "exactly one receipt per distinct doc_id in the batch")
    val receipts = receiptRows.map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("score"), r.getAs[Boolean]("admitted"))).toMap
    assert(receipts.keySet == arrivals.map(_._1).toSet, "a receipt per arrival")
    // streaming scores ≡ batch scores, bit-for-bit (same plan, same model)
    arrivals.foreach { case (id, _) =>
      assert(receipts(id)._1 == batchScores(id), s"doc $id score drifted")
      assert(receipts(id)._2 == (batchScores(id) > threshold))
    }
    val landed = spark.read.parquet(s"$root/landing")
    val landedIds = landed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(landedIds == batchScores.filter(_._2 > threshold).keySet)
    // admitted rows carry their text for downstream consumption
    assert(landed.columns.toSet == Set("doc_id", "score", "text"))

    // second batch: replays of doc 101 plus one new arrival — receipts
    // accrue per attempt (at-least-once, honestly labeled by batch_id)
    mem.addData((101L, "some plainly ordinary arriving text"),
      (104L, "a closing arrival"))
    QualityGate.start(stream, model, totals,
      s"$root/landing", s"$root/receipts", s"$root/ckpt",
      dim = dim, threshold = threshold).awaitTermination()
    val receipts2 = spark.read.parquet(s"$root/receipts")
    assert(receipts2.filter(col("doc_id") === 101L).count() == 2)
    assert(receipts2.select("batch_id").distinct().count() == 2)
    model.unpersist(); totals.unpersist()
  }
}
