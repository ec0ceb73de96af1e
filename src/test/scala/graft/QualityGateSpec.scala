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
    assert(landed.columns.toSet == Set("doc_id", "score", "text", "batch_id"))

    // second batch: a REDELIVERY of doc 101 plus one new arrival — it is
    // a new batch_id (new data, not a replay), so 101 accrues a second
    // receipt; replay-of-the-SAME-batch convergence is pinned below
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

  test("replay of the SAME batch_id converges: identical receipts and landing, no duplicates") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-qgate-replay").toString
    val labeled = Seq((1L, true, "alpha bravo alpha"), (2L, false, "zulu xray zulu"))
      .toDF("doc_id", "label", "text")
    val dim = 32
    val (model, totals) = QualityClassifier.train(spark, labeled, dim)
    val batch = Seq((10L, "alpha alpha bravo"), (11L, "zulu zulu xray"),
      (12L, "alpha zulu")).toDF("doc_id", "text")
    def snap(p: String): Seq[String] =
      spark.read.parquet(p).collect().map(_.toString).sorted.toSeq
    QualityGate.landBatch(batch, 7L, model, totals, dim, 0.0,
      s"$root/landing", s"$root/receipts")
    val (r1, l1) = (snap(s"$root/receipts"), snap(s"$root/landing"))
    assert(r1.length == 3 && l1.nonEmpty && l1.length < 3,
      s"need both outcomes for the pin: receipts=$r1 landing=$l1")
    // foreachBatch at-least-once: the SAME batch re-lands under the SAME
    // batch_id — dynamic partition overwrite rewrites its own partition,
    // so contents are byte-identical, not doubled
    QualityGate.landBatch(batch, 7L, model, totals, dim, 0.0,
      s"$root/landing", s"$root/receipts")
    assert(snap(s"$root/receipts") == r1, "replay duplicated receipts")
    assert(snap(s"$root/landing") == l1, "replay duplicated landing rows")
    // crash-between-writes: receipts committed, landing lost — the replay
    // restores the landing partition and leaves receipts identical
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/landing/batch_id=7"), true)
    QualityGate.landBatch(batch, 7L, model, totals, dim, 0.0,
      s"$root/landing", s"$root/receipts")
    assert(snap(s"$root/landing") == l1 && snap(s"$root/receipts") == r1,
      "replay did not reconcile a torn receipts/landing pair")
  }
}
