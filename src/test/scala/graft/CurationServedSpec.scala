package graft

import graft.operators.{LanguageModel, QualityClassifier, Sampling, WarehouseTables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-model curation deployment (build once / serve per batch).
  * The oracle pins q_curation_served row-identical to q_curation_learned
  * at sf0.01; these specs pin the pieces the hash can't explain: the
  * stored-path ≡ recompute-path equality at another SF, serving a batch
  * the models never saw, torn-table loudness, and the marker-gated orphan
  * reconciliation. */
class CurationServedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("served curation ≡ in-query learned curation, row for row") {
    val served = Sampling.curationServed(spark, sf).collect().map(_.toString).sorted
    val learned = Sampling.curationLearned(spark, sf).collect().map(_.toString).sorted
    assert(served.length == learned.length && served.nonEmpty)
    served.zip(learned).foreach { case (s, l) => assert(s == l) }
  }

  test("curationServed leaves no warehouse tables behind (read-only oracle query)") {
    Sampling.curationServed(spark, sf).collect()
    val tag = s"qcurserved_${sf.replaceAll("[^a-zA-Z0-9]", "_")}"
    Seq(QualityClassifier.modelTable(tag), LanguageModel.modelTable(tag),
      Sampling.calibTable(tag)).foreach { t =>
      assert(!spark.catalog.tableExists(t), s"$t left behind")
    }
  }

  test("serve scores a batch the models never saw, from tables alone") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    Sampling.buildCurationModels(spark, train, "curtest", dim = 64)
    try {
      val out = Sampling.serveCuration(spark, batch, "curtest", quota = 10)
      val rows = out.collect()
      assert(rows.nonEmpty)
      // quota respected per language; every kept doc comes from the batch
      val byLang = rows.groupBy(_.getString(1))
      byLang.values.foreach(g => assert(g.length <= 10))
      rows.foreach(r => assert(r.getLong(0) % 2 == 1))
      // thresholds came from the stored calibration, not the batch: the
      // calib table carries exactly tau_c and tau_p
      val cal = spark.table(Sampling.calibTable("curtest"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(cal.keySet == Set("tau_c", "tau_p"))
    } finally Seq(QualityClassifier.modelTable("curtest"),
      LanguageModel.modelTable("curtest"), Sampling.calibTable("curtest"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("LanguageModel persist/load round-trips the exact counts") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b")).toDF("doc_id", "text")
    val (c12, c1, v) = LanguageModel.trainOn(docs)
    LanguageModel.persist(spark, "lmtest", c12, c1, v)
    try {
      val (l12, l1, lv) = LanguageModel.load(spark, "lmtest")
      assert(l12.collect().map(_.toString).sorted
        .sameElements(c12.collect().map(_.toString).sorted))
      assert(l1.collect().map(_.toString).sorted
        .sameElements(c1.collect().map(_.toString).sorted))
      assert(lv.collect()(0).getLong(0) == v.collect()(0).getLong(0))
      // scoring through the loaded model equals self-trained scoring
      val a = LanguageModel.scoreWith(docs, l12, l1, lv).collect().map(_.toString).sorted
      val b = LanguageModel.scoreOn(docs, docs).collect().map(_.toString).sorted
      assert(a.sameElements(b))
    } finally spark.sql(s"DROP TABLE IF EXISTS ${LanguageModel.modelTable("lmtest")}")
  }

  test("torn LM model table loads loudly") {
    import spark.implicits._
    Seq(("c12", "a", "b", 1L)).toDF("kind", "w1", "w2", "n")
      .write.mode("overwrite").saveAsTable(LanguageModel.modelTable("lmtorn"))
    try {
      val e = intercept[IllegalArgumentException](LanguageModel.load(spark, "lmtorn"))
      assert(e.getMessage.contains("torn"))
    } finally spark.sql(s"DROP TABLE IF EXISTS ${LanguageModel.modelTable("lmtorn")}")
  }

  test("orphan reconciliation deletes marker-bearing dirs, refuses foreign ones") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val fs = new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // marker-bearing orphan: reconciled silently
    val marked = new org.apache.hadoop.fs.Path(s"$warehouse/orphan_marked")
    fs.mkdirs(marked)
    fs.create(new org.apache.hadoop.fs.Path(marked, WarehouseTables.MarkerFile), true).close()
    WarehouseTables.reconcileOrphan(spark, "orphan_marked")
    assert(!fs.exists(marked))
    // markerless non-empty orphan: loud refusal, data untouched
    val foreign = new org.apache.hadoop.fs.Path(s"$warehouse/orphan_foreign")
    fs.mkdirs(foreign)
    val payload = new org.apache.hadoop.fs.Path(foreign, "data.parquet")
    fs.create(payload, true).close()
    val e = intercept[IllegalArgumentException](
      WarehouseTables.reconcileOrphan(spark, "orphan_foreign"))
    assert(e.getMessage.contains("remove the directory manually"))
    assert(fs.exists(payload))
    fs.delete(foreign, true)
  }
}
