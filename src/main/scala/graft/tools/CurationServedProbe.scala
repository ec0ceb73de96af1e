package graft.tools

import graft.operators.{LanguageModel, QualityClassifier, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the build-once/serve-per-batch decoupling of the persisted-
  * model curation deployment ([[Sampling.buildCurationModels]] /
  * [[Sampling.serveCuration]]) against the self-contained in-query form
  * ([[Sampling.curationLearned]], which must re-train per run — the
  * oracle shape, and the board's most expensive queries):
  *
  *   - `learned in-query` — train + serve fused, the q_curation_learned
  *     wall;
  *   - `build models` — NB + LM training, threshold calibration, three
  *     table writes: paid once per model generation;
  *   - `serve batch ×3` — per-batch cost on 10% slices: NB scoring via
  *     the broadcast llr table, stored thresholds, LM scoring via the
  *     stored counts, langid + quota. The deployment number.
  *
  * A second mode scales the TRAINING corpus by replication factors while
  * holding the served batch at the base size, to show the decoupling:
  * build cost tracks the corpus, per-batch serve cost does not
  * (replicated docs get re-keyed ids and rep-salted text so neither
  * dedup nor the LM vocabulary collapses the copies).
  *
  * Usage: CurationServedProbe [docsDir [factor...]]. */
object CurationServedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[curserved] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    println(s"[curserved] corpus: ${docs.count()} docs from $dir")

    // the learned pipeline's shared exact-dedup prefix — the SAME helper
    // buildCurationModels/curationLearned consume, so the probe's input
    // cannot silently diverge from what it claims to measure
    val deduped = Sampling.exactDedupOn(docs)

    timed("learned in-query (oracle)") {
      Sampling.curationLearned(spark, dir).queryExecution.toRdd.count()
    }
    val tag = "curservedprobe"
    // phase breakdown of the build (r15 opt attribution): re-run the
    // public pieces buildCurationModels composes, timed individually —
    // same relations, same calls
    if (sys.env.contains("GRAFT_CURPROBE_PHASES")) {
      val ptag = tag + "ph"
      val dedupCk = org.apache.spark.sql.graft.CheckpointShim
        .statsHonestLocalCheckpoint(deduped)
      val labeled = dedupCk.select(col("doc_id"),
        col("source").isin(QualityClassifier.PositiveSources: _*).as("label"),
        col("text"))
      val (m0, t0) = timed("phase: NB train")(
        QualityClassifier.train(spark, labeled, QualityClassifier.DefaultDim))
      timed("phase: NB persist")(
        QualityClassifier.persist(spark, ptag, m0, t0, QualityClassifier.DefaultDim))
      val ref = dedupCk.filter(col("source").isin(QualityClassifier.PositiveSources: _*))
        .select("doc_id", "text")
      val (c12a, c1a, va) = timed("phase: LM train (lazy)")(LanguageModel.trainOn(ref))
      timed("phase: LM persist")(LanguageModel.persist(spark, ptag, c12a, c1a, va))
      val (lm, lp, ldim) = timed("phase: QC load")(QualityClassifier.load(spark, ptag))
      val (sc12, sc1, sv) = timed("phase: LM load")(LanguageModel.load(spark, ptag))
      val scored = timed("phase: calib NB scoring (ckpt)")(
        org.apache.spark.sql.graft.CheckpointShim
          .statsHonestLocalCheckpoint(dedupCk.join(
            QualityClassifier.scoreDocs(dedupCk.select("doc_id", "text"), lm, lp, ldim)
              .select("doc_id", "score"), "doc_id")))
      val tauC = timed("phase: tauC percentile")(
        scored.agg(round(expr("percentile(score, 0.5)"), 6)).collect()(0).getDouble(0))
      val gated = scored.filter(col("score") >= tauC)
      val withPpl = gated.join(
        LanguageModel.scoreWith(gated.select("doc_id", "text"), sc12, sc1, sv), "doc_id")
        .filter(col("n_bigrams") > 0)
      timed("phase: tauP (LM scoring + pct)")(
        withPpl.agg(round(expr("percentile(ppl, 2.0/3)"), 6)).collect()(0).getDouble(0))
      // serve-side phase split over a 10% batch, same pieces serveCuration
      // composes (loads + NB scoring barrier + the gate/band/quota tail)
      val batch0 = dedupCk.filter(col("doc_id") % 10 === 7)
      val (lm2, lp2, ldim2) = timed("phase[serve]: QC load")(
        QualityClassifier.load(spark, ptag))
      val (tc12, tc1, tv) = timed("phase[serve]: LM load")(
        LanguageModel.load(spark, ptag))
      val scored0 = timed("phase[serve]: NB scoring (ckpt)")(
        org.apache.spark.sql.graft.CheckpointShim
          .statsHonestLocalCheckpoint(batch0.join(
            QualityClassifier.scoreDocs(batch0.select("doc_id", "text"), lm2, lp2, ldim2)
              .select("doc_id", "score"), "doc_id")))
      val gated0 = scored0.filter(col("score") >= 0.0)
      timed("phase[serve]: LM score + tail")(
        gated0.join(
          LanguageModel.scoreWith(gated0.select("doc_id", "text"), tc12, tc1, tv), "doc_id")
          .filter(col("n_bigrams") > 0).queryExecution.toRdd.count())
      Seq(QualityClassifier.modelTable(ptag), LanguageModel.modelTable(ptag))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    timed("build models (once)") {
      Sampling.buildCurationModels(spark, deduped, tag)
    }
    (0 until 3).foreach { b =>
      val batch = deduped.filter(col("doc_id") % 10 === b)
      timed(s"serve batch $b (10% slice)") {
        Sampling.serveCuration(spark, batch, tag).queryExecution.toRdd.count()
      }
    }
    Seq(QualityClassifier.modelTable(tag), LanguageModel.modelTable(tag),
      Sampling.calibTable(tag)).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // scaled mode: training corpus ×k, served batch held at base size
    factors.foreach { k =>
      val corpus = deduped
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("doc_id") * k + col("rep")).as("doc_id"), col("source"),
          concat(col("text"), lit(" rep"), col("rep")).as("text"))
        .repartition(spark.sparkContext.defaultParallelism)
      println(s"[curserved] ===== training corpus ×$k (${corpus.count()} docs) =====")
      val ktag = s"curservedprobe$k"
      timed(s"build models over ×$k")(
        Sampling.buildCurationModels(spark, corpus, ktag))
      val batch = corpus.filter(col("doc_id") % k === 0) // base-sized batch (rep 0)
      (0 until 2).foreach { b =>
        timed(s"serve base batch (pass $b)") {
          Sampling.serveCuration(spark, batch, ktag).queryExecution.toRdd.count()
        }
      }
      Seq(QualityClassifier.modelTable(ktag), LanguageModel.modelTable(ktag),
        Sampling.calibTable(ktag)).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    spark.stop()
  }
}
