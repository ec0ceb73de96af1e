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
