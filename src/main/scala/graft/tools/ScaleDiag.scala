package graft.tools

import graft.SparkEntry
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Follow-up diagnostics for the two super-linear results ScaleProbe
  * surfaced at 10×:
  *
  *   1. q_ann_lsh (14.3× warm): with FIXED banding parameters the
  *      random-collision noise floor (P ≈ 1.2% per pair at 48×12) is
  *      QUADRATIC in corpus size — candidates grow ~100× when the corpus
  *      grows 10×. LSH parameters are scale-dependent by design: deeper
  *      bands (more planes) cut the noise floor exponentially while more
  *      bands restore recall. This tool measures 48×12 vs 128×16 at 10×.
  *   2. q_passages / q_winnow_overlap (11-14×): hypothesis — partition
  *      pressure, not algorithm: the probe pins 32 shuffle partitions at
  *      both scales, so 10× data means 10× rows per partition (GC/spill).
  *      Measured at 32 vs 128 partitions.
  *
  * Usage: runMain graft.tools.ScaleDiag [scaledDir]
  */
object ScaleDiag {
  def main(args: Array[String]): Unit = {
    val gen = args.headOption.getOrElse("/tmp/graft_scale10x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      try { mk.count(); () } catch { case e: Throwable =>
        System.err.println(s"[diag] prewarm $label: ${e.getMessage}") }
      finally drop()
      val t0 = System.nanoTime()
      val n = try mk.count() finally drop()
      println(f"[diag] $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.2f s  $n%d rows")
    }
    for (parts <- Seq(cpus.toInt, 128)) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      time(s"q_winnow_overlap 10x parts=$parts") {
        SparkEntry.queries("q_winnow_overlap")(spark, gen)
      }
      time(s"q_passages 10x parts=$parts") {
        SparkEntry.queries("q_passages")(spark, gen)
      }
    }
    spark.conf.set("spark.sql.shuffle.partitions", cpus.toInt)
    time("ann_lsh 10x 48 bands x 12 planes (shipped)") {
      Similarity.annPairsOn(Similarity.augmentedEmb(spark, gen), 0.8, bands = 48, planesPerBand = 12)
    }
    time("ann_lsh 10x 128 bands x 16 planes (rescaled)") {
      Similarity.annPairsOn(Similarity.augmentedEmb(spark, gen), 0.8, bands = 128, planesPerBand = 16)
    }
    spark.stop()
  }
}
