package graft.tools

import graft.functions.{Normalizer, Udfs}
import graft.operators.{InvoicePipeline, TrustScoring}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Distributed-side slice attribution for q_invoice_pipeline: times the
  * query built up one stage at a time (construction → +parse UDF →
  * +norm_text → +trust columns → full query projection) under the bench's
  * toRdd action and core basis, so the scoreboard number decomposes into
  * stage deltas. Usage: PipelineSlices [sfDir] [runs]. */
object PipelineSlices {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus = InvoicePipeline.syntheticCorpus(spark, sfDir)
    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[slices] $label%-34s ${ts.min}%6.2f – ${ts.max}%6.2f s")
    }

    timed("construction only")(corpus)
    timed("construction, no repartition")(
      InvoicePipeline.syntheticCorpus(spark, sfDir, spread = false))
    timed("+ parse UDF (invoice struct)")(
      corpus.withColumn("invoice", Udfs.normalizeAndParse(col("text"), lit(null).cast("string"))))
    timed("+ parse, project scalars only")(
      corpus.withColumn("invoice", Udfs.normalizeAndParse(col("text"), lit(null).cast("string")))
        .select(col("doc_id"), col("invoice.emission_date"), col("invoice.financials.total")))
    timed("+ norm_text column")(
      corpus.withColumn("norm_text", Normalizer.normalizeTextCol(col("text"))))
    timed("+ parse + trust (process())")(InvoicePipeline.process(corpus))
    timed("full query (select + orderBy)")(InvoicePipeline.query(spark, sfDir))
    spark.stop()
  }
}
