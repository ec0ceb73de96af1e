package graft.tools

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Slice attribution for the composed pipeline's dominant stage (the rule
  * gates: 62–76% of the 5M/20M end-to-end wall): times the prefix built
  * up one slice at a time — raw scan, +synthetic page concat, +C4 line
  * cleaning, +C4 keep filter, full ruleGates (+Gopher on survivors) —
  * under the bench's toRdd action, so the 500 s (20M) stage decomposes
  * into slice deltas before anyone optimizes the wrong regex.
  * Usage: RulesProfile [docsDir] [runs]. */
object RulesProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_pipe_e2e_5m/corpus")
    val runs = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    println(s"[rules] corpus: ${docs.count()} docs from $dir")

    def timed(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count() // warm
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[rules] $label%-40s ${ts.min}%7.2f – ${ts.max}%7.2f s")
    }

    def paged = docs.withColumn("__page",
      concat(TextAnalysis.c4SyntheticPage,
        when(col("doc_id") % 3 === 0,
          lit("\nand that have with of to be the.")).otherwise(lit(""))))

    timed("scan only")(docs)
    timed("+ synthetic page concat")(paged)
    timed("+ C4 clean (all columns)")(
      TextAnalysis.c4CleanOn(paged, col("__page")))
    timed("+ C4 keep filter + project")(
      TextAnalysis.c4CleanOn(paged, col("__page"))
        .filter(col("kept"))
        .select(col("doc_id"), col("source"), col("clean_text").as("text")))
    timed("full ruleGates (+Gopher)")(Sampling.ruleGates(docs))
    spark.stop()
  }
}
