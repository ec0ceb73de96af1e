package graft.tools

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-attributed wall for the v3 curation pipeline at corpus scale:
  * run the rule-gate prefix, the prefix+dedup, and the full composed
  * pipeline against a documents dir and report each wall plus the
  * funnel counts. Prefix walls overlap (each run recomputes the earlier
  * stages — stated, not hidden), so stage attribution is by difference
  * with that caveat. Usage: CurationScaleProbe [docsDir]. */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale1000x_vec")
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
      println(f"[curscale] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val n0 = spark.read.parquet(s"$dir/documents.parquet").count()
    println(s"[curscale] corpus: $n0 docs from $dir")

    // the EXACT pipeline prefix (shared definition — see Sampling.ruleGates)
    def rules = Sampling.ruleGates(
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text"))
    val n1 = timed("rule gates (C4+Gopher)")(rules.count())
    val n2 = timed("rules + exact dedup") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("fp").orderBy("doc_id")
      rules.withColumn("fp", graft.operators.Dedup.canonicalFp(col("text")))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    }
    val out = timed("full v3 (learned tail incl.)") {
      val df = Sampling.curationRules(spark, dir)
      df.queryExecution.toRdd.count()
    }
    println(s"[curscale] funnel: $n0 -> rules $n1 -> dedup $n2 -> sampled $out")
    spark.stop()
  }
}
