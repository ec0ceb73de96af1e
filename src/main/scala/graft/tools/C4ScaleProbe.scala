package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 1×→100× scaling of the C4 line-cleaning kernel: duplicate the sf0.1
  * corpus k× with re-keyed doc_ids, synthesize the same deterministic
  * multi-line page the oracle query uses (so the line rules actually
  * fire), run [[TextAnalysis.c4CleanOn]] under the bench's honest
  * toRdd action, and print wall + verdict census. The kernel claims
  * scan-speed / shuffle-free — the probe asserts the executed plan
  * carries no Exchange and reports µs/doc so the linearity is visible.
  * Usage: C4ScaleProbe [sfDir] [factors…] (default 1 10 100). */
object C4ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    factors.foreach { k =>
      val docs = base
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("doc_id") * k + col("rep")).as("doc_id"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism)
      def clean(d: org.apache.spark.sql.DataFrame) =
        TextAnalysis.c4CleanOn(d.withColumn("__c_text", TextAnalysis.c4SyntheticPage),
          col("__c_text"))
          .select("doc_id", "n_lines", "n_lines_kept", "n_sentences",
            "has_lorem", "has_brace", "kept", "clean_text")
      val cleaned = clean(docs)
      // the kernel below the repartition must add no Exchange of its own
      val kernelPlan = clean(base).queryExecution.executedPlan.toString
      require(!kernelPlan.contains("Exchange"),
        s"c4 kernel plan grew a shuffle:\n$kernelPlan")
      val t0 = System.nanoTime()
      val n = cleaned.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val kept = cleaned.filter(col("kept")).count()
      println(f"[c4scale] ${k}%4dx  docs=$n%9d  wall ${wall}%7.2f s  " +
        f"${wall * 1e6 / n}%7.2f us/doc  kept=$kept (${100.0 * kept / n}%.1f%%)")
    }
    spark.stop()
  }
}
