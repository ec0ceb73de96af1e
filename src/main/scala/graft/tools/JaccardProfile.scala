package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the jaccard feed at sf0.1. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[jp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (pass <- 1 to 3) {
      System.err.println(s"[jp] --- pass $pass ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      time("kernel count") {
        graft.operators.Dedup.shingleRows(docs).count()
      }
      // stage timing: the fused cap+bucket aggregation (the kernel's one
      // wide shuffle), then the end-to-end queries
      graft.plans.CappedCollectLong.ensureRegistered(spark)
      time("fused bucket agg") {
        graft.operators.Dedup.shingleRows(docs).withColumnRenamed("shingle", "key")
          .groupBy("key")
          .agg(expr(s"${graft.plans.CappedCollectLong.FuncName}(doc_id, 1000)").as("ids"))
          .filter(col("ids").isNotNull)
          .count()
      }
      time("full jaccardPairs") {
        graft.operators.Dedup.jaccardPairs(spark, sfDir).count()
      }
      time("dupClusters") {
        graft.operators.Dedup.dupClusters(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
