package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off profiler for dupClusters: cold + warm timing with per-round
  * debug output (GRAFT_CC_DEBUG is read by Dedup.dupClusters). */
object CcProfile {
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
    for (pass <- Seq("cold", "warm", "warm2")) {
      val t0 = System.nanoTime()
      val n = graft.operators.Dedup.dupClusters(spark, sfDir).count()
      System.err.println(f"[cc] $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
