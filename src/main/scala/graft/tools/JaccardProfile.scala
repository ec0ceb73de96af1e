package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the jaccard feed at sf0.1. */
object JaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
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
      // stage-wise mirror of jaccardPairsUnsorted
      val exploded = graft.operators.Dedup.shingleRows(docs)
      val hot = exploded.groupBy("shingle")
        .agg(count(lit(1)).as("df")).filter(col("df") > 1000).select("shingle")
      val kept = exploded.join(broadcast(hot), Seq("shingle"), "left_anti")
      val buckets = time("buckets checkpoint") {
        kept.groupBy("shingle").agg(collect_list(col("doc_id")).as("ids"))
          .select("ids").localCheckpoint()
      }
      time("cnts agg") {
        buckets.select(explode(col("ids")).as("doc_id"))
          .groupBy("doc_id").agg(count(lit(1)).as("cnt")).count()
      }
      import spark.implicits._
      val rawPairs = buckets.as[Seq[Long]].flatMap { b =>
        val ids = b.toArray; java.util.Arrays.sort(ids)
        for (i <- ids.indices.iterator; j <- Iterator.range(i + 1, ids.length))
          yield (ids(i), ids(j))
      }.toDF("id_a", "id_b")
      time("pair agg") {
        rawPairs.groupBy("id_a", "id_b").agg(count(lit(1)).as("shared")).count()
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
