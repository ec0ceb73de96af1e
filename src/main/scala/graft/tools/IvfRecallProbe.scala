package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Print IVF recall@k vs the exact top-k for a range of Lloyd iteration
  * counts — the measurement behind the trained-centroid recall spec and
  * docs/PERF.md's IVF paragraph.
  *
  * Usage: runMain graft.tools.IvfRecallProbe [sfDir] [k] [nprobe]
  */
object IvfRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val k = if (args.length > 1) args(1).toInt else 5
    val nprobe = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val exact = Similarity.topK(spark, sfDir, k = k, nQueries = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    for (iters <- 0 to 3) {
      val ivf = Similarity.ivfSearch(spark, sfDir, nCentroids = 8, nprobe = nprobe, k = k,
          nQueries = 50, iters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (exact & ivf).size.toDouble / exact.size
      println(f"[ivf-recall] sf=$sfDir iters=$iters nprobe=$nprobe recall@$k = $recall%.4f")
    }
    spark.stop()
  }
}
