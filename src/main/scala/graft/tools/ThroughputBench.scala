package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Apples-to-apples throughput: the golden fixture replicated N times
  * through the full normalize→parse→validate pipeline. */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.range(n).select(col("id"),
      lit(GoldenFixture.text).as("text")).repartition(cpus.toInt).cache()
    docs.count() // materialize input
    // warmup
    graft.operators.InvoicePipeline.process(docs.limit(1000)).select(max(col("trust_score"))).collect()
    val t0 = System.nanoTime()
    val ok = graft.operators.InvoicePipeline.process(docs)
      .filter(col("status") === "success").count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[throughput] $n docs in $dt%.2f s -> ${n / dt}%.0f docs/s on $cpus cores (${n / dt / cpus.toInt}%.0f docs/s/core), $ok success")
    spark.stop()
  }
}
