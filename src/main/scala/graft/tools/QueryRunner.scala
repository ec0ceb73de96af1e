package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Run one named SparkEntry query repeatedly and print per-run wall time +
  * row count — the single-query iteration loop for plan/perf work
  * (Bench runs everything; this isolates one).
  *
  * Usage: runMain graft.tools.QueryRunner <query> [sfDir] [repeats]
  */
object QueryRunner {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: QueryRunner <query> [sfDir] [n]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder()
      // default 4 = graft.Bench's default (SPARK_GRAFT_CPUS unset), so
      // isolated numbers compare against the official scoreboard on the
      // same core basis — the r10 fused-kernel table mixed 4-core bench
      // baselines with 32-core QueryRunner numbers (docs/PERF.md r10
      // correction); export SPARK_GRAFT_CPUS to probe scaling
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SchemaCanary.preflight(spark.sparkContext.hadoopConfiguration, Seq(sfDir))
    // same per-query hygiene as graft.Bench, so isolated numbers compare
    // against suite numbers on harness-equal terms: codegen prewarmed at
    // the smallest SF, checkpoint blocks/shuffle garbage dropped between
    // runs (without this, repeated runs accumulate localCheckpoint blocks
    // and "warm" drifts slower for harness reasons, not query reasons)
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    // graft.Bench's honest action: toRdd demands every output column, so
    // the optimizer cannot prune the query's own projections the way a
    // bare count() does
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    try materialize(fn(spark, "/root/testdata/sf0.001"))
    catch { case e: Throwable => System.err.println(s"[queryrunner] prewarm: ${e.getMessage}") }
    finally drop()
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      val rows = materialize(fn(spark, sfDir))
      val sec = (System.nanoTime() - t0) / 1e9
      drop()
      println(f"[queryrunner] $name run $i: $sec%.3f s, $rows rows")
    }
    spark.stop()
  }
}
