package graft.tools

import org.apache.spark.sql.SparkSession

/** Reproduces (or acquits) the r14 observation that anchors measured
  * INSIDE a bench JVM read 3–4× the quiet floor while standalone probes
  * read the floor before and after: same session config as Bench, anchor
  * floor BEFORE anything else, then the exact sf0.001 prewarm loop the
  * bench runs (all queries, materialize + block-drop), then the anchor
  * again — the delta isolates what the JVM accumulates from the query
  * churn (code cache, GC state, block-manager residue) from machine
  * conditions, which the interleaved standalone probes already cleared. */
object AnchorDegrade {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def point(): Double = (1 to 3).map(_ => graft.Bench.anchorOnce(spark)).min
    // GRAFT_DEGRADE_SKIP_FRESH reproduces the BENCH's ordering: the
    // anchor's generated class is first compiled AFTER the 108-query
    // prewarm has churned the JIT/code cache — the r14 hypothesis for
    // why in-bench anchors read 3-4x the floor while this tool's default
    // ordering (anchor compiled on a clean JVM) stays at the floor.
    if (!sys.env.contains("GRAFT_DEGRADE_SKIP_FRESH")) {
      val w = graft.Bench.calibrateWarmup(spark)
      println(f"[degrade] warmup $w runs; fresh-JVM point: ${point()}%.3f s")
    } else println("[degrade] skipping fresh-JVM anchor (bench ordering)")
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.count()
    def dropBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    val warmDir = "/root/testdata/sf0.001"
    val t0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try mat(fn(spark, warmDir))
      catch { case e: Throwable => System.err.println(s"[degrade] $name: ${e.getMessage}") }
      finally dropBlocks()
    }
    println(f"[degrade] prewarm loop: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val w2 = graft.Bench.calibrateWarmup(spark)
    println(f"[degrade] post-prewarm warmup $w2 runs")
    println(f"[degrade] post-prewarm point: ${point()}%.3f s")
    println(f"[degrade] post-prewarm point (again): ${point()}%.3f s")
    // does an explicit settle help? (GC + pause, then re-measure)
    System.gc(); Thread.sleep(5000)
    println(f"[degrade] after gc+5s settle: ${point()}%.3f s")
    spark.stop()
  }
}
