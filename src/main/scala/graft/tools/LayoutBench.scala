package graft.tools

import scala.jdk.CollectionConverters._

import graft.operators.{EventOps, Layout}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the READ-side payoff of [[Layout]] — the round-4 verdict noted
  * the clustered writes are footer-verified but the pruning win was
  * asserted, not measured.
  *
  * Experiment: the sf0.1 events table (100k rows, nanos timestamps read
  * through EventOps) written two ways —
  *   unclustered: `repartition(numFiles)` hash scatter (every file spans
  *     the full time range — the shape a parallel writer produces), vs
  *   range-clustered: [[Layout.writeRangeClustered]] on `ts` (each file
  *     and row group owns a disjoint time slice).
  * Then a ~5%-of-range time-slice aggregation runs on both. Reported per
  * layout: row groups whose footer min/max overlap the slice (the static
  * pruning bound, read via ParquetFileReader like LayoutSpec), Spark's
  * scan metrics (numFiles, numOutputRows), and warm wall time ×3.
  *
  * Usage: runMain graft.tools.LayoutBench [sfDir] [numFiles]
  */
object LayoutBench {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numFiles = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // the CONTROL write must also carry int64-micros stats — otherwise
      // the unclustered side loses to the clustered one for the wrong
      // reason (INT96 writes no stats at all; Layout.* sets this itself)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft-layoutbench").toString
    val ev = EventOps.events(spark, sfDir) // ts normalized to TimestampType
    val unclustered = s"$root/events_unclustered"
    val clustered = s"$root/events_clustered"
    ev.repartition(numFiles).write.parquet(unclustered)
    Layout.writeRangeClustered(ev, clustered, Seq("ts"), numFiles)

    // a ~5% slice of the actual time range
    val mm = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).collect()(0)
    val lo = mm.getTimestamp(0).getTime
    val hi = mm.getTimestamp(1).getTime
    val sliceLo = new java.sql.Timestamp(lo + (hi - lo) * 40 / 100)
    val sliceHi = new java.sql.Timestamp(lo + (hi - lo) * 45 / 100)
    println(s"[layout] slice [$sliceLo, $sliceHi) of " +
      s"[${new java.sql.Timestamp(lo)}, ${new java.sql.Timestamp(hi)}]")

    def sliceQuery(path: String): DataFrame =
      spark.read.parquet(path)
        .filter(col("ts") >= lit(sliceLo) && col("ts") < lit(sliceHi))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

    // static pruning bound from the footers: row groups whose ts min/max
    // overlap the slice (µs stats; the slice bounds are ms-precision so
    // the comparison in µs is exact)
    def rowGroupCensus(path: String): (Int, Int, Int, Int) = {
      val conf = spark.sparkContext.hadoopConfiguration
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      val files = fs.listStatus(dir).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      var total = 0; var hit = 0; var fileHit = 0
      files.foreach { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          val tsIdx = schema.getFields.asScala.indexWhere(_.getName == "ts")
          val blocks = reader.getFooter.getBlocks.asScala
          var anyHit = false
          blocks.foreach { b =>
            total += 1
            val st = b.getColumns.asScala(tsIdx).getStatistics
            val mn = st.genericGetMin.asInstanceOf[java.lang.Long]
            val mx = st.genericGetMax.asInstanceOf[java.lang.Long]
            val loUs = sliceLo.getTime * 1000L
            val hiUs = sliceHi.getTime * 1000L
            if (mx >= loUs && mn < hiUs) { hit += 1; anyHit = true }
          }
          if (anyHit) fileHit += 1
        } finally reader.close()
      }
      (files.length, fileHit, total, hit)
    }

    for ((label, path) <- Seq(("unclustered", unclustered), ("range-clustered", clustered))) {
      val (nf, fh, rg, rgh) = rowGroupCensus(path)
      sliceQuery(path).collect() // warm: plan + code compiled, file index loaded
      val times = (1 to 3).map { _ =>
        val df = sliceQuery(path)
        val t0 = System.nanoTime()
        df.collect()
        (System.nanoTime() - t0) / 1e9
      }
      // metrics on a FRESH plan executed exactly once (accumulators would
      // otherwise sum across the timing collects); the scan node hides
      // under AdaptiveSparkPlanExec, whose children are empty until the
      // final plan is materialized — unwrap it explicitly
      val dfm = sliceQuery(path)
      val rows = dfm.collect()(0)
      def findScan(p: org.apache.spark.sql.execution.SparkPlan): Option[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => findScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => findScan(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Some(s)
        case other => other.children.view.flatMap(findScan).headOption
      }
      val scan = findScan(dfm.queryExecution.executedPlan).map { s =>
        (s.metrics.get("numFiles").map(_.value), s.metrics.get("numOutputRows").map(_.value))
      }
      println(f"[layout] $label%-16s files=$nf (overlap $fh) rowGroups=$rg (overlap $rgh) " +
        f"warm=${times.min}%.3f/${times.sum / 3}%.3f s scanMetrics=$scan " +
        s"result n=${rows.getLong(0)}")
    }
    spark.stop()
  }
}
