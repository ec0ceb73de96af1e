package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic: which stage ships how much task-result data to the driver.
  * Runs one query and prints per-stage Σ resultSize — the number that
  * trips spark.driver.maxResultSize. Usage:
  *   runMain graft.tools.ResultSizeProbe <dir> <queryName>
  */
object ResultSizeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale30x")
    val name = if (args.length > 1) args(1) else "q_winnow_overlap"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val agg = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val rs = if (t.taskMetrics != null) t.taskMetrics.resultSize else 0L
        agg.merge(t.stageId, ("", rs, 1),
          (a, b) => (a._1, a._2 + b._2, a._3 + b._3))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val info = s.stageInfo
        agg.merge(info.stageId, (info.name, 0L, 0),
          (a, b) => (if (b._1.nonEmpty) b._1 else a._1, a._2 + b._2, a._3 + b._3))
      }
    })
    val df = graft.SparkEntry.queries(name)(spark, dir)
    println("[resultsize] ===== initial plan =====")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(150)).mkString("\n"))
    if (!sys.env.contains("GRAFT_PLAN_ONLY")) {
      val n = df.count()
      println(s"[resultsize] $name rows=$n")
    }
    import scala.jdk.CollectionConverters._
    agg.asScala.toSeq.sortBy(-_._2._2).take(12).foreach { case (id, (nm, bytes, tasks)) =>
      println(f"[resultsize] stage $id%4d ${bytes / 1e6}%9.1f MB over $tasks%4d tasks  ${nm.take(110)}")
    }
    spark.stop()
  }
}
