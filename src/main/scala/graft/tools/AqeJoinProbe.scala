package graft.tools

import graft.operators.Analytics
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Does Spark's own AQE skew-join split fire — and pay off — on a
  * planted-skew join at bench scale, with DEFAULT thresholds (256 MB /
  * 5× median)? The mechanism a real cluster leans on first, before the
  * manual salted join; AqeSkewSpec pins the plan marker at test scale
  * with dialed-down thresholds, this probe measures the real thing and
  * the salted-vs-AQE crossover.
  *
  * Corpus: `n` fact rows with `hotFrac` of them on ONE key, the rest
  * uniform over 1M keys; payload = 96 high-entropy bytes (three md5
  * hexes — skew stats read COMPRESSED shuffle sizes, so a repeated-char
  * filler would vanish). The aggregate consumes the payload so column
  * pruning cannot strip it from the shuffle.
  *
  * Reported per variant: wall s, join-stage max task s, median task s —
  * the max/median ratio IS the straggler the optimization exists to
  * remove.
  *
  * Usage: runMain graft.tools.AqeJoinProbe [nRows] [hotFrac]
  */
object AqeJoinProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val hotFrac = if (args.length > 1) args(1).toDouble else 0.25
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage task durations → the straggler metric
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.List[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        stageTasks.computeIfAbsent(te.stageId,
          _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]()))
          .add(te.taskInfo.duration)
      }
    })

    val nHot = (n * hotFrac).toLong
    val payload = concat(md5(col("id").cast("string")),
      md5((col("id") + 1).cast("string")), md5((col("id") + 2).cast("string")))
    val fact = spark.range(0, nHot).select(lit(1L).as("k"), payload.as("payload"))
      .unionAll(spark.range(0, n - nHot)
        .select((col("id") % 1000000 + 2).as("k"), payload.as("payload")))
    val dim = spark.range(0, 1000001).select(col("id").as("dk"),
      (col("id") % 7).cast("string").as("seg"))

    def agg(j: DataFrame): DataFrame =
      j.groupBy("seg").agg(count(lit(1)).as("n_rows"),
        sum(length(col("payload"))).as("bytes"))

    def plain() = agg(fact.join(dim.hint("merge"), col("k") === col("dk")))
    def salted() = agg(Analytics.saltedJoin(fact, dim.hint("merge"), "k", "dk"))

    case class R(variant: String, wall: Double, maxTask: Double,
                 medTask: Double, skewInPlan: Boolean)
    val results = scala.collection.mutable.ArrayBuffer[R]()

    def run(variant: String, skewOn: Boolean, df: () => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      stageTasks.clear()
      val t0 = System.nanoTime()
      val q = df()
      q.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      import scala.jdk.CollectionConverters._
      val worst = stageTasks.asScala.values.map { l =>
        val ds = l.asScala.map(_.toDouble).toSeq.sorted
        (ds.last, ds(ds.size / 2), ds.size)
      }.maxBy(_._1)
      val skewed = q.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"[aqe] $variant%-14s wall $wall%7.1f s  maxTask ${worst._1 / 1000}%6.1f s  " +
        f"medTask ${worst._2 / 1000}%6.2f s  tasks ${worst._3}  skewInPlan=$skewed")
      results += R(variant, wall, worst._1 / 1000, worst._2 / 1000, skewed)
      spark.sqlContext.clearCache()
      System.gc()
    }

    // warm codegen once at tiny scale
    agg(spark.range(10).select(col("id").as("k"), lit("x").as("payload"))
      .join(dim.hint("merge").limit(100), col("k") === col("dk"))).collect()

    run("aqe-skew-off", skewOn = false, plain)
    run("aqe-skew-on", skewOn = true, plain)
    run("salted-8", skewOn = false, salted)
    run("salted+aqe", skewOn = true, salted)

    println(f"\nn=$n hotFrac=$hotFrac (hot partition ≈ ${nHot * 104 / 1e6}%.0f MB raw)")
    println("| variant | wall s | join-stage max task s | median task s | skew=true in plan |")
    println("|---|---|---|---|---|")
    results.foreach(r => println(
      f"| ${r.variant} | ${r.wall}%.1f | ${r.maxTask}%.1f | ${r.medTask}%.2f | ${r.skewInPlan} |"))
    spark.stop()
  }
}
