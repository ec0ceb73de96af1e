package graft.tools

import org.apache.spark.sql.SparkSession

/** Anchor warm-up curve: runs the bench's fixed-work calibration query N
  * times back-to-back and prints each wall time. Motivation (r13): the
  * pre-flight anchor gate ran the anchor 4× before the cold pass, which
  * JIT-warmed it — calibPre then read 0.106 s against mid/post 0.27/0.42 s
  * and the triple self-labeled DISCARD at 293% spread on a quiet-enough
  * host. This probe measures how many runs the anchor needs to reach
  * steady state (C2 compilation of the codegen'd 600M-iteration loop
  * dominates the first runs), so the bench can warm PAST the curve's knee
  * before any anchor it compares. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val rows = args.lift(1).map(_.toLong).getOrElse(600000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to n).map { i =>
      val t0 = System.nanoTime()
      spark.range(rows).selectExpr("sum(id % 1000007)").collect()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[calib] run $i%2d: $t%.3f s")
      t
    }
    val tail = times.drop(n / 2)
    println(f"[calib] steady-state (last ${tail.size}): " +
      f"min ${tail.min}%.3f / max ${tail.max}%.3f / " +
      f"spread ${(tail.max - tail.min) / tail.min * 100}%.1f%%")
    // min-of-3 stability: the robust per-point estimator the bench uses
    val min3 = tail.sliding(3).map(_.min).toSeq
    if (min3.size >= 2)
      println(f"[calib] min-of-3 over steady tail: min ${min3.min}%.3f / " +
        f"max ${min3.max}%.3f / spread ${(min3.max - min3.min) / min3.min * 100}%.1f%%")
    spark.stop()
  }

}

/** Validates the bench's v2 calibration end-to-end: adaptive warm-up,
  * then `points` consecutive min-of-3 calibration points — the max
  * pairwise spread across points is what the gate (8%) and the triple
  * verdict (15%) would see on this host right now. */
object CalibProbeV2 {
  def main(args: Array[String]): Unit = {
    val points = args.headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val w = graft.Bench.calibrateWarmup(spark)
    println(s"[calibv2] warmup runs: $w")
    val ps = (1 to points).map { i =>
      val p = (1 to 3).map(_ => graft.Bench.anchorOnce(spark)).min
      println(f"[calibv2] point $i: $p%.3f s")
      p
    }
    println(f"[calibv2] spread across $points points: " +
      f"${(ps.max - ps.min) / ps.min * 100}%.1f%% (min ${ps.min}%.3f max ${ps.max}%.3f)")
    spark.stop()
  }
}
