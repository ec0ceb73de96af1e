package graft.tools

import graft.operators.{Imi, Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM A/B for the r15 batched subspace-Lloyd training (verdict
  * item 4): times the r14 shape (m concurrent per-subspace chains —
  * m·(1+iters) jobs) against the r15 batched chain (1+iters jobs) on the
  * SAME materialized source frame, alternating, min-of-n — host drift
  * hits both arms equally. Also reports the max |Δ| between the two
  * arms' codebooks (expected ~0: same arithmetic per subspace, only the
  * partial-merge order differs).
  *
  * Usage: runMain graft.tools.PqTrainAB [sfDir] [reps] */
object PqTrainAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val src = org.apache.spark.sql.graft.CheckpointShim
      .statsHonestLocalCheckpoint(Imi.rotated(base, Imi.RotSeed))
    val m = 4; val k = 8; val iters = Similarity.LloydIters
    val dsub = Similarity.Dim / m

    def oldTrain(): Array[Array[Array[Double]]] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      val futs = (0 until m).map { mi =>
        Future {
          val sl = src.select(col("vec_id"),
            slice(col("embedding"), mi * dsub + 1, dsub).as("embedding"))
          Similarity.trainedCentroidArrays(sl, k, iters, Similarity.ResidueSeed, dsub)
        }
      }
      futs.map(Await.result(_, Duration.Inf)).toArray
    }
    def newTrain(): Array[Array[Array[Double]]] =
      Pq.train(base, Pq.PqSpec(m = m, k = k), iters) // checkpoints + frees internally

    def timed(f: () => Array[Array[Array[Double]]]): (Double, Array[Array[Array[Double]]]) = {
      val t0 = System.nanoTime(); val r = f(); ((System.nanoTime() - t0) / 1e9, r)
    }
    // warm both arms once
    val w1 = timed(() => oldTrain()); val w2 = timed(() => newTrain())
    var dMax = 0.0
    for (mi <- 0 until m; c <- 0 until k; i <- 0 until dsub)
      dMax = math.max(dMax, math.abs(w1._2(mi)(c)(i) - w2._2(mi)(c)(i)))
    println(f"[pqab] warm old=${w1._1}%.2f new=${w2._1}%.2f maxAbsDiff=$dMax%.3e")
    val olds = scala.collection.mutable.ArrayBuffer.empty[Double]
    val news = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (r <- 1 to reps) {
      val o = timed(() => oldTrain())._1
      val n = timed(() => newTrain())._1
      olds += o; news += n
      println(f"[pqab] rep $r: old=$o%.2f s  new=$n%.2f s")
    }
    println(f"[pqab] MIN old=${olds.min}%.2f s  new=${news.min}%.2f s  " +
      f"(median old=${olds.sorted.apply(reps / 2)}%.2f new=${news.sorted.apply(reps / 2)}%.2f)")
    spark.stop()
  }
}
