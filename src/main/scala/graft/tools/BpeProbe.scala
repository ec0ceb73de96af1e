package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the BPE merge-loop driver scaling (round-9 verdict item):
  * `seq`/`batched` time the real operators; `plansize` replicates the
  * round-over-cached-round loop shape and prints per-round plan sizes to
  * attribute the super-linear growth. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(24)
    val mode = if (args.length > 1) args(1) else "seq"
    val la = if (args.length > 2) args(2).toInt else 16
    val dir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "8") + "]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/documents.parquet")
    if (mode == "plansize") {
      var ws = df.select(explode(split(coalesce(col("text"), lit("")), " ", -1)).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("freq"))
        .select(col("w").as("ws"), col("freq"))
        .cache()
      var prev: org.apache.spark.sql.DataFrame = null
      for (r <- 1 to k) {
        val t0 = System.nanoTime()
        ws.limit(1).collect()
        val el = (System.nanoTime() - t0) / 1e9
        val an = ws.queryExecution.analyzed.toString.length
        val op = ws.queryExecution.optimizedPlan.toString.length
        val ex = ws.queryExecution.executedPlan.toString.length
        println(f"[plansize] round $r analyzed=$an optimized=$op executed=$ex collect=$el%.2f s")
        if (prev != null) prev.unpersist()
        prev = ws
        ws = ws.select(replace(col("ws"), lit("zq"), lit("qz")).as("ws"), col("freq")).cache()
      }
    } else if (mode == "local" || mode == "localsynth") {
      // OFF-ENGINE loop timing. `local`: the real corpus vocabulary
      // (exhausts early on sf corpora — measures the per-merge floor).
      // `localsynth`: a synthetic Zipf-ish vocabulary deep enough to
      // sustain k merges — `la` is reused as thousands-of-distinct-words.
      val vocab: Array[(String, Long)] =
        if (mode == "local") {
          val t0 = System.nanoTime()
          val v = df.select(explode(split(coalesce(col("text"), lit("")), " ", -1)).as("w"))
            .filter(length(col("w")) >= 2 && !col("w").contains(graft.operators.TextAnalysis.BpeSep))
            .groupBy("w").agg(count(lit(1)).as("freq"))
            .collect().map(r => (r.getString(0), r.getLong(1)))
          println(f"[bpeprobe] vocab scan+collect ${(System.nanoTime() - t0) / 1e9}%.1f s (${v.length} words)")
          v
        } else {
          val rnd = new scala.util.Random(42)
          val nWords = la * 1000
          val alpha = "abcdefghijklmnopqrstuvwxyz"
          (0 until nWords).map { i =>
            val len = 3 + rnd.nextInt(12)
            val w = (0 until len).map(_ => alpha(rnd.nextInt(26))).mkString
            (w, (1000000.0 / (i + 1)).toLong.max(1L)) // Zipf-ish frequencies
          }.distinct.toArray
        }
      val t1 = System.nanoTime()
      val merges = graft.operators.TextAnalysis.bpeTrainLocal(vocab, k)
      val wall = (System.nanoTime() - t1) / 1e9
      println(f"[bpeprobe] mode=$mode k=$k vocab=${vocab.length} merges=${merges.length} " +
        f"loopWall=$wall%.2f s mergesPerSec=${merges.length / math.max(wall, 1e-9)}%.0f")
    } else {
      val t0 = System.nanoTime()
      val (out, lens) =
        if (mode == "seq") (graft.operators.TextAnalysis.bpeMergesOn(df, k), Seq.empty[Int])
        else graft.operators.TextAnalysis.bpeMergesBatchedWithStats(df, k, la)
      val n = out.collect().length
      val wall = (System.nanoTime() - t0) / 1e9
      val batchStats = if (lens.nonEmpty)
        f" batches=${lens.length} meanPrefix=${lens.sum.toDouble / lens.length}%.2f" +
          s" lens=${lens.take(64).mkString("[", ",", if (lens.length > 64) ",…]" else "]")}"
      else ""
      println(f"[bpeprobe] mode=$mode k=$k la=$la merges=$n wall=$wall%.1f s " +
        f"roundsPerSec=${n / wall}%.2f$batchStats")
    }
    spark.stop()
  }
}
