package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** The nprobe–recall frontier across scale — the measurement behind
  * [[Similarity.nprobeFor]]. The r5/r6 probes fixed nprobe (2, then 8)
  * while `cellsFor` grew cells as √n, so the probed CELL fraction fell
  * with n and recall@5 fell with it (0.576 → 0.408 from 1× to 10× at
  * nprobe 8). This probe sweeps nprobe at every scale point and prints
  * recall@5 + scanned corpus fraction + warm time, so the auto rule can
  * be FIT to a recall floor instead of guessed.
  *
  * Usage: runMain graft.tools.IvfNprobeFrontier [srcDir] [dirs...]
  * (defaults: sf0.1 plus the ScaleProbe 10×/30×/100× dirs when present)
  */
object IvfNprobeFrontier {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gens = if (args.length > 1) args.drop(1).toSeq
      else Seq(10, 30, 100).map(f => s"/tmp/graft_scale${f}x")
        .filter(d => new java.io.File(s"$d/embeddings.parquet").isDirectory)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    Similarity.ivfSearch(spark, "/root/testdata/sf0.001", nCentroids = 8).count() // codegen prewarm
    drop()
    // one fraction column on purpose: nprobe/cells is the probed-CELL
    // fraction, a parameter; the scanned-ROW fraction equals it only in
    // expectation (balanced cells) and is not measured here
    println("\n| corpus | n | cells | nprobe | cell frac | warm s | recall@5 | rule |")
    println("|---|---|---|---|---|---|---|---|")
    for (dir <- src +: gens) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val cells = Similarity.cellsFor(n)
      val rule = Similarity.nprobeFor(cells)
      val exact = Similarity.topK(spark, dir, k = 5, nQueries = 50)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      drop()
      val sweep = (Seq(2, 4, 8, 16, 24, 32, 48, 64, 96) :+ rule)
        .distinct.sorted.filter(_ <= cells)
      for (nprobe <- sweep) {
        def once(): (Double, Set[(Long, Long)]) = {
          val t0 = System.nanoTime()
          val got = Similarity.ivfSearch(spark, dir, nCentroids = cells,
              nprobe = nprobe, k = 5, nQueries = 50,
              seed = Similarity.FarthestPointSeed())
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          val sec = (System.nanoTime() - t0) / 1e9
          drop()
          (sec, got)
        }
        val (_, got) = once()
        val (warm, _) = once()
        val recall = (exact & got).size.toDouble / exact.size
        val label = if (nprobe == rule) " ← nprobeFor" else ""
        println(f"| ${dir.split('/').last} | $n | $cells | $nprobe | " +
          f"${nprobe.toDouble / cells}%.3f | " +
          f"$warm%.2f | $recall%.3f |$label |")
      }
    }
    spark.stop()
  }
}
