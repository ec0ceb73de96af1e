package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Validate [[Similarity.cellsFor]] the way bandingFor was validated —
  * train + search at 1× and `factor`× and publish the recall/time curve
  * against the old fixed-8 default (the round-4 verdict's #2 item: at a
  * fixed cell count the index stops being an index — probing 2 of 8
  * cells scans a quarter of the corpus regardless of n).
  *
  * Corpus: [[ScaleProbe.generate]]'s sign-mask embedding blocks (within-
  * block geometry exact, cross-block cosines ≈ 0) — reused from the
  * ScaleProbe dirs when present. Recall is measured against the exact
  * [[Similarity.topK]] on the same corpus (queries = vec_id < 50, block-0
  * originals). Each config reports wall time (cold, then warm — the
  * timing includes Lloyd training, which is the honest deployment cost)
  * and recall@5.
  *
  * Usage: runMain graft.tools.IvfScaleProbe [srcDir] [factor] [genDir]
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val gen = if (args.length > 2) args(2) else s"/tmp/graft_scale${factor}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$gen/embeddings.parquet").isDirectory) {
      println(s"[ivf-scale] generating ${factor}x corpus at $gen")
      ScaleProbe.generate(spark, src, factor, gen)
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    // codegen prewarm off the tiny SF
    Similarity.ivfSearch(spark, "/root/testdata/sf0.001", nCentroids = 8).count()
    drop()
    // nprobe/cells is the probed-CELL fraction (a parameter): the scanned-ROW
    // fraction equals it only in expectation under balanced cells
    println("\n| corpus | n | cells | nprobe | cell frac | cold s | warm s | recall@5 |")
    println("|---|---|---|---|---|---|---|---|")
    for (dir <- Seq(src, gen)) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val auto = Similarity.cellsFor(n)
      val exact = Similarity.topK(spark, dir, k = 5, nQueries = 50)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      drop()
      for ((cells, nprobe) <- Seq((8, 2), (auto, 2), (auto, 8))) {
        def once(): (Double, Set[(Long, Long)]) = {
          val t0 = System.nanoTime()
          val got = Similarity.ivfSearch(spark, dir, nCentroids = cells,
              nprobe = nprobe, k = 5, nQueries = 50)
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          val sec = (System.nanoTime() - t0) / 1e9
          drop()
          (sec, got)
        }
        val (cold, got) = once()
        val (warm, _) = once()
        val recall = (exact & got).size.toDouble / exact.size
        println(f"| ${if (dir == src) "1x" else s"${factor}x"} | $n | $cells | $nprobe | " +
          f"${nprobe.toDouble / cells}%.3f | $cold%.2f | $warm%.2f | $recall%.3f |")
      }
    }
    // Flat IVF vs the two-level IMI at matched candidate-volume targets
    // (k1For: k1² tracks cellsFor's √n): same scanned-fraction story from
    // a model of 2·k1 half-rows instead of √n full rows.
    println("\n| corpus | n | index | cells | model rows | nprobe | warm s | recall@5 |")
    println("|---|---|---|---|---|---|---|---|")
    for (dir <- Seq(src, gen)) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val auto = Similarity.cellsFor(n)
      val k1 = graft.operators.Imi.k1For(n)
      val exact = Similarity.topK(spark, dir, k = 5, nQueries = 50)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      drop()
      def rec(got: Set[(Long, Long)]): Double = (exact & got).size.toDouble / exact.size
      def run(label: String, cells: Int, modelRows: Int, nprobe: Int)(f: => Set[(Long, Long)]): Unit = {
        val (g0, _) = { val t0 = System.nanoTime(); val g = f; (g, (System.nanoTime() - t0) / 1e9) }
        drop()
        val t0 = System.nanoTime(); val g = f; val warm = (System.nanoTime() - t0) / 1e9
        drop()
        require(g == g0) // deterministic across runs
        println(f"| ${if (dir == src) "1x" else s"${factor}x"} | $n | $label | $cells | $modelRows | $nprobe | $warm%.2f | ${rec(g)}%.3f |")
      }
      // matched probe budgets: flat probes 8 of √n cells; IMI probes the
      // number of product cells covering the same expected corpus fraction
      val imiProbe = math.max(1, math.round(8.0 * k1 * k1 / auto).toInt)
      run("flat", auto, auto, 8)(
        Similarity.ivfSearch(spark, dir, nCentroids = auto, nprobe = 8, k = 5, nQueries = 50)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
      run("imi", k1 * k1, 2 * k1, imiProbe)(
        graft.operators.Imi.search(spark, dir, k1 = k1, nprobe = imiProbe, k = 5, nQueries = 50)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet)
    }
    // Rounds × seeding frontier (r5 verdict #7): at the auto cell count,
    // does more Lloyd work or a better seed lift recall, and at what cost?
    // nprobe fixed at 8 (the r5 frontier config — nprobe is the caller's
    // recall dial; rounds/seed shift the frontier itself).
    println("\n| corpus | n | cells | seed | rounds | warm s | recall@5 |")
    println("|---|---|---|---|---|---|---|")
    for (dir <- Seq(src, gen)) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val auto = Similarity.cellsFor(n)
      val exact = Similarity.topK(spark, dir, k = 5, nQueries = 50)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      drop()
      for (seed <- Seq(Similarity.ResidueSeed, Similarity.FarthestPointSeed());
           rounds <- Seq(2, 5, 10)) {
        def once(): (Double, Set[(Long, Long)]) = {
          val t0 = System.nanoTime()
          val got = Similarity.ivfSearch(spark, dir, nCentroids = auto,
              nprobe = 8, k = 5, nQueries = 50, iters = rounds, seed = seed)
            .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          val sec = (System.nanoTime() - t0) / 1e9
          drop()
          (sec, got)
        }
        val (_, got) = once()
        val (warm, _) = once()
        val recall = (exact & got).size.toDouble / exact.size
        val seedName = if (seed == Similarity.ResidueSeed) "residue" else "farthest"
        println(f"| ${if (dir == src) "1x" else s"${factor}x"} | $n | $auto | $seedName | " +
          f"$rounds | $warm%.2f | $recall%.3f |")
      }
    }
    spark.stop()
  }
}
