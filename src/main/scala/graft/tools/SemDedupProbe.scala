package graft.tools

import graft.operators.{Dedup, IvfIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure [[Dedup.semanticDedup]] across corpus scale:
  *
  *  1. the auto cell rule (fixed cell SIZE κ=256, linear n·κ pair work)
  *     vs search's √n rule (cell size √n → n^1.5 pair work) — same
  *     verdicts where both converge, diverging wall as n grows past the
  *     κ=√n crossover (n = 65,536);
  *  2. the persistent-index path's RE-VERDICT cost: build once, then
  *     re-threshold without re-clustering — the deployment pattern for
  *     tuning τ on a 100 TB corpus (clustering is the expensive, stable
  *     part; the verdict is one bucket-local scan).
  *
  * Corpus: [[ScaleProbe.generate]] sign-mask blocks (reused when the gen
  * dirs exist). Wall times are cold (includes training) then warm.
  *
  * Usage: runMain graft.tools.SemDedupProbe [srcDir] [factors...]
  */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(10, 30, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-sdd-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = src +: factors.map { f =>
      val gen = s"/tmp/graft_scale${f}x"
      if (!new java.io.File(s"$gen/embeddings.parquet").isDirectory) {
        println(s"[semdedup] generating ${f}x corpus at $gen")
        ScaleProbe.generate(spark, src, f, gen)
      }
      gen
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    // codegen prewarm off the tiny SF
    Dedup.semanticDedup(spark, "/root/testdata/sf0.001", nCentroids = 8,
      threshold = 0.45).count()
    drop()
    val tau = 0.8 // sign-mask blocks plant exact/near copies at cos ≈ 1
    println("\n| corpus | n | rule | cells | cell size | cold s | warm s | dups |")
    println("|---|---|---|---|---|---|---|---|")
    for (dir <- dirs) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      for ((label, cells) <- Seq(
          ("κ=256", Dedup.semanticCellsFor(n)),
          ("√n", Similarity.cellsFor(n)))) {
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val dups = Dedup.semanticDedup(spark, dir, nCentroids = cells, threshold = tau)
            .filter(col("is_dup")).count()
          ((System.nanoTime() - t0) / 1e9, dups)
        }
        val (cold, _) = once(); drop()
        val (warm, dups) = once(); drop()
        println(f"| ${dir.replaceAll(".*/", "")} | $n | $label | $cells | ${n / cells}%d " +
          f"| $cold%.2f | $warm%.2f | $dups |")
      }
      // persistent path: cluster once, re-verdict at moving thresholds
      val tag = "sddprobe"
      val idxDir = java.nio.file.Files.createTempDirectory("graft-sddprobe").toString
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val tb = System.nanoTime()
      IvfIndex.build(emb, idxDir, tag, nCentroids = Dedup.semanticCellsFor(n))
      val buildS = (System.nanoTime() - tb) / 1e9
      val reverdicts = Seq(0.9, 0.8, 0.7).map { t =>
        val t0 = System.nanoTime()
        val d = Dedup.semanticDedupIndexed(spark, tag, threshold = t)
          .filter(col("is_dup")).count()
        val s = (System.nanoTime() - t0) / 1e9
        drop()
        f"τ=$t%.1f: $s%.2f s ($d dups)"
      }
      println(s"|   indexed | $n | build ${f"$buildS%.2f"} s; re-verdict " +
        reverdicts.mkString(", ") + " |")
      Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag))
        .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      drop()
    }
    spark.stop()
  }
}
