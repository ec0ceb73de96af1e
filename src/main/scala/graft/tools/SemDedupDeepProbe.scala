package graft.tools

import graft.operators.{Dedup, Imi, ImiIndex, IvfIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Semantic dedup at the deep point (2M vectors), where the κ-rule's cell
  * count (n/256 = 7,813) makes FLAT k-means training the bottleneck —
  * n·cells distance evals per Lloyd round is quadratic in n under the
  * rule — versus the IMI assignment (two k1=⌈√cells⌉ half-quantizers:
  * 2·k1 half-distances per vector per round, ~45× less training
  * arithmetic) whose product cells carry the same verdict.
  *
  * Measures, on the 1000× vector corpus: flat IvfIndex.build at κ-rule
  * cells, ImiIndex.build at k1=⌈√cells⌉, and the bucket-local re-verdict
  * wall through each stored assignment at three thresholds.
  *
  * Usage: runMain graft.tools.SemDedupDeepProbe [genDir]
  */
object SemDedupDeepProbe {
  def main(args: Array[String]): Unit = {
    val gen = args.headOption.getOrElse("/tmp/graft_scale1000x_vec")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-sddp-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    val emb = spark.read.parquet(s"$gen/embeddings.parquet")
    val n = emb.count()
    val cells = Dedup.semanticCellsFor(n)
    val k1 = math.ceil(math.sqrt(cells.toDouble)).toInt
    println(s"[sdd-deep] n=$n κ-rule cells=$cells → IMI k1=$k1 (${k1 * k1} product cells)")
    val root = java.nio.file.Files.createTempDirectory("graft-sddp").toString

    val tf = System.nanoTime()
    IvfIndex.build(emb, root, "sddpf", buckets = 32, nCentroids = cells)
    println(f"[sdd-deep] FLAT IvfIndex.build at $cells cells: ${(System.nanoTime() - tf) / 1e9}%.1f s")
    drop()
    val ti = System.nanoTime()
    ImiIndex.build(emb, root, "sddpi", buckets = 32, k1 = k1)
    println(f"[sdd-deep] ImiIndex.build at k1=$k1: ${(System.nanoTime() - ti) / 1e9}%.1f s")
    drop()

    for ((label, verdict) <- Seq(
        ("flat", (t: Double) => Dedup.semanticDedupIndexed(spark, "sddpf", t)),
        ("imi", (t: Double) => Dedup.semanticDedupImi(spark, "sddpi", t)))) {
      val rows = Seq(0.9, 0.8, 0.7).map { t =>
        val t0 = System.nanoTime()
        val d = verdict(t).filter(col("is_dup")).count()
        val s = (System.nanoTime() - t0) / 1e9
        drop()
        f"τ=$t%.1f: $s%.2f s ($d dups)"
      }
      println(s"[sdd-deep] $label re-verdicts: " + rows.mkString(", "))
    }
    Seq(IvfIndex.modelTable("sddpf"), IvfIndex.assignTable("sddpf"),
      ImiIndex.modelTable("sddpi"), ImiIndex.assignTable("sddpi"))
      .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
    spark.stop()
  }
}
