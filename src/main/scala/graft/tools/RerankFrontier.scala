package graft.tools

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The int8/re-rank frontier over the PERSISTENT index: at each scale
  * point, is the wide-int8-probe → float-re-rank composition a better
  * recall-per-second deal than the plain float search at the same (or
  * twice the) probe budget? Prints warm wall + recall@5 vs the exact
  * top-k for:
  *
  *  - `float @ rule` / `float @ 2·rule` — [[IvfIndex.search]]
  *  - `int8  @ rule` / `int8  @ 2·rule` — [[IvfIndex.searchInt8]]
  *    (same candidates, quarter scan bytes, quantized order)
  *  - `rerank @ 2·rule, widen 4` — [[IvfIndex.searchRerank]] (wide cheap
  *    probe, exact float order on the survivors)
  *
  * Usage: runMain graft.tools.RerankFrontier [srcDir] [dirs...]
  */
object RerankFrontier {
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
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-rrf-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    println("\n| corpus | n | cells | variant | nprobe | warm s | recall@5 |")
    println("|---|---|---|---|---|---|---|")
    for (dir <- src +: gens) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val cells = Similarity.cellsFor(n)
      val rule = Similarity.nprobeFor(cells)
      val exact = Similarity.topK(spark, dir, k = 5, nQueries = 50)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      drop()
      val ixDir = java.nio.file.Files.createTempDirectory("graft-rrf-ix").toString
      val tb0 = System.nanoTime()
      IvfIndex.build(emb, ixDir, "rrf")
      println(f"build (once, ${dir.split('/').last}): ${(System.nanoTime() - tb0) / 1e9}%.1f s")
      val queries = emb.filter(col("vec_id") < 50)
      def run(label: String, np: Int)(f: => org.apache.spark.sql.DataFrame): Unit = {
        def once(): (Double, Set[(Long, Long)]) = {
          val t0 = System.nanoTime()
          val got = f.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
          val sec = (System.nanoTime() - t0) / 1e9
          drop()
          (sec, got)
        }
        once() // warm the path
        val (warm, got) = once()
        val recall = (exact & got).size.toDouble / exact.size
        println(f"| ${dir.split('/').last} | $n | $cells | $label | $np | $warm%.2f | $recall%.3f |")
      }
      run("float", rule)(IvfIndex.search(spark, "rrf", queries, nprobe = rule))
      run("float", 2 * rule)(IvfIndex.search(spark, "rrf", queries, nprobe = 2 * rule))
      run("int8", rule)(IvfIndex.searchInt8(spark, "rrf", queries, nprobe = rule))
      run("int8", 2 * rule)(IvfIndex.searchInt8(spark, "rrf", queries, nprobe = 2 * rule))
      run("rerank w4", 2 * rule)(
        IvfIndex.searchRerank(spark, "rrf", queries, nprobe = 2 * rule, widen = 4))
      Seq(IvfIndex.modelTable("rrf"), IvfIndex.assignTable("rrf"))
        .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
    }
    spark.stop()
  }
}
