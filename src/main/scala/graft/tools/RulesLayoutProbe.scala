package graft.tools

import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The r13 verdict's task 6: at 20M docs the rules stage was declared
  * I/O-bound ("11 GB corpus vs page cache") and the fused kernels' CPU win
  * partially washed out (127.7 s vs 5M's 34.1 s). This probe ATTRIBUTES
  * that boundary and measures the obvious layout levers, because at 100 TB
  * the rules scan IS the deployment:
  *
  *  - the as-landed corpus is what the land stage's 4 lock-free writers
  *    leave behind: thousands of sub-MB snappy files, one row group each
  *    (the 20M corpus: 4,000 files, 2.7 GB) — per-file footer reads, task
  *    scheduling, and open/close amortize over ~700 KB of payload;
  *  - variants rewrite it compacted (64 / 32 even files) under snappy vs
  *    zstd, and one with 256 MB row groups.
  *
  * Each variant measures scan-only and full ruleGates, COLD (page cache
  * dropped via /proc/sys/vm/drop_caches when the container allows —
  * deployment-honest: 100 TB never rides a page cache) and WARM (cache
  * resident — the r13 composed-run regime). Codegen is pre-warmed on
  * sf0.1 so the first cold number measures the variant, not Janino.
  *
  * Usage: RulesLayoutProbe [srcCorpusDir] [workDir] */
object RulesLayoutProbe {

  private def dropCaches(): Boolean = try {
    new ProcessBuilder("sync").start().waitFor()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/proc/sys/vm/drop_caches"),
      "3\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    true
  } catch { case _: Throwable => false }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/tmp/graft_pipe_e2e_20m/corpus")
    val work = if (args.length > 1) args(1) else "/tmp/graft_rules_layout"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val canDrop = dropCaches()
    println(s"[layout] drop_caches available: $canDrop")

    def freeBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def mat(df: DataFrame): Unit = df.queryExecution.toRdd.count()

    // codegen/session warm-up on the tiny real table (distinct path, so
    // no page-cache interaction with the variants)
    val tiny = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "source", "text")
    mat(tiny)
    mat(Sampling.ruleGates(tiny))
    freeBlocks()

    // variants: (name, path). The source stays as-landed; rewrites are
    // reused when complete (row-count checked) so re-runs only pay once.
    val srcDocs = spark.read.parquet(s"$src/documents.parquet")
    val expect = srcDocs.count()
    def rewrite(name: String, parts: Int, codec: String,
                blockBytes: Option[Long]): (String, String) = {
      val out = s"$work/$name"
      val have = try {
        spark.read.parquet(s"$out/documents.parquet").count() == expect
      } catch { case _: Throwable => false }
      if (!have) {
        val w0 = srcDocs.repartition(parts).write
          .mode("overwrite").option("compression", codec)
        val w = blockBytes.fold(w0)(b => w0.option("parquet.block.size", b.toString))
        w.parquet(s"$out/documents.parquet")
      }
      (name, out)
    }
    val variants = Seq(
      ("as-landed", src),
      rewrite("snappy64", 64, "snappy", None),
      rewrite("zstd64", 64, "zstd", None),
      rewrite("zstd32_rg256", 32, "zstd", Some(256L * 1024 * 1024)))

    println(f"[layout] corpus: $expect docs; ${"variant"}%-14s ${"files"}%6s ${"bytes"}%11s  scan cold/warm   rules cold/warm")
    variants.foreach { case (name, dir) =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
      val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fsys.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      def docs = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source", "text")
      if (canDrop) dropCaches()
      val scanCold = timed(mat(docs))
      val scanWarm = timed(mat(docs))
      freeBlocks()
      if (canDrop) dropCaches()
      val rulesCold = timed(mat(Sampling.ruleGates(docs)))
      freeBlocks()
      val rulesWarm = timed(mat(Sampling.ruleGates(docs)))
      freeBlocks()
      println(f"[layout] $name%-14s ${files.length}%6d ${bytes}%11d  $scanCold%6.1f/$scanWarm%-6.1f  $rulesCold%6.1f/$rulesWarm%-6.1f")
    }
    spark.stop()
  }
}
