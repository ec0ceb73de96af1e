package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.operators.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fire the skew guard ON PURPOSE — the round-4 verdict's top item: at
  * every measured scale the df cap (1000) never activated (max shingle df
  * ≪ cap), so `CappedCollectLong`'s constant-memory behavior under a
  * genuinely hot key rested on unit specs. Real web-crawl corpora have
  * boilerplate shingles with df in the millions; this probe PLANTS them
  * and measures.
  *
  * Corpus: `factor` disjoint blocks of the source docs (the ScaleProbe
  * token-suffix bijection — within-block dedup structure preserved,
  * cross-block shingles disjoint), then every `m`-th document gets the
  * SAME un-suffixed boilerplate sentence appended. The boilerplate's
  * interior trigrams are identical across all blocks, so their document
  * frequency is exactly the planted count (totalDocs / m) — a dial from
  * 10× to 1000× the cap. Trigrams straddling the document/boilerplate
  * boundary inherit the block suffix and stay small-df, like real
  * boilerplate stitched onto varied pages.
  *
  * Measured per (plantedDf, cap, query): wall seconds, output rows, max
  * over stages of per-stage summed task peak execution memory (the
  * aggregation/join buffers — the thing the cap bounds), and total
  * shuffle-write bytes. The no-cap CONTROL runs only at the smallest
  * planted df (10× cap): each uncapped hot shingle emits C(df, 2)
  * candidate pairs, which is exactly the quadratic blowup the guard
  * exists to prevent — at 1000× the control would emit ~10¹² pairs and
  * is reported as infeasible-by-arithmetic rather than run.
  *
  * Usage: runMain graft.tools.SkewProbe [srcDir] [factor] [genBase]
  */
object SkewProbe {

  val BlockStride = 10000000L
  /** 6 tokens → 4 interior trigrams, each with df = planted count. */
  val Boiler = "standard legal disclaimer applies everywhere always"

  def generate(spark: SparkSession, src: String, factor: Int, m: Int,
               out: String): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val blocks = (0 until factor).map { b =>
      if (b == 0) docs.select("doc_id", "text", "lang", "source")
      else docs.select(
        (col("doc_id") + lit(b * BlockStride)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1_b" + b).as("text"),
        col("lang"), col("source"))
    }
    val all = blocks.reduce(_ unionAll _)
    val planted =
      if (m <= 0) all
      else all.withColumn("text",
        when(pmod(col("doc_id"), lit(m)) === 0,
          concat(col("text"), lit(" " + Boiler))).otherwise(col("text")))
    planted.withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 200
    val genBase = if (args.length > 2) args(2) else "/tmp/graft_skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val peakMem = new AtomicLong(0)
    val shuffleW = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val tm = sc.stageInfo.taskMetrics
        if (tm != null) {
          peakMem.getAndUpdate(v => math.max(v, tm.peakExecutionMemory))
          shuffleW.addAndGet(tm.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }

    val queries: Seq[(String, (String, Int) => DataFrame)] = Seq(
      "q_jaccard_pairs" -> ((dir, cap) => Dedup.jaccardPairs(spark, dir, 0.5, cap)),
      "q_dedup_incremental" -> ((dir, cap) => Dedup.incrementalDedup(spark, dir, 0.5, cap)),
      "q_contamination" -> ((dir, cap) => Dedup.contamination(spark, dir, 0.5, cap)))

    // JVM/codegen warmup so the first measured cell isn't Janino time
    queries.foreach { case (_, fn) =>
      try fn("/root/testdata/sf0.001", Dedup.DefaultMaxShingleDf).count()
      catch { case e: Throwable => System.err.println(s"[skew] prewarm: ${e.getMessage}") }
      finally drop()
    }

    // (label, plant stride m; planted df = factor * srcDocs / m)
    val cases = Seq(("none", 0), ("10x", 100), ("100x", 10), ("1000x", 1))
    val capDefault = Dedup.DefaultMaxShingleDf
    case class R(dfLabel: String, cap: String, query: String, sec: Double,
                 rows: Long, peakMemMb: Double, shuffleMb: Double)
    val results = scala.collection.mutable.ArrayBuffer[R]()

    for ((label, m) <- cases) {
      val dir = s"${genBase}_$factor/$label"
      if (!new java.io.File(s"$dir/documents.parquet").isDirectory) {
        println(s"[skew] generating factor=$factor m=$m at $dir")
        generate(spark, src, factor, m, dir)
      }
      // df census straight off the shingle relation (no cap involved):
      // achieved max df, #shingles above the cap, index rows kept/dropped
      val dfs = Dedup.shingleRows(spark.read.parquet(s"$dir/documents.parquet")
          .select("doc_id", "text"))
        .groupBy("shingle").agg(count(lit(1)).as("df"))
        .agg(max(col("df")).as("max_df"),
          sum(when(col("df") > capDefault, 1L).otherwise(0L)).as("hot_shingles"),
          sum(when(col("df") > capDefault, col("df")).otherwise(0L)).as("dropped_rows"),
          sum(when(col("df") <= capDefault, col("df")).otherwise(0L)).as("kept_rows"))
        .collect()(0)
      println(s"[skew] $label: max_df=${dfs.getAs[Long]("max_df")} " +
        s"hot_shingles=${dfs.getAs[Long]("hot_shingles")} " +
        s"index_rows kept=${dfs.getAs[Long]("kept_rows")} dropped=${dfs.getAs[Long]("dropped_rows")}")
      drop()
      val caps: Seq[(String, Int)] =
        if (label == "10x") Seq(("1000", capDefault), ("uncapped", Int.MaxValue))
        else Seq(("1000", capDefault))
      for ((capLabel, cap) <- caps; (qname, fn) <- queries) {
        peakMem.set(0); shuffleW.set(0)
        val t0 = System.nanoTime()
        val rows = try fn(dir, cap).count() finally drop()
        val sec = (System.nanoTime() - t0) / 1e9
        // listener events drain async; settle before reading
        Thread.sleep(300)
        val r = R(label, capLabel, qname, sec, rows,
          peakMem.get / 1e6, shuffleW.get / 1e6)
        println(f"[skew] df=$label cap=$capLabel ${r.query}%-20s ${r.sec}%7.2f s " +
          f"rows=${r.rows}%-8d peakExecMem=${r.peakMemMb}%.0f MB shuffleW=${r.shuffleMb}%.0f MB")
        results += r
      }
    }

    println("\n| planted df | cap | query | sec | rows | peak exec mem (MB) | shuffle write (MB) |")
    println("|---|---|---|---|---|---|---|")
    results.foreach { r =>
      println(f"| ${r.dfLabel} | ${r.cap} | ${r.query} | ${r.sec}%.2f | ${r.rows} | " +
        f"${r.peakMemMb}%.0f | ${r.shuffleMb}%.0f |")
    }
    spark.stop()
  }
}
