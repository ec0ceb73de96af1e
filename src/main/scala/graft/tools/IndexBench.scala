package graft.tools

import graft.operators.{Dedup, ShingleIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure what [[ShingleIndex]] buys: per-batch dedup cost with a
  * persistent index (probe) vs today's recompute-the-corpus shape
  * ([[Dedup.incrementalDedupOn]]) as the corpus grows 1× → 30× → 100×.
  *
  * The BATCH is held fixed across scales: block-0 originals with
  * doc_id % 13 == 0 (the ScaleProbe corpora keep block 0 verbatim, so the
  * same ~385 documents exist at every scale). The corpus is everything
  * else. The claim under test: recompute cost grows with the corpus
  * (it re-shingles and re-aggregates all of it every batch), probe cost
  * does not (the index is scanned, never shuffled or re-aggregated), and
  * the one-time build amortizes over every subsequent batch.
  *
  * Usage: runMain graft.tools.IndexBench [srcDir] [scaledDir ...]
  */
object IndexBench {

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_scale30x", "/tmp/graft_scale100x")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-ixbench-wh").toString)
      .config("spark.cleaner.referenceTracking.blocking.shuffle", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // codegen prewarm off the tiny SF
    {
      val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      Dedup.incrementalDedupOn(d.filter(col("doc_id") % 13 =!= 0),
        d.filter(col("doc_id") % 13 === 0)).count()
      drop()
    }

    case class R(label: String, corpusRows: Long, buildS: Double,
                 recomputeS: Double, probeS: Seq[Double], rows: Long,
                 censusCleanS: Double, censusSatS: Double, satKeys: Long,
                 compactS: Double, filesBefore: Long,
                 filesAfter: Long, probeAfterCompactS: Double)
    val results = dirs.zipWithIndex.map { case (dir, i) =>
      val tag = s"ixb$i"
      val idxDir = java.nio.file.Files.createTempDirectory(s"graft-ixbench$i").toString
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val isBatch = col("doc_id") < 10000000L && col("doc_id") % 13 === 0
      val batch = d.filter(isBatch)
      val corpus = d.filter(!isBatch)
      val corpusRows = corpus.count()
      val (recomputeS, nRe) = time(Dedup.incrementalDedupOn(corpus, batch).count())
      drop()
      val (buildS, _) = time(ShingleIndex.build(corpus, idxDir, tag, buckets = 32))
      drop()
      val probes = (1 to 3).map { _ =>
        val (s, nP) = time(ShingleIndex.probe(spark, tag, batch).count())
        assert(nP == nRe, s"probe rows $nP != recompute rows $nRe")
        drop()
        s
      }
      // maintenance lifecycle costs (round 6): the census is the cheap gate
      // in front of the O(corpus) rebuild — measure both sides of that
      // claim, plus compaction after 3 appends (distinct-id slices of the
      // batch docs so each append does real work)
      val (censusCleanS, _) = time(ShingleIndex.overshootCensus(spark, tag))
      drop()
      (1 to 3).foreach { k =>
        ShingleIndex.append(spark, tag, idxDir,
          batch.select((col("doc_id") + lit(k * 1000000000L)).as("doc_id"), col("text")),
          buckets = 32)
        drop()
      }
      // populate the saturation table so the timed census joins a REAL sat
      // side, not the post-build empty one (an empty sat lets AQE collapse
      // the join — that would time the best case, not the claim): a
      // cap-2 append rejects nearly every repeated key
      ShingleIndex.append(spark, tag, idxDir,
        batch.select((col("doc_id") + lit(4000000000L)).as("doc_id"), col("text")),
        buckets = 32, maxShingleDf = 2)
      drop()
      val (censusS, census) = time(ShingleIndex.overshootCensus(spark, tag))
      drop()
      val filesBefore = ShingleIndex.fileCount(spark, tag)
      val (compactS, _) = time(ShingleIndex.compact(spark, tag, idxDir))
      val filesAfter = ShingleIndex.fileCount(spark, tag)
      drop()
      val (probeAfterS, _) = time(ShingleIndex.probe(spark, tag, batch).count())
      drop()
      val label = if (dir.endsWith("sf0.1")) "1x"
        else dir.replaceAll(".*scale", "").replaceAll("/.*", "")
      println(f"[ixbench] $label corpus=$corpusRows build=$buildS%.2f " +
        f"recompute=$recomputeS%.2f probe=${probes.map(p => f"$p%.2f").mkString("/")} rows=$nRe " +
        f"census=$censusCleanS%.2f/$censusS%.2f(${census.saturatedKeys} sat keys, ${census.overshootRows} over) files=$filesBefore->$filesAfter " +
        f"compact=$compactS%.2f probeAfter=$probeAfterS%.2f")
      R(label, corpusRows, buildS, recomputeS, probes, nRe,
        censusCleanS, censusS, census.saturatedKeys, compactS, filesBefore, filesAfter, probeAfterS)
    }

    println("\n| corpus | docs | build once (s) | recompute per batch (s) | probe per batch (s, 3 runs) | probe speedup |")
    println("|---|---|---|---|---|---|")
    results.foreach { r =>
      val best = r.probeS.min
      println(f"| ${r.label} | ${r.corpusRows} | ${r.buildS}%.2f | ${r.recomputeS}%.2f | " +
        f"${r.probeS.map(p => f"$p%.2f").mkString(" / ")} | ${r.recomputeS / best}%.1f× |")
    }
    println("\n| corpus | census clean (s) | census saturated (s, sat keys) | census/rebuild cost ratio | files after 4 appends | compact (s) | files after compact | probe after compact (s) |")
    println("|---|---|---|---|---|---|---|---|")
    results.foreach { r =>
      println(f"| ${r.label} | ${r.censusCleanS}%.2f | ${r.censusSatS}%.2f (${r.satKeys}) | ${r.censusSatS / r.buildS}%.2f | " +
        f"${r.filesBefore} | ${r.compactS}%.2f | ${r.filesAfter} | ${r.probeAfterCompactS}%.2f |")
    }
    spark.stop()
  }
}
