package graft.tools

import graft.operators.{IvfIndex, LandingZone, ManifestLog, ShingleIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cost of the landing → index compaction step (r12 verdict task 3's
  * SCALING row): build the shingle index on the corpus' 80%, land the
  * remaining 20% as 8 lock-free segments, then time
  * [[LandingZone.absorbIntoShingleIndex]] — the maintenance-cycle cost a
  * deployment pays to compact its landing zone into the probe-ready
  * bucketed index — plus the no-op second pass (what an idle maintenance
  * tick costs), a post-absorb probe, and retire.
  *
  * Usage: LandingAbsorbProbe [srcDir] [factor] [workDir]
  *   (corpus reused when complete — row-count checked). */
object LandingAbsorbProbe {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val work = if (args.length > 2) args(2) else s"/tmp/graft_land_absorb_${factor}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[absorb] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val corpusDir = s"$work/corpus"
    val expected = spark.read.parquet(s"$src/documents.parquet").count() * factor
    val have = try {
      spark.read.parquet(s"$corpusDir/documents.parquet").count() == expected
    } catch { case _: Throwable => false }
    if (!have) ScaleProbe.generateDocs(spark, src, factor, corpusDir)
    val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select("doc_id", "text")
    println(s"[absorb] corpus: $expected docs ($src x$factor)")

    val tag = s"lz_probe_${factor}x"
    val idxDir = s"$work/index"
    val base = corpus.filter(col("doc_id") % 5 =!= 0)
    val incoming = corpus.filter(col("doc_id") % 5 === 0)
    timed(s"index build (80% = ${expected * 4 / 5} docs)") {
      ShingleIndex.build(base, idxDir, tag)
    }
    val logRoot = s"$work/log"
    new org.apache.hadoop.fs.Path(logRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(logRoot), true)
    timed("land 20% as 8 segments") {
      (0 until 8).foreach { w =>
        ManifestLog.append(incoming.filter((col("doc_id") / 5) % 8 === w),
          logRoot, s"w$w", 0L)
      }
    }
    val report = timed(s"ABSORB (20% = ${expected / 5} docs)") {
      LandingZone.absorbIntoShingleIndex(spark, logRoot, incoming.schema, tag, idxDir)
    }
    println(s"[absorb] report: $report")
    val idle = timed("absorb again (idle maintenance tick)") {
      LandingZone.absorbIntoShingleIndex(spark, logRoot, incoming.schema, tag, idxDir)
    }
    require(idle.freshDocs == 0, s"idle tick must no-op: $idle")
    timed("probe 1k batch post-absorb") {
      ShingleIndex.probe(spark, tag,
        corpus.filter(col("doc_id") % 5 === 0).limit(1000))
        .queryExecution.toRdd.count()
    }
    timed("retire consumed segments") {
      LandingZone.retireConsumed(spark, logRoot, graceMs = -1L)
    }

    // the VECTOR side of the same lifecycle (r13 verdict task 4): landed
    // embedding batches absorbed into the persistent IVF index — build
    // once on 80%, land 20% as 8 lock-free segments, absorb under the
    // lease, idle tick, post-absorb search batch, retire
    val vecDir = s"$work/vec_corpus"
    val vExpected = spark.read.parquet(s"$src/embeddings.parquet").count() * factor
    val vHave = try {
      spark.read.parquet(s"$vecDir/embeddings.parquet").count() == vExpected
    } catch { case _: Throwable => false }
    if (!vHave) ScaleProbe.generateEmbeddings(spark, src, factor, vecDir)
    val vecs = spark.read.parquet(s"$vecDir/embeddings.parquet")
      .select("vec_id", "embedding")
    println(s"[absorb] vector corpus: $vExpected vecs ($src x$factor)")
    val vTag = s"lzv_probe_${factor}x"
    val vIdxDir = s"$work/vec_index"
    val vBase = vecs.filter(col("vec_id") % 5 =!= 0)
    val vIncoming = vecs.filter(col("vec_id") % 5 === 0)
    timed(s"IVF build (80% = ${vExpected * 4 / 5} vecs, auto cells)") {
      IvfIndex.build(vBase, vIdxDir, vTag)
    }
    val vLogRoot = s"$work/vec_log"
    new org.apache.hadoop.fs.Path(vLogRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(vLogRoot), true)
    timed("land 20% as 8 segments") {
      (0 until 8).foreach { w =>
        ManifestLog.append(vIncoming.filter((col("vec_id") / 5) % 8 === w),
          vLogRoot, s"w$w", 0L)
      }
    }
    val vReport = timed(s"VECTOR ABSORB (20% = ${vExpected / 5} vecs)") {
      LandingZone.absorbIntoIvfIndex(spark, vLogRoot, vIncoming.schema, vTag)
    }
    println(s"[absorb] vector report: $vReport")
    val vIdle = timed("vector absorb again (idle maintenance tick)") {
      LandingZone.absorbIntoIvfIndex(spark, vLogRoot, vIncoming.schema, vTag)
    }
    require(vIdle.freshDocs == 0, s"idle tick must no-op: $vIdle")
    timed("search 100-query batch post-absorb") {
      IvfIndex.search(spark, vTag, vecs.filter(col("vec_id") < 100))
        .queryExecution.toRdd.count()
    }
    timed("retire consumed segments (vector)") {
      LandingZone.retireConsumed(spark, vLogRoot, graceMs = -1L)
    }
    spark.stop()
  }
}
