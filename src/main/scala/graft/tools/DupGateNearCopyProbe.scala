package graft.tools

import graft.operators.{IvfIndex, Similarity}
import graft.streaming.VectorIngestGate
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The advisor's round-7 objection, measured: the dup-gate regime's fixed
  * `nprobe = 8` default was justified by an A/B whose arrivals were only
  * EXACT copies (cos 1.0) and near-orthogonal scrambles — no perturbed
  * near-copy in cos [0.99, 1) was ever measured, and a perturbed copy is
  * exactly the arrival that could cross a cell boundary on a fine
  * partition (1,414 cells at 2M vectors) and escape a small probe.
  *
  * This probe builds the stored index on the deep corpus and gates
  * batches of DERIVED near-copies at controlled cosines (w = v + ε·u,
  * ε ∈ {0.032, 0.09, 0.127} → cos ≈ 0.9995 / 0.996 / 0.992 — the band
  * the advisor named), comparing the fixed dup budget against the
  * recall-floor rule: dup recall (fraction flagged, all arrivals are
  * true dups by construction), verdict agreement, and batch wall.
  *
  * Usage: runMain graft.tools.DupGateNearCopyProbe [genDir] [batch]
  * (genDir must hold a generated embeddings corpus, e.g. the 999×
  * corpus from DeepScaleProbe.)
  */
object DupGateNearCopyProbe {

  private def sign(q: Long, i: Int): Double = {
    var z = q * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if (z > 0) 1.0 else -1.0
  }

  def main(args: Array[String]): Unit = {
    val gen = args.headOption.getOrElse("/tmp/graft_scale999x_vec")
    val batchN = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache(); System.gc()
    }
    val emb = spark.read.parquet(s"$gen/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val cells = Similarity.cellsFor(n)
    val rule = Similarity.nprobeFor(cells)
    println(s"[nearcopy] n=$n cells=$cells rule=$rule fixed=${VectorIngestGate.DupGateNprobe}")
    val tag = "nearcopy"
    val idxDir = java.nio.file.Files.createTempDirectory("graft-nearcopy").toString
    val tb = System.nanoTime()
    IvfIndex.build(emb, idxDir, tag, buckets = 32)
    println(f"[nearcopy] index built in ${(System.nanoTime() - tb) / 1e9}%.1f s")
    drop()
    // derived arrivals: every ~(n/batchN)-th corpus vector, perturbed
    val stride = math.max(1L, n / batchN)
    val eps = Seq(0.032, 0.09, 0.127)
    println("\n| eps | target cos | measured cos (min/med) | nprobe | dup recall | agree w/ rule | warm s |")
    println("|---|---|---|---|---|---|---|")
    for (e <- eps) {
      val src = emb.filter(col("vec_id") % stride === 0)
        .as[(Long, Array[Float])].collect()
      val arrivals = src.map { case (id, v) =>
        val nv = Similarity.normP(v)
        val s = e * nv / math.sqrt(v.length)
        val w = Array.tabulate(v.length)(i => (v(i) + s * sign(id, i)).toFloat)
        (id + 5000000000L, w, Similarity.dotP(v, w) / (nv * Similarity.normP(w)))
      }
      val cosSorted = arrivals.map(_._3).sorted
      val (cosMin, cosMed) = (cosSorted.head, cosSorted(cosSorted.length / 2))
      val batch = arrivals.map(a => (a._1, a._2)).toSeq.toDF("vec_id", "embedding")
      var ruleVerdicts: Map[Long, Boolean] = null
      for (np <- Seq(rule, VectorIngestGate.DupGateNprobe)) {
        def once(): (Double, Map[Long, Boolean]) = {
          val t0 = System.nanoTime()
          val (receipts, _) = VectorIngestGate.gateBatch(tag, batch,
            threshold = VectorIngestGate.DupGateThreshold, nprobe = np)
          val verdicts = receipts.collect()
            .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
          ((System.nanoTime() - t0) / 1e9, verdicts)
        }
        once(); drop()
        val (warm, verdicts) = once(); drop()
        if (np == rule) ruleVerdicts = verdicts
        val recall = verdicts.values.count(identity).toDouble / verdicts.size
        val agree =
          if (np == rule) 1.0
          else verdicts.count { case (k, v) => ruleVerdicts(k) == v }.toDouble / verdicts.size
        val label = if (np == rule) s"$np (rule)" else s"$np (fixed)"
        println(f"| $e | ${1.0 / math.sqrt(1 + e * e)}%.4f | $cosMin%.4f/$cosMed%.4f | " +
          f"$label | $recall%.4f | $agree%.4f | $warm%.2f |")
      }
    }
    Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag))
      .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
    spark.stop()
  }
}
