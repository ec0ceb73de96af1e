package graft.tools

import graft.operators.{Imi, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measure the IMI's WORST case — the round-7 caveat made concrete: the
  * zero-recall-tax result held on a corpus whose halves are weakly
  * correlated (product quantization's best case). This probe builds an
  * adversarial corpus with PERFECTLY correlated halves (right := left),
  * measures the product-cell collapse and its recall tax, then measures
  * the seeded Hadamard-sign rotation ([[Imi.rotateP]] — the public OPQ
  * idea) repairing it.
  *
  * Adversarial scaling preserves the adversity: block replication uses
  * the SAME sign mask on both halves (s(b, i mod 32)), so every block's
  * halves stay exact copies while cross-block cosines stay near zero.
  *
  * Reported per (corpus, variant): populated product cells, max-cell
  * fraction, recall@5 vs exact truth, candidate rows per query, warm
  * seconds.
  *
  * Usage: runMain graft.tools.ImiAdversarialProbe [srcDir] [factor]
  */
object ImiAdversarialProbe {

  val BlockStride = 10000000L

  private def sign(b: Int, i: Int): Float = {
    var z = b.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if (z > 0) 1.0f else -1.0f
  }

  /** Adversarial corpus: per source vector, v' = vL ++ vL; block b
    * multiplies dim i by sign(b, i % HalfDim) — the same mask on both
    * halves, so the copy structure survives replication. */
  def generate(spark: SparkSession, src: String, factor: Int, out: String,
               chunk: Int = 50): Unit = {
    val half = Imi.HalfDim
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
      .select(col("vec_id"),
        concat(slice(col("embedding"), 1, half),
          slice(col("embedding"), 1, half)).as("embedding"))
    (0 until factor).grouped(chunk).zipWithIndex.foreach { case (bs, ci) =>
      val blocks = bs.map { b =>
        if (b == 0) emb
        else emb.select(
          (col("vec_id") + lit(b * BlockStride)).as("vec_id"),
          array((1 to Similarity.Dim).map(i =>
            element_at(col("embedding"), i) * lit(sign(b, (i - 1) % half))): _*)
            .as("embedding"))
      }
      blocks.reduce(_ unionAll _).write
        .mode(if (ci == 0) "overwrite" else "append")
        .parquet(s"$out/embeddings.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val gen = s"/tmp/graft_imiadv${factor}x"
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
      spark.sqlContext.clearCache(); System.gc()
    }
    val baseN = spark.read.parquet(s"$src/embeddings.parquet").count()
    val complete = new java.io.File(s"$gen/embeddings.parquet").isDirectory &&
      spark.read.parquet(s"$gen/embeddings.parquet").count() == baseN * factor
    if (!complete) {
      println(s"[imiadv] generating ${factor}x adversarial corpus at $gen")
      generate(spark, src, factor, gen)
    }
    val emb = spark.read.parquet(s"$gen/embeddings.parquet")
    val n = emb.count()
    val k1 = Imi.k1For(n)
    val cells = k1 * k1
    // nprobe matched to the flat rule's budget at the same n
    val nprobe = Similarity.nprobeFor(math.min(Similarity.cellsFor(n), cells))
    println(s"[imiadv] n=$n k1=$k1 ($cells product cells) nprobe=$nprobe")
    val exact = Similarity.topK(spark, gen, k = 5, nQueries = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    drop()
    println("\n| corpus | variant | populated cells | max cell frac | recall@5 | warm s |")
    println("|---|---|---|---|---|---|")
    for (rot <- Seq(false, true)) {
      val label = if (rot) "rotated" else "unrotated"
      val assigned =
        if (rot) Imi.assignRot(spark, gen, k1) else Imi.assign(spark, gen, k1)
      val occ = assigned.groupBy("cell_id").agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("pop"), max(col("c")).as("mx")).collect()(0)
      val (pop, mxFrac) = (occ.getLong(0), occ.getLong(1).toDouble / n)
      drop()
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val res =
          if (rot) Imi.searchRot(spark, gen, k1, nprobe = nprobe)
          else Imi.search(spark, gen, k1, nprobe = nprobe)
        val got = res.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        ((System.nanoTime() - t0) / 1e9, (got & exact).size.toDouble / exact.size)
      }
      once(); drop()
      val (warm, recall) = once(); drop()
      println(f"| ${factor}x-adv | $label | $pop | $mxFrac%.4f | $recall%.3f | $warm%.2f |")
    }
    // SemDeDup-IMI under the collapse: the verdict's within-cell pair
    // work is Σ c_i² — diagonal concentration turns the linear n·κ
    // budget into a near-quadratic bill. Report the pair totals and the
    // measured verdict wall, unrotated vs rotated, at the SemDeDup cell
    // rule (n/256 target via the IMI's product cells).
    println("\n| corpus | variant | Σ cell² (pair work) | verdict s |")
    println("|---|---|---|---|")
    for (rot <- Seq(false, true)) {
      val label = if (rot) "rotated" else "unrotated"
      val base = if (rot) Imi.rotated(emb, Imi.RotSeed)
        else emb.select(col("vec_id"), col("embedding"))
      val assigned = {
        import spark.implicits._
        val (cl, cr) = Imi.models(base, k1)
        base.as[(Long, Array[Float])]
          .map { case (id, v) =>
            (id, Imi.cellIdOf(v, cl, cr, k1), v, Similarity.normP(v)) }
          .toDF("vec_id", "cid", "embedding", "nrm")
      }
      val pairWork = assigned.groupBy("cid").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
      drop()
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.Dedup.semanticVerdict(assigned, 0.9, ordered = false)
          .filter(col("is_dup")).count()
        (System.nanoTime() - t0) / 1e9
      }
      once(); drop()
      val warm = once(); drop()
      println(f"| ${factor}x-adv | $label | $pairWork%,d | $warm%.2f |")
    }
    spark.stop()
  }
}
