package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling measurement for the heavy operator family — the
  * round-3 verdict's top item: every 100 TB claim was argued from plan
  * shapes at 17 MB; this tool MEASURES the scaling curve on a
  * self-generated corpus `factor`× the size of sf0.1.
  *
  * Corpus construction (deterministic, structure-preserving): `factor`
  * blocks, block 0 the original. Replication must preserve WITHIN-block
  * near-dup structure exactly while keeping blocks mutually disjoint —
  * otherwise every original near-dup pair reappears across all block
  * pairs and the OUTPUT grows ~factor², poisoning the measurement of the
  * operators themselves.
  *   - documents: block b appends `_b{b}` to every token. A per-block
  *     token suffix is a BIJECTION on the shingle vocabulary: within-block
  *     Jaccard/winnowing/containment structure is exactly the original's,
  *     while cross-block shingle sets are disjoint (zero similarity).
  *   - embeddings: block b multiplies dimension i by a deterministic ±1
  *     sign s(b,i) (splitmix hash; block 0 all +1). Sign masks preserve
  *     every within-block dot product exactly (Σ s_i² x_i y_i = x·y) and
  *     leave cross-block cosines near 0 (E[cos] = 0 under ~32 flipped
  *     dims), so the LSH/minhash candidate structure scales linearly.
  *   - id stride 10M per block — clear of the q_ann_lsh augmentation
  *     stride (3 × 1M) and of every real id.
  *
  * Usage: runMain graft.tools.ScaleProbe [srcDir] [factor] [genDir] [annMode]
  * annMode: `shipped` (default — q_ann_lsh exactly as the driver runs it,
  * 48×12 banding at both scales), `auto` (banding from
  * [[graft.operators.Similarity.bandingFor]] at each corpus's size — the
  * self-scaling form, the honest configuration beyond ~10×), or `skip`.
  * Prints a markdown table of cold/warm seconds and output rows at 1×
  * and factor× — the data behind SCALING.md.
  */
object ScaleProbe {

  val BlockStride = 10000000L

  val Family: Seq[String] = Seq(
    "q_jaccard_pairs", "q_dup_clusters", "q_winnow_overlap", "q_passages",
    "q_contamination", "q_dedup_incremental", "q_minhash_dedup", "q_ann_lsh",
    "q_substring_dup", "q_substring_cut")

  private[graft] def sign(b: Int, i: Int): Float = {
    var z = b.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if (z > 0) 1.0f else -1.0f
  }

  /** Vectors-only corpus scaling for the deep ANN scale points (the
    * IVF/IMI tools read only embeddings.parquet; replicating the text
    * corpus 1000× buys nothing there). Blocks are written in chunked
    * append jobs so factor = 1000 never builds a 1000-way union plan. */
  def generateEmbeddings(spark: SparkSession, src: String, factor: Int,
                         out: String, chunk: Int = 50): Unit = {
    val dim = graft.operators.Similarity.Dim
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    (0 until factor).grouped(chunk).zipWithIndex.foreach { case (bs, ci) =>
      val blocks = bs.map { b =>
        if (b == 0) emb
        else emb.select(
          (col("vec_id") + lit(b * BlockStride)).as("vec_id"),
          array((1 to dim).map(i =>
            element_at(col("embedding"), i) * lit(sign(b, i))): _*).as("embedding"),
          col("label"))
      }
      blocks.reduce(_ unionAll _).write
        .mode(if (ci == 0) "overwrite" else "append")
        .parquet(s"$out/embeddings.parquet")
    }
  }

  def generate(spark: SparkSession, src: String, factor: Int, out: String): Unit = {
    generateDocs(spark, src, factor, out)
    generateEmbeddings(spark, src, factor, out)
  }

  /** Documents-only block replication, chunked like [[generateEmbeddings]]
    * (a factor-wide unionAll plan stops being analyzable near 1000 children;
    * content is block-for-block identical to the unchunked original). */
  def generateDocs(spark: SparkSession, src: String, factor: Int,
                   out: String, chunk: Int = 50): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until factor).grouped(chunk).zipWithIndex.foreach { case (bs, ci) =>
      val blocks = bs.map { b =>
        if (b == 0) docs
        else docs.select(
          (col("doc_id") + lit(b * BlockStride)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "$1_b" + b).as("text"),
          col("lang"), col("source"),
          length(regexp_replace(col("text"), "(\\S+)", "$1_b" + b)).cast("long").as("n_chars"))
      }
      blocks.reduce(_ unionAll _).write
        .mode(if (ci == 0) "overwrite" else "append")
        .parquet(s"$out/documents.parquet")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 10
    val gen = if (args.length > 2) args(2) else s"/tmp/graft_scale${factor}x"
    val annMode = if (args.length > 3) args(3) else "shipped"
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
      println(s"[scale] generating ${factor}x corpus at $gen")
      generate(spark, src, factor, gen)
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    // GRAFT_SCALE_QUERIES=q_a,q_b restricts the family — the isolated
    // measurement mode: one JVM per query kills the cross-query
    // block-manager/GC residency that contaminates warm numbers when the
    // whole family runs back-to-back at 30× in one process
    val family0 = if (annMode == "skip") Family.filterNot(_ == "q_ann_lsh") else Family
    val family = sys.env.get("GRAFT_SCALE_QUERIES")
      .map(s => family0.filter(s.split(',').map(_.trim).toSet))
      .getOrElse(family0)
    // JVM/codegen warmup at the smallest SF so 1x cold isn't Janino time
    family.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[scale] prewarm $name: ${e.getMessage}") }
      finally drop()
    }
    def runQuery(name: String, dir: String): DataFrame =
      if (name == "q_ann_lsh" && annMode == "auto") {
        val aug = graft.operators.Similarity.augmentedEmb(spark, dir)
        val (b, p) = graft.operators.Similarity.bandingFor(aug.count(), 0.8)
        println(s"[scale] ann auto-banding for $dir: ${b}x$p")
        graft.operators.Similarity.annPairsOn(aug, 0.8, bands = b, planesPerBand = p)
      } else SparkEntry.queries(name)(spark, dir)
    case class M(name: String, dir: String, cold: Double, warm: Double, rows: Long)
    val ms = for (dir <- Seq(src, gen); name <- family) yield {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        // toRdd.count(): materialize every output column (same honesty
        // fix as Bench.materialize — a bare count() lets the optimizer
        // hollow out final projections and unique-key left joins)
        val n = try runQuery(name, dir).queryExecution.toRdd.count()
        finally drop()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (cold, rows) = once()
      val (warm, _) = once()
      println(f"[scale] $name%-18s $dir%-28s cold $cold%7.2f warm $warm%7.2f rows $rows%d")
      M(name, dir, cold, warm, rows)
    }
    println("\n| query | 1x cold | 1x warm | 1x rows | " +
      s"${factor}x cold | ${factor}x warm | ${factor}x rows | warm ratio | rows ratio |")
    println("|---|---|---|---|---|---|---|---|---|")
    family.foreach { name =>
      val a = ms.find(m => m.name == name && m.dir == src).get
      val b = ms.find(m => m.name == name && m.dir == gen).get
      println(f"| $name | ${a.cold}%.2f | ${a.warm}%.2f | ${a.rows} | " +
        f"${b.cold}%.2f | ${b.warm}%.2f | ${b.rows} | ${b.warm / a.warm}%.1f× | " +
        f"${b.rows.toDouble / a.rows}%.1f× |")
    }
    spark.stop()
  }
}
