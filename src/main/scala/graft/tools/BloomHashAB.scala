package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** A/B the Bloom position-family implementations at corpus scale: the
  * k-independent-md5 family, the Kirsch–Mitzenmacher one-digest family
  * as a single expression (CSE-dependent), and K-M with the digest
  * staged through an explicit projection. Prints walls for the build
  * shape (explode + count) and the probe shape (forall over the array),
  * plus the executed plan of the smallest case so the CSE verdict is
  * visible, not guessed. Usage: BloomHashAB [sfDir] [factor]. */
object BloomHashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val m = 1 << 24
    val k = 5

    def h52(c: Column): Column =
      conv(substring(md5(c), 1, 13), 16, 10).cast("long")

    def posIndep(text: Column): Column =
      array((0 until k).map(i =>
        h52(concat(lit(s"$i:"), coalesce(text, lit("")))) % m): _*)

    def posKm(text: Column): Column = {
      val hex = md5(coalesce(text, lit("")))
      val h1 = conv(substring(hex, 1, 13), 16, 10).cast("long")
      val h2 = conv(substring(hex, 14, 13), 16, 10).cast("long")
      array((0 until k).map(i => (h1 + lit(i.toLong) * h2) % m): _*)
    }

    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(factor).select(col("id").as("rep")))
      .select(concat(col("text"), lit(" r"), col("rep")).as("text"))
      .repartition(spark.sparkContext.defaultParallelism)

    def kmStaged = corpus
      .select(md5(coalesce(col("text"), lit(""))).as("hex"))
      .select(conv(substring(col("hex"), 1, 13), 16, 10).cast("long").as("h1"),
        conv(substring(col("hex"), 14, 13), 16, 10).cast("long").as("h2"))
      .select(array((0 until k).map(i =>
        (col("h1") + lit(i.toLong) * col("h2")) % m): _*).as("ps"))

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[hashab] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // warm the input once
    corpus.queryExecution.toRdd.count()
    (1 to 2).foreach { round =>
      println(s"[hashab] ----- round $round (factor $factor) -----")
      timed("independent: explode+count") {
        corpus.select(explode(posIndep(col("text"))).as("p"))
          .queryExecution.toRdd.count()
      }
      timed("km single-expr: explode") {
        corpus.select(explode(posKm(col("text"))).as("p"))
          .queryExecution.toRdd.count()
      }
      timed("km staged: explode") {
        kmStaged.select(explode(col("ps")).as("p"))
          .queryExecution.toRdd.count()
      }
      timed("independent: array only") {
        corpus.select(posIndep(col("text")).as("ps"))
          .queryExecution.toRdd.count()
      }
      timed("km single-expr: array only") {
        corpus.select(posKm(col("text")).as("ps"))
          .queryExecution.toRdd.count()
      }
      timed("km staged: array only") {
        kmStaged.queryExecution.toRdd.count()
      }
      // the GATE shape: a UDF over the position array (broadcast probe)
      val bc = spark.sparkContext.broadcast(new Array[Long](m >>> 6))
      val allSet = udf { ps: Seq[Long] =>
        ps.forall(p => (bc.value((p >>> 6).toInt) & (1L << (p & 63))) != 0)
      }
      timed("independent: udf gate") {
        corpus.withColumn("d", allSet(posIndep(col("text"))))
          .filter(!col("d")).queryExecution.toRdd.count()
      }
      timed("km single-expr: udf gate") {
        corpus.withColumn("d", allSet(posKm(col("text"))))
          .filter(!col("d")).queryExecution.toRdd.count()
      }
      timed("km pre-projected col: udf gate") {
        corpus.withColumn("ps", posKm(col("text")))
          .withColumn("d", allSet(col("ps")))
          .filter(!col("d")).queryExecution.toRdd.count()
      }
      // ONE md5 on the columnar side; h1/h2 parse + probe loop in JVM
      val allSetHex = udf { hex: String =>
        val h1 = java.lang.Long.parseLong(hex.substring(0, 13), 16)
        val h2 = java.lang.Long.parseLong(hex.substring(13, 26), 16)
        var i = 0
        var all = true
        while (all && i < k) {
          val p = (h1 + i * h2) % m
          all = (bc.value((p >>> 6).toInt) & (1L << (p & 63))) != 0
          i += 1
        }
        all
      }
      timed("km hex-udf: udf gate") {
        corpus.withColumn("d", allSetHex(md5(coalesce(col("text"), lit("")))))
          .filter(!col("d")).queryExecution.toRdd.count()
      }
    }
    println("[hashab] km single-expr plan:")
    println(corpus.select(posKm(col("text")).as("ps"))
      .queryExecution.executedPlan.toString.take(2000))
    spark.stop()
  }
}
