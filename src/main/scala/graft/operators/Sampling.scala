package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling — the subset-selection step of a
  * training-data pipeline (per-language balancing, eval holdouts,
  * ablation slices). `sample()`-style random draws are useless there:
  * the selection must be REPRODUCIBLE across runs, engines, and
  * partitionings, so the "randomness" is a content hash.
  *
  * Stratified quota sampling: rank documents inside each stratum by
  * `md5(doc_id)` — a uniform, engine-portable pseudo-random key — and
  * keep the first `quota` per stratum. Scale shape: one shuffle on the
  * stratum key; the rank window never sees more than one stratum's rows,
  * and quota cutoffs stream (no full-stratum materialization beyond the
  * window sort). A skewed stratum sorts more rows but emits `quota` —
  * the output is bounded by design.
  */
object Sampling {

  /** Deterministic per-language quota sample over the documents corpus. */
  def stratifiedSample(spark: SparkSession, dir: String, quota: Int = 50): DataFrame = {
    val rankWin = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"))
      .withColumn("sample_rank", row_number().over(rankWin).cast("long"))
      .filter(col("sample_rank") <= quota)
      .orderBy("lang", "sample_rank")
  }

  def stratifiedSampleSql(quota: Int = 50): String = s"""
WITH ranked AS (
  SELECT doc_id, lang,
    row_number() OVER (PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM documents
)
SELECT doc_id, lang, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= $quota
ORDER BY lang, sample_rank
""".trim

  /** Temperature-smoothed mixture sampling — the domain/language
    * re-weighting step of a multilingual/multi-domain training mix
    * (α-smoothing as in Lample & Conneau 2019, arXiv:1901.07291 §3.1):
    * high-resource strata are down-sampled relative to their share so the
    * mix follows p_s^α instead of p_s. With acceptance probability
    * a_s = min(1, k/√n_s), the expected take per stratum is
    * min(n_s, k·√n_s) ∝ √n_s — exactly the α = 0.5 mixture, and the ONLY
    * α whose `pow` is IEEE-correctly-rounded everywhere (`sqrt`), which
    * is what lets an independent engine reproduce the accept/reject
    * boundary bit-for-bit. `k` sets the global take; callers wanting a
    * target row count T pick k = T / Σ_s √n_s driver-side.
    *
    * The per-document coin is the usual engine-portable hash uniform:
    * the first 52 bits of md5(doc_id) as a double in [0,1) — 52 bits so
    * the integer→double conversion is exact. Deterministic across runs,
    * engines, and partitionings; selection needs one tiny broadcast join
    * (distinct strata counts), no shuffle of the corpus itself. */
  def temperatureSample(spark: SparkSession, dir: String, k: Double = 4.0): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("lang"))
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0)) // 2^52 — exact division
    val accept = least(lit(1.0), lit(k) / sqrt(col("n_lang")))
    d.join(broadcast(counts), "lang")
      .withColumn("u", u)
      .withColumn("a", accept)
      .select(col("doc_id"), col("lang"), round(col("u"), 6).as("u"),
        round(col("a"), 6).as("accept_prob"),
        (col("u") < col("a")).as("kept"))
      .orderBy("doc_id")
  }

  def temperatureSampleSql(k: Double = 4.0): String = s"""
WITH counts AS (
  SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang
), uu AS (
  SELECT doc_id, lang,
    CAST(list_sum(list_transform(generate_series(1, 13),
      i -> (strpos('0123456789abcdef',
              substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
           * (1::BIGINT << (4 * (13 - i))))) AS DOUBLE)
    / 4503599627370496.0 AS u
  FROM documents
)
SELECT d.doc_id, d.lang, round(d.u, 6) AS u,
  round(least(1.0, $k / sqrt(c.n_lang)), 6) AS accept_prob,
  d.u < least(1.0, $k / sqrt(c.n_lang)) AS kept
FROM uu d JOIN counts c USING (lang)
ORDER BY d.doc_id
""".trim

  /** The composed curation pipeline — the end-to-end flow a training-data
    * run actually executes, as ONE declarative plan Catalyst optimizes
    * whole: exact dedup (keep min doc_id per canonical fingerprint) →
    * quality gate (≥ `minWords` words) → language ID → deterministic
    * per-language quota sample. Each stage is the same operator the
    * stand-alone queries oracle individually; this query oracles their
    * COMPOSITION (stage boundary semantics: what dedup feeds the filter,
    * what the filter feeds the classifier, how ranks are assigned after
    * all upstream pruning). */
  def curationPipeline(spark: SparkSession, dir: String, minWords: Int = 30,
                       quota: Int = 100): DataFrame = {
    val fp = Dedup.canonicalFp(col("text"))
    val dedupWin = Window.partitionBy("fp").orderBy("doc_id")
    val best = TextAnalysis.predictedLang(col("text"))
    val rankWin = Window.partitionBy("predicted_lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("fp", fp)
      .withColumn("rn", row_number().over(dedupWin))
      .filter(col("rn") === 1)
      .withColumn("n_words", size(split(col("text"), " ")))
      .filter(col("n_words") >= minWords)
      .withColumn("predicted_lang", best._1)
      .withColumn("sample_rank", row_number().over(rankWin).cast("long"))
      .filter(col("sample_rank") <= quota)
      .select("doc_id", "predicted_lang", "n_words", "sample_rank")
      .orderBy("predicted_lang", "sample_rank")
  }

  def curationPipelineSql(minWords: Int = 30, quota: Int = 100): String = s"""
WITH deduped AS (
  SELECT doc_id, text,
    row_number() OVER (
      PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
      ORDER BY doc_id) AS rn
  FROM documents
), kept AS (
  SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
  FROM deduped
  WHERE rn = 1 AND len(string_split(text, ' ')) >= $minWords
), scored AS (
  SELECT doc_id, n_words, ${TextAnalysis.langScoreColsSql}
  FROM kept
), labeled AS (
  SELECT doc_id, n_words, ${TextAnalysis.predictedLangCaseSql} AS predicted_lang
  FROM scored
), ranked AS (
  SELECT doc_id, predicted_lang, n_words,
    row_number() OVER (PARTITION BY predicted_lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
  FROM labeled
)
SELECT doc_id, predicted_lang, n_words, CAST(sample_rank AS BIGINT) AS sample_rank
FROM ranked WHERE sample_rank <= $quota
ORDER BY predicted_lang, sample_rank
""".trim
}
