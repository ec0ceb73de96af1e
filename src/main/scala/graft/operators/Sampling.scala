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
}
