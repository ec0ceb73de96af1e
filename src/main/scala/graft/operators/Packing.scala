package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk planner LLM pretraining uses
  * to turn a document corpus into fixed-token-budget training sequences:
  * documents are laid out in a deterministic order (doc_id), token counts
  * accumulate, and a document belongs to the chunk where it STARTS
  * (`bin = prefix_tokens_before_doc / budget`). The output is the packing
  * PLAN (per-bin document count, token total, doc range) — the shuffle-free
  * metadata a writer job then uses to emit the actual sequences.
  *
  * Scale design — the global prefix sum is the whole problem: a window
  * with a global ORDER BY collapses to ONE partition (the classic
  * 100 TB-killer; fine for the oracle, fatal on a cluster). The
  * implementation is the textbook two-phase distributed prefix sum:
  *
  *   1. range-partition by doc_id, sort within partitions
  *      (`localCheckpoint` pins the layout so both passes see identical
  *      partitions);
  *   2. per-partition token totals (tiny: one row per partition) get
  *      exclusive-prefix-summed by a window over partition ids — the only
  *      single-partition window runs over ≤ numPartitions rows;
  *   3. a narrow per-partition cumulative sum (`mapPartitions` — genuine
  *      sequential logic) plus the broadcast partition offset gives every
  *      document its exact global prefix without any wide shuffle.
  */
object Packing {

  /** Whitespace token counts per document (same tokenizer as
    * [[TextAnalysis.tokenCount]]'s ws_tokens — the cheap proxy). NULL text
    * behaves like '' (the repo-wide convention): without the coalesce,
    * Spark's size(null) is -1 and a NULL-text document would subtract a
    * token from the prefix sum while DuckDB's oracle yields NULL. */
  private def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(coalesce(col("text"), lit("")), "\\s+")).cast("long").as("tokens"))

  /** The packing plan: one row per output chunk. */
  def packSequences(spark: SparkSession, dir: String, budget: Long = 1024L,
                    numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
    else spark.sparkContext.defaultParallelism
    val ranged = tokenCounts(spark, dir)
      .repartitionByRange(parts, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .localCheckpoint() // pin partition layout across the two passes
    // pass 1: exclusive prefix of per-partition totals (≤ `parts` rows)
    val offsets = ranged.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(sum("tokens").as("ptotal"))
      .withColumn("offset",
        coalesce(sum("ptotal").over(org.apache.spark.sql.expressions.Window
          .orderBy("pid").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select("pid", "offset")
    // pass 2: narrow local cumsum + broadcast offset join
    val cum = ranged.select(col("doc_id"), col("tokens")).as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var acc = 0L
        it.map { case (id, t) => acc += t; (pid, id, t, acc) }
      }
      .toDF("pid", "doc_id", "tokens", "lcum")
      .join(broadcast(offsets), "pid")
      .withColumn("cum", col("lcum") + col("offset"))
    cum
      .withColumn("bin", expr(s"(cum - tokens) div $budget"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy("bin")
  }

  def packSequencesSql(budget: Long = 1024L): String = s"""
WITH toks AS (
  SELECT doc_id, CAST(len(regexp_split_to_array(COALESCE(text, ''), '\\s+')) AS BIGINT) AS tokens
  FROM documents
), cum AS (
  SELECT doc_id, tokens, SUM(tokens) OVER (ORDER BY doc_id) AS cum FROM toks
)
SELECT CAST((cum - tokens) // $budget AS BIGINT) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(tokens) AS BIGINT) AS total_tokens,
  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM cum GROUP BY 1 ORDER BY bin
""".trim
}
