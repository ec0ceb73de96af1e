package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle + shard assignment — the EXPORT step of a
  * training-data pipeline: training wants the corpus in a reproducible
  * pseudo-random order, split into a fixed number of shards of roughly
  * equal size, such that re-running the export (on any engine, any
  * partitioning, any cluster size) yields byte-identical shards.
  *
  * `random()`-based shuffles fail every one of those requirements; the
  * shuffle key here is the first 52 bits of md5(doc_id) as an integer
  * (the same engine-portable coin [[Sampling.temperatureSample]] flips):
  * shard = h mod S, intra-shard order = (h, doc_id). The manifest also
  * carries a running character total per shard, which is what a
  * byte-budgeted writer needs to cut fixed-size files without a second
  * pass.
  *
  * Scale shape: ONE shuffle, on the shard id (S partitions); the
  * per-shard window sorts only its shard and streams the running sum. At
  * 100 TB the physical write is `df.repartition(col("shard"))
  * .sortWithinPartitions("h52", "doc_id").write.partitionBy("shard")` —
  * this manifest IS that plan's ordering, so the written shards match it
  * row-for-row. */
object Sharding {

  /** Shard manifest over the documents corpus: (doc_id, shard, pos,
    * cum_chars), `pos` the document's position in its shard's
    * deterministic order, `cum_chars` the running n_chars total. */
  def shardManifest(spark: SparkSession, dir: String, shards: Int = 16): DataFrame = {
    val h52 = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val w = Window.partitionBy("shard").orderBy("h52", "doc_id")
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("h52", h52)
      .withColumn("shard", (col("h52") % shards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum_chars", sum("n_chars").over(w))
      .select("doc_id", "shard", "pos", "cum_chars")
      .orderBy("shard", "pos")
  }

  def shardManifestSql(shards: Int = 16): String = s"""
WITH h AS (
  SELECT doc_id, n_chars,
    CAST(list_sum(list_transform(generate_series(1, 13),
      i -> (strpos('0123456789abcdef',
              substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1)
           * (1::BIGINT << (4 * (13 - i))))) AS BIGINT) AS h52
  FROM documents
), m AS (
  SELECT doc_id, n_chars, h52, CAST(h52 % $shards AS INTEGER) AS shard
  FROM h
)
SELECT doc_id, shard,
  CAST(row_number() OVER (PARTITION BY shard ORDER BY h52, doc_id) AS BIGINT) AS pos,
  CAST(sum(n_chars) OVER (PARTITION BY shard ORDER BY h52, doc_id) AS BIGINT) AS cum_chars
FROM m
ORDER BY shard, pos
""".trim
}
