package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-location (SURVEY §2.7 scale path): pre-hash-partition both
  * sides of a recurring join into the same number of buckets on the join
  * key, so every subsequent join is a zero-Exchange sort-merge — the
  * shuffle is paid ONCE at write time and amortized over every read.
  *
  * This is the 100 TB answer to the fact-to-fact join (orders ⋈ lineitem
  * here; doc-id ⋈ embedding-id in the training-data pipeline): neither
  * side broadcasts, and an unbucketed join would shuffle both full tables
  * on every query. With matching bucket counts Spark's scan reports the
  * hash partitioning to the planner, which drops both Exchanges; with
  * `sortBy` on the bucket key the per-bucket sort is pre-paid too (one
  * file per bucket per write task — compact before relying on it).
  *
  * Bucket-count sizing at 100 TB: buckets ≈ table size / target partition
  * size (e.g. 100 TB / 256 MB ≈ 400k — cap by the key-space skew and
  * files-per-task overhead; powers of two let bucket counts divide evenly
  * when one side is coarser). */
object Bucketing {

  /** Write orders + lineitem bucketed (and sorted) by the join key into
    * `database`-less catalog tables backed by `path`. Idempotent
    * (overwrite). */
  def writeBucketed(spark: SparkSession, sfDir: String, path: String,
                    buckets: Int = 8): Unit = {
    graft.sources.Tables.read(spark, sfDir, "orders")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$path/orders_bucketed")
      .saveAsTable("orders_bucketed")
    graft.sources.Tables.read(spark, sfDir, "lineitem")
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$path/lineitem_bucketed")
      .saveAsTable("lineitem_bucketed")
  }

  /** The co-located join: order revenue per priority from the bucketed
    * tables. On bucketed inputs this plans as SortMergeJoin with ZERO
    * Exchange operators (BucketingSpec pins the plan shape). */
  def coLocatedRevenue(spark: SparkSession): DataFrame =
    spark.table("orders_bucketed")
      .join(spark.table("lineitem_bucketed"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(30,4)"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
}
