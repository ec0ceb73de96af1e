package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Bucketing co-locates big-big joins: both sides bucketed on the join key
  * ⇒ sort-merge join with ZERO shuffle exchanges — the 100 TB answer when
  * neither side broadcasts. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$dir/customer.parquet")
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
      val physical = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (only the final small
      // groupBy may exchange)
      val joinSection = physical.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), physical)
      assert(!joinSection.contains("Exchange hashpartitioning(o_custkey"), physical)
      assert(!joinSection.contains("Exchange hashpartitioning(c_custkey"), physical)
      // and results are right
      val total = joined.agg(sum("cnt")).collect()(0).getLong(0)
      assert(total == spark.read.parquet(s"$dir/orders.parquet").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
