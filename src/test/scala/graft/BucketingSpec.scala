package graft

import graft.operators.Bucketing
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Bucketed co-location: the join over bucketed tables must plan with no
  * Exchange on either side (the shuffle was pre-paid at write time), and
  * the result must equal the plain-join answer. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed orders ⋈ lineitem is a zero-Exchange sort-merge join") {
    val dir = Files.createTempDirectory("graft-bucket").toString
    Bucketing.writeBucketed(spark, "/root/testdata/sf0.001", dir)
    val broadcastConf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast plan so the Exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedRevenue(spark)
      val plan = joined.queryExecution.executedPlan.toString
      // sort-merge join directly over the bucketed scans: no Exchange on
      // either join key (the aggregate/orderBy above keep their own
      // exchanges on o_orderpriority — bucketing can't and shouldn't
      // remove presentation shuffles)
      assert(plan.contains("SortMergeJoin"), plan)
      assert("Bucketed: true".r.findAllIn(plan).size == 2, plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"), plan)
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"), plan)

      // same answer as the unbucketed plain join
      val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
          org.apache.spark.sql.functions.col("o_orderkey") ===
            org.apache.spark.sql.functions.col("l_orderkey"))
        .groupBy("o_orderpriority").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastConf)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    }
  }
}
