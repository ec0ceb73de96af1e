package graft

import graft.operators.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binned range join: the plan must be an equi shuffle join (the whole
  * point — a naive interval theta-join plans as BroadcastNestedLoopJoin),
  * and the result must equal the naive formulation. */
class EventOpsRangeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("binned range join plans with no BroadcastNestedLoopJoin") {
    val df = EventOps.binnedRangeJoin(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join") || plan.contains("Exchange hashpartitioning"), plan)
  }

  test("binned range join equals the naive theta-join formulation") {
    val dir = "/root/testdata/sf0.001"
    val binned = EventOps.binnedRangeJoin(spark, dir).collect()
    assert(binned.nonEmpty, "range join produced no rows — fixture mismatch")

    // naive reference: read events the same ns->us way, theta-join directly
    // (save/restore the nanos flag — unset would clobber a session-level
    // setting some other fixture relies on)
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val ev =
      try spark.read.parquet(s"$dir/events.parquet")
        .withColumn("us", expr("ts div 1000"))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("click_us"), col("value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("us").as("p_us"))
    val naive = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("click_us").between(col("p_us") - EventOps.RangeBinUs, col("p_us")))
      .groupBy(col("p_user").as("user_id"), col("event_id"), col("p_us").as("purchase_us"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_click_value"),
        min(col("click_us")).as("first_click_us"),
        max(col("click_us")).as("last_click_us"))
      .orderBy("user_id", "event_id")
      .collect()

    assert(binned.length == naive.length)
    binned.zip(naive).foreach { case (b, n) => assert(b == n, s"$b vs $n") }
  }
}
