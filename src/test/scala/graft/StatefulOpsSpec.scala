package graft

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{UserEvent, UserUpdate}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Stateful streaming (flatMapGroupsWithState) and the typed Aggregator. */
class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("state carries across micro-batches: running totals end at per-user counts") {
    val landing = Files.createTempDirectory("graft-state").toString
    val events = (0 until 300).map { i =>
      UserEvent(i % 5L, new java.sql.Timestamp(1700000000000L + i * 1000L), 1.5)
    }
    // three separate files + maxFilesPerTrigger=1 → three micro-batches,
    // so correctness REQUIRES the state store to carry totals across
    events.grouped(100).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF().coalesce(1).write.parquet(s"$landing/part$i")
    }
    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/part*")
      .as[UserEvent]
    val q = StatefulOps.runningUserTotals(stream)
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("append").format("memory").queryName("stateful_out")
      .start()
    q.awaitTermination(120000)

    val out = spark.table("stateful_out").as[UserUpdate].collect()
    assert(out.length == 300) // one update per event
    val finals = out.groupBy(_.user_id).map { case (u, ups) =>
      u -> ups.maxBy(_.events_so_far)
    }
    finals.foreach { case (u, f) =>
      assert(f.events_so_far == 60L, s"user $u ended at ${f.events_so_far}")
      assert(math.abs(f.value_so_far - 90.0) < 1e-9)
    }
  }

  test("dedup ledger drops replayed fingerprints across micro-batches") {
    import graft.streaming.StatefulOps.LedgerDoc
    val landing = Files.createTempDirectory("graft-ledger").toString
    def fp(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // batch 0: A, B, and an in-batch replay of A under a different doc_id
    // batch 1: replay of A (again different doc_id), replay of B, new C
    // batch 2: replay of C, new D
    val batches = Seq(
      Seq(LedgerDoc(1L, fp("A"), "A"), LedgerDoc(2L, fp("B"), "B"), LedgerDoc(3L, fp("A"), "A")),
      Seq(LedgerDoc(4L, fp("A"), "A"), LedgerDoc(5L, fp("B"), "B"), LedgerDoc(6L, fp("C"), "C")),
      Seq(LedgerDoc(7L, fp("C"), "C"), LedgerDoc(8L, fp("D"), "D"))
    )
    batches.zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF().coalesce(1).write.parquet(s"$landing/part$i")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, fingerprint STRING, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/part*")
      .as[LedgerDoc]
    val q = StatefulOps.dedupLedger(stream)
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("append").format("memory").queryName("ledger_out")
      .start()
    q.awaitTermination(120000)

    val out = spark.table("ledger_out").as[LedgerDoc].collect().sortBy(_.doc_id)
    // exactly one survivor per distinct content, first-batch min-doc_id wins
    assert(out.map(_.text).toSeq == Seq("A", "B", "C", "D"))
    assert(out.map(_.doc_id).toSeq == Seq(1L, 2L, 6L, 8L))
  }

  test("dedup ledger runs on the RocksDB state store provider (the at-scale config)") {
    import graft.streaming.StatefulOps.LedgerDoc
    val landing = Files.createTempDirectory("graft-ledger-rdb").toString
    Seq(
      Seq(LedgerDoc(1L, "fpA", "A"), LedgerDoc(2L, "fpB", "B")),
      Seq(LedgerDoc(3L, "fpA", "A"), LedgerDoc(4L, "fpC", "C"))
    ).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF().coalesce(1).write.parquet(s"$landing/part$i")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, fingerprint STRING, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/part*")
      .as[LedgerDoc]
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val q = StatefulOps.dedupLedger(stream)
        .writeStream.trigger(Trigger.AvailableNow())
        .outputMode("append").format("memory").queryName("ledger_rdb_out")
        .start()
      q.awaitTermination(120000)
      val out = spark.table("ledger_rdb_out").as[LedgerDoc].collect().sortBy(_.doc_id)
      assert(out.map(_.text).toSeq == Seq("A", "B", "C")) // fpA replay dropped
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("deduped invoice stream: reformatted replay collapses to one processed doc") {
    val landing = Files.createTempDirectory("graft-dedup-stream").toString
    val t1 = GoldenStreamFixtures.valid
    val t1Reformatted = t1.replace(" ", "  ") // normalization collapses this
    val t2 = t1.replace("R$ 100,00", "R$ 200,00") // genuinely different content
    Seq(
      Seq((1L, t1)),
      Seq((2L, t1Reformatted), (3L, t2))
    ).zipWithIndex.foreach { case (chunk, i) =>
      chunk.toDF("doc_id", "text").coalesce(1).write.parquet(s"$landing/part$i")
    }
    val q = graft.streaming.StreamingPipeline.dedupedInvoiceStream(spark, s"$landing/part*")
      .writeStream.trigger(Trigger.AvailableNow())
      .outputMode("append").format("memory").queryName("dedup_stream_out")
      .start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_stream_out").collect().map(_.getLong(0)).sorted
    // doc 2 is a reformatted replay of doc 1's content → dropped by the
    // ledger; docs 1 and 3 process exactly once
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("expiring sessions: state times out past the watermark, emits once, frees the key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    def ev(u: Long, min: Long, v: Double) =
      UserEvent(u, new java.sql.Timestamp(base + min * 60000L), v)
    val mem = MemoryStream[UserEvent]
    val sessions = StatefulOps.expiringSessions(
      mem.toDS().withWatermark("ts", "10 minutes").as[UserEvent])
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("exp_sessions").start()

    // user 1: a 3-event burst over 5 minutes
    mem.addData(ev(1L, 0, 1.0), ev(1L, 2, 2.0), ev(1L, 5, 3.0))
    q.processAllAvailable()
    assert(spark.table("exp_sessions").count() == 0) // still open
    // a far-future event advances the watermark past user 1's gap window…
    mem.addData(ev(99L, 180, 1.0))
    q.processAllAvailable()
    // …and the timeout fires on the following trigger
    mem.addData(ev(99L, 181, 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("exp_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).getTime, r.getTimestamp(4).getTime))
    // exactly one closed session: user 1, 3 events, span [t0, t0+5m];
    // user 99's session is still active (its state must NOT have emitted)
    assert(out.toSeq == Seq((1L, 3L, 6.0, base, base + 5 * 60000L)), s"got ${out.toSeq}")
  }

  test("expiring sessions: a backfill batch with an intra-batch gap splits into sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    def ev(u: Long, min: Long, v: Double) =
      UserEvent(u, new java.sql.Timestamp(base + min * 60000L), v)
    val mem = MemoryStream[UserEvent]
    val q = StatefulOps.expiringSessions(
      mem.toDS().withWatermark("ts", "10 minutes").as[UserEvent])
      .writeStream.outputMode("append")
      .format("memory").queryName("backfill_sessions").start()
    // one replayed batch carries TWO bursts 5 hours apart — the gap must
    // split them even though no watermark timeout fires in between
    mem.addData(ev(7L, 0, 1.0), ev(7L, 3, 1.0), ev(7L, 300, 1.0), ev(7L, 302, 1.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("backfill_sessions")
      .collect().map(r => (r.getLong(1), r.getTimestamp(3).getTime, r.getTimestamp(4).getTime))
    // the FIRST burst closed inline; the second is still open in state
    assert(out.toSeq == Seq((2L, base, base + 3 * 60000L)), s"got ${out.toSeq}")
  }

  test("typed Aggregator: trust histogram over the invoice corpus") {
    val scores = graft.operators.InvoicePipeline.query(spark, "/root/testdata/sf0.001")
      .select(col("trust_score")).as[Double]
    val summary = scores.select(StatefulOps.TrustStatsAggregator.toColumn).collect()(0)
    assert(summary.n == 1500)
    assert(summary.buckets.sum == 1500)
    assert(summary.buckets(3) > summary.buckets(0)) // most docs score high
    assert(summary.mean > 0.8 && summary.mean <= 1.0)
  }

  test("Aggregator composes with groupByKey for per-tenant summaries") {
    val df = graft.operators.InvoicePipeline
      .process(graft.operators.InvoicePipeline.syntheticCorpus(spark, "/root/testdata/sf0.001"))
      .select(col("tenant_id"), col("trust_score"))
      .as[(String, Double)]
    val perTenant = df.groupByKey(_._1)
      .mapValues(_._2)
      .agg(StatefulOps.TrustStatsAggregator.toColumn)
      .collect()
    assert(perTenant.length == 5) // five mktsegments as tenants
  }
}
