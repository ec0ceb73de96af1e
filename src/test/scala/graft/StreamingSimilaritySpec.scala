package graft

import graft.streaming.StreamingSimilarity
import graft.streaming.StreamingSimilarity.{Entered, VecRow}
import org.scalatest.funsuite.AnyFunSuite

/** Incremental top-k over a vector stream: per-query state holds only the
  * current k best; emissions mark exactly the moments a vector entered. */
class StreamingSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  import spark.implicits._

  test("incremental top-k: enters on improvement, silent on worse, state spans batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // two axis-aligned queries in R^4: cosine with (a,b,c,d) is just the
    // normalized projection — exact expected values by construction
    val queries = Seq(
      1L -> Array(1f, 0f, 0f, 0f),
      2L -> Array(0f, 1f, 0f, 0f))
    val mem = MemoryStream[VecRow]
    val q = StreamingSimilarity.incrementalTopK(mem.toDS(), queries, k = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("inc_topk").start()

    // batch 1: v10 aligned with q1 (cos 1), v11 diagonal (cos ~0.707 to both)
    mem.addData(VecRow(10L, Array(2f, 0f, 0f, 0f)), VecRow(11L, Array(1f, 1f, 0f, 0f)))
    q.processAllAvailable()
    // batch 2: v12 beats v11 on q1 (cos ~0.9487); v13 is worse than both
    // current q1 entries (cos ~0.3162) → must NOT emit for q1
    mem.addData(VecRow(12L, Array(3f, 1f, 0f, 0f)), VecRow(13L, Array(1f, 3f, 0f, 0f)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("inc_topk").as[Entered].collect()
      .map(e => (e.query_id, e.vec_id, math.rint(e.cos * 10000) / 10000))
    val q1 = out.filter(_._1 == 1L).map(t => (t._2, t._3)).sortBy(_._1)
    val q2 = out.filter(_._1 == 2L).map(t => (t._2, t._3)).sortBy(_._1)
    // q1: 10 and 11 entered in batch 1; 12 entered (evicting 11) in batch 2;
    // 13 never entered q1's top-2
    assert(q1.toSeq == Seq((10L, 1.0), (11L, 0.7071), (12L, 0.9487)), s"q1: ${q1.toSeq}")
    // q2: batch 1 admits 11 (0.7071) and 10 (cos 0 — the top-2 isn't full
    // yet); batch 2 admits only 13 (0.9487, evicting 10) — 12's 0.3162 is
    // below the now-full top-2's floor and must stay silent
    assert(q2.toSeq == Seq((10L, 0.0), (11L, 0.7071), (13L, 0.9487)), s"q2: ${q2.toSeq}")
  }

  test("incremental top-k: re-ingestion replaces its entry; NaN/mismatched vectors degrade") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val queries = Seq(1L -> Array(1f, 0f, 0f, 0f))
    val mem = MemoryStream[VecRow]
    val q = StreamingSimilarity.incrementalTopK(mem.toDS(), queries, k = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("inc_topk2").start()

    mem.addData(VecRow(1L, Array(1f, 0f, 0f, 0f)), VecRow(2L, Array(1f, 1f, 0f, 0f)))
    q.processAllAvailable()
    // vector 2 re-embedded with a better cosine: REPLACES its entry (one
    // slot, one emission), it must not occupy two of the k slots
    mem.addData(VecRow(2L, Array(3f, 1f, 0f, 0f)))
    q.processAllAvailable()
    // poison batch: NaN component, wrong dimension, zero vector — all
    // skipped; the stream must survive AND the top-k must not freeze
    mem.addData(VecRow(3L, Array(Float.NaN, 1f, 0f, 0f)),
      VecRow(4L, Array(1f, 0f)), VecRow(5L, Array(0f, 0f, 0f, 0f)))
    q.processAllAvailable()
    // a genuine improvement after the poison batch still enters
    mem.addData(VecRow(6L, Array(9f, 1f, 0f, 0f)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("inc_topk2").as[Entered].collect()
      .map(e => (e.vec_id, math.rint(e.cos * 10000) / 10000)).sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1.0), (2L, 0.7071), (2L, 0.9487), (6L, 0.9939)),
      s"got ${out.toSeq}")
  }

  test("dynamic panel: a query registered mid-stream joins without a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, expr}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the panel lives in an embedded Derby registry: a JDBC relation
    // re-executes its scan every micro-batch (unlike a parquet path,
    // whose file listing pins at DataFrame creation), so INSERTs become
    // visible to the running stream — the embedding travels as CSV text,
    // parsed in the panel projection, which re-evaluates with the scan
    val url = "jdbc:derby:memory:graftpanel;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE panel (query_id BIGINT, emb VARCHAR(200))")
    conn.createStatement().execute("INSERT INTO panel VALUES (1, '1,0,0,0')")
    val panel = spark.read.jdbc(url, "panel", new java.util.Properties())
      .select(col("query_id"),
        expr("transform(split(emb, ','), x -> cast(x as float))").as("embedding"))
    val mem = MemoryStream[VecRow]
    val q = StreamingSimilarity.incrementalTopKDynamic(mem.toDS(), panel, k = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("inc_topk_dyn").start()
    try {
      // batch 1: only query 1 is registered
      mem.addData(VecRow(10L, Array(2f, 0f, 0f, 0f)), VecRow(11L, Array(1f, 1f, 0f, 0f)))
      q.processAllAvailable()
      // register query 2 MID-STREAM, then ingest one more vector
      conn.createStatement().execute("INSERT INTO panel VALUES (2, '0,1,0,0')")
      mem.addData(VecRow(12L, Array(0f, 3f, 0f, 0f)))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("inc_topk_dyn").as[Entered].collect()
      .map(e => (e.query_id, e.vec_id, math.rint(e.cos * 10000) / 10000))
    val q1 = out.filter(_._1 == 1L).map(t => (t._2, t._3)).sortBy(_._1)
    val q2 = out.filter(_._1 == 2L).map(t => (t._2, t._3)).sortBy(_._1)
    // q1 saw both batches: 10 and 11 entered in batch 1; v12 (cos 0)
    // never enters the full top-2
    assert(q1.toSeq == Seq((10L, 1.0), (11L, 0.7071)), s"q1: ${q1.toSeq}")
    // q2 exists from batch 2 on and ranks ONLY batch-2 vectors — no
    // retroactive backfill of v10/v11
    assert(q2.toSeq == Seq((12L, 1.0)), s"q2: ${q2.toSeq}")
  }
}
