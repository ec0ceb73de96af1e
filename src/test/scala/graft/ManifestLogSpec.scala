package graft

import graft.operators.ManifestLog
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** The lock-free manifest-log commit protocol (the r11 verdict's
  * missing-item 4, closed with the commit-log option): TWO appenders with
  * NO lock anywhere, freely interleaved — zero loss, zero duplicates;
  * idempotent replay of a committed batch; crash-window data (no marker)
  * invisible to readers and vacuumable; committed data never vacuumed. */
class ManifestLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def batchDf(writer: Int, batch: Int, rows: Int = 20) = {
    (0 until rows).map { i =>
      (writer.toLong * 1000000 + batch.toLong * 1000 + i, s"w$writer b$batch row $i")
    }.toDF("doc_id", "text")
  }

  test("two LOCK-FREE appenders, freely interleaved: zero loss, zero duplicates") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog").toString
    val nBatches = 12
    val errs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val threads = (1 to 2).map { w =>
      new Thread(() => {
        try (1 to nBatches).foreach { b =>
          ManifestLog.append(batchDf(w, b), root, s"writer$w", b.toLong)
        } catch { case e: Throwable => errs.add(s"writer$w: ${e.getMessage}") }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"appender failures: $errs")
    val got = ManifestLog.read(spark, root, schema)
      .select("doc_id").as[Long].collect().sorted
    val want = (for (w <- 1 to 2; b <- 1 to nBatches; i <- 0 until 20)
      yield w.toLong * 1000000 + b.toLong * 1000 + i).sorted
    assert(got.length == want.length, s"loss/dup: ${got.length} vs ${want.length}")
    assert(got.sameElements(want))
    assert(ManifestLog.segments(spark, root).size == 2 * nBatches)
  }

  test("replaying a committed (writer, batch) is idempotent — no rewrite, no duplicate rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-replay").toString
    val first = ManifestLog.append(batchDf(1, 1), root, "writer1", 1L)
    val second = ManifestLog.append(batchDf(1, 1), root, "writer1", 1L)
    assert(first == second, "replay must return the committed winner")
    assert(ManifestLog.read(spark, root, schema).count() == 20)
    assert(ManifestLog.segments(spark, root).size == 1)
  }

  test("two racing attempts of the SAME batch: readers agree on one winner, zero dup") {
    // simulate the ack-lost retry: both attempts commit markers (distinct
    // attempt ids); the deterministic min-attempt rule picks one
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-race").toString
    val errs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val ts = (1 to 2).map { _ =>
      new Thread(() => {
        try ManifestLog.append(batchDf(1, 7), root, "writer1", 7L)
        catch { case e: Throwable => errs.add(String.valueOf(e.getMessage)) }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(errs.isEmpty, s"racing attempts must both succeed: $errs")
    assert(ManifestLog.read(spark, root, schema).count() == 20, "zero dup")
    assert(ManifestLog.segments(spark, root).size == 1)
    // the losing attempt (marker + data) is reclaimable — and reclaiming
    // it never touches the winner or changes what readers see
    val removed = ManifestLog.vacuum(spark, root, graceMs = -1)
    if (removed.nonEmpty) { // empty when the two attempts collapsed to one
      assert(removed.size == 2, s"loser = one marker + one data dir: $removed")
      assert(ManifestLog.read(spark, root, schema).count() == 20)
      assert(ManifestLog.segments(spark, root).size == 1)
      assert(ManifestLog.vacuum(spark, root, graceMs = -1).isEmpty, "idempotent")
    }
  }

  test("crash window: data without a marker is invisible and vacuumable; committed data survives vacuum") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-crash").toString
    ManifestLog.append(batchDf(1, 1), root, "writer1", 1L)
    // simulate a crash between data write and marker creation
    batchDf(1, 2).write.parquet(s"$root/data/writer1-2__deadbeef")
    assert(ManifestLog.read(spark, root, schema).count() == 20,
      "unmarked data must be invisible")
    // inside the grace window: nothing removed
    assert(ManifestLog.vacuum(spark, root, graceMs = 60000).isEmpty)
    // past the grace window: exactly the orphan goes
    val removed = ManifestLog.vacuum(spark, root, graceMs = -1)
    assert(removed == Seq("writer1-2__deadbeef"), s"removed: $removed")
    assert(ManifestLog.read(spark, root, schema).count() == 20,
      "vacuum must never touch committed data")
  }

  test("streaming sink: exactly-once landing per stream, two concurrent streams share one log") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mlog-ckpt").toString
    val memA = MemoryStream[(Long, String)]
    val memB = MemoryStream[(Long, String)]
    memA.addData((1L, "a one"), (2L, "a two"))
    memB.addData((100L, "b one"))
    val qa = ManifestLog.sink(memA.toDF.toDF("doc_id", "text"), root, "streamA", s"$ckpt/a")
    val qb = ManifestLog.sink(memB.toDF.toDF("doc_id", "text"), root, "streamB", s"$ckpt/b")
    qa.awaitTermination(); qb.awaitTermination()
    // second micro-batch on stream A; stream B idle
    memA.addData((3L, "a three"))
    ManifestLog.sink(memA.toDF.toDF("doc_id", "text"), root, "streamA", s"$ckpt/a")
      .awaitTermination()
    val got = ManifestLog.read(spark, root, schema)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 100L), s"got $got")
    // a replayed batch (same writer, same batchId, fresh checkpoint
    // simulating a recovery replay) lands nothing new
    ManifestLog.append(Seq((1L, "a one"), (2L, "a two")).toDF("doc_id", "text"),
      root, "streamA", 0L)
    assert(ManifestLog.read(spark, root, schema).count() == 4, "replay duplicated rows")
  }

  test("empty log reads as an empty relation with the declared schema") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-empty").toString
    val df = ManifestLog.read(spark, root, schema)
    assert(df.count() == 0 && df.schema == schema)
  }

  // --- compaction (r14: the landing-layout lever as a protocol feature) --

  test("compact: read identical, one segment, fewer zstd files; late append survives") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-cpt").toString
    (1 to 6).foreach(b => ManifestLog.append(batchDf(1, b), root, "w1", b.toLong))
    val before = ManifestLog.read(spark, root, schema)
      .select("doc_id").as[Long].collect().sorted
    val name = ManifestLog.compact(spark, root, schema, targetPartitions = 2)
    assert(name.exists(_.startsWith("compacted-0__")), s"$name")
    assert(ManifestLog.segments(spark, root) == Seq(name.get),
      "only the compacted segment is visible")
    val after = ManifestLog.read(spark, root, schema)
      .select("doc_id").as[Long].collect().sorted
    assert(after.sameElements(before), "compaction must not lose or duplicate rows")
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = f.listStatus(new org.apache.hadoop.fs.Path(s"$root/data/${name.get}"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(files.length == 2 && files.forall(_.contains("zstd")), files.toSeq)
    // an append AFTER compaction is simply a new segment beside it
    ManifestLog.append(batchDf(1, 7), root, "w1", 7L)
    assert(ManifestLog.read(spark, root, schema).count() == before.length + 20)
    // ...and a second compaction (chained: supersedes compacted-0 + the
    // new batch) still reads exact
    val name2 = ManifestLog.compact(spark, root, schema, targetPartitions = 1)
    assert(name2.exists(_.startsWith("compacted-1__")))
    assert(ManifestLog.segments(spark, root) == Seq(name2.get))
    assert(ManifestLog.read(spark, root, schema).count() == before.length + 20)
  }

  test("compact: single-segment log is a no-op; reserved writerId refused") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-cpt1").toString
    ManifestLog.append(batchDf(1, 1), root, "w1", 1L)
    assert(ManifestLog.compact(spark, root, schema).isEmpty)
    val e = intercept[IllegalArgumentException] {
      ManifestLog.append(batchDf(1, 2), root, "compacted", 2L)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("late replay of a superseded batch cannot resurface (segId-level supersede)") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-cptlate").toString
    (1 to 3).foreach(b => ManifestLog.append(batchDf(1, b), root, "w1", b.toLong))
    ManifestLog.compact(spark, root, schema, targetPartitions = 1)
    // retire the originals (grace off), THEN the ack-lost replay lands:
    // with the original's marker gone the replay COMMITS a fresh attempt,
    // and only the supersede-by-segId rule keeps its content hidden
    val retired = ManifestLog.retireSuperseded(spark, root, graceMs = -1L)
    assert(retired.size == 3, s"$retired")
    ManifestLog.append(batchDf(1, 2), root, "w1", 2L)
    assert(ManifestLog.read(spark, root, schema).count() == 60,
      "late replay of a superseded segId must not duplicate")
    assert(ManifestLog.segments(spark, root).size == 1)
  }

  test("crashed compaction (sidecar, no marker) hides nothing and vacuums clean") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-cptcrash").toString
    (1 to 2).foreach(b => ManifestLog.append(batchDf(1, b), root, "w1", b.toLong))
    // simulate the crash window: sidecar + data dir, no commit marker
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ghost = "compacted-0__deadbeef"
    batchDf(9, 9).write.parquet(s"$root/data/$ghost")
    val out = f.create(new org.apache.hadoop.fs.Path(
      s"$root/manifests/$ghost.supersedes"), true)
    out.write("w1-1\nw1-2".getBytes("UTF-8")); out.close()
    // readers: the uncommitted sidecar must hide nothing
    assert(ManifestLog.segments(spark, root).size == 2)
    assert(ManifestLog.read(spark, root, schema).count() == 40)
    // vacuum reclaims both the ghost data and the orphan sidecar
    val removed = ManifestLog.vacuum(spark, root, graceMs = -1L)
    assert(removed.contains(ghost) && removed.contains(s"$ghost.supersedes"),
      s"$removed")
    assert(ManifestLog.read(spark, root, schema).count() == 40)
  }

  test("retireSuperseded is grace-guarded and idempotent") {
    val root = java.nio.file.Files.createTempDirectory("graft-mlog-cptret").toString
    (1 to 3).foreach(b => ManifestLog.append(batchDf(1, b), root, "w1", b.toLong))
    ManifestLog.compact(spark, root, schema)
    assert(ManifestLog.retireSuperseded(spark, root, graceMs = 60000L).isEmpty,
      "nothing young retires")
    assert(ManifestLog.retireSuperseded(spark, root, graceMs = -1L).size == 3)
    assert(ManifestLog.retireSuperseded(spark, root, graceMs = -1L).isEmpty)
    assert(ManifestLog.read(spark, root, schema).count() == 60)
  }
}
