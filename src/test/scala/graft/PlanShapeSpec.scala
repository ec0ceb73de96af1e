package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-3 operators — the
  * properties that make them survive a 100× scale-up, pinned so a
  * refactor can't silently reintroduce the pathologies they fix. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_pii_redact is a single narrow scan: no hash-partition shuffle anywhere") {
    val p = plan("q_pii_redact")
    assert(p.split("FileScan").length - 1 == 1, "exactly one scan (customer)")
    // the only Exchange allowed is the final presentation sort
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("q_pack_sequences: the only single-partition exchange is the tiny offsets relation") {
    val p = plan("q_pack_sequences")
    // one global window over ≤ numPartitions rows of per-partition totals;
    // the corpus-sized relation must never pass through SinglePartition
    assert(p.split("Exchange SinglePartition").length - 1 == 1, s"plan:\n$p")
  }

  test("inverted-index family reads the corpus zero times post-checkpoint") {
    // the fingerprint/shingle kernel runs ONCE into a localCheckpoint
    // before the plan executes; the executed plan re-reading
    // documents.parquet would mean the 6×-rescan disease is back
    for (q <- Seq("q_jaccard_pairs", "q_winnow_overlap", "q_passages")) {
      val p = plan(q)
      assert(!p.contains("documents.parquet"), s"$q re-scans the corpus:\n${p.take(2000)}")
    }
  }

  test("q_curation_pipeline is one scan of the corpus end-to-end") {
    val p = plan("q_curation_pipeline")
    assert(p.split("documents.parquet").length - 1 == 1,
      "dedup -> quality -> langid -> sample must fuse over ONE corpus scan")
  }
}
