package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming EMBEDDING-ingestion gate — the ANN analog of
  * [[IngestGate.startIndexed]]: every micro-batch of arriving vectors is
  * probed against a persistent [[IvfIndex]]; arrivals whose best stored
  * neighbor reaches the cosine threshold are dropped, admitted vectors are
  * `assignInto`'d the same batch — so the INDEX is the cross-batch ledger
  * (a vector admitted in batch N is a first-class dedup target for batch
  * N+1), with per-batch cost O(batch + probed buckets), independent of
  * corpus size.
  *
  * Semantics notes, mirroring the document gate's documented trades:
  *  - Near-dup pairs that co-arrive in ONE batch are both admitted (the
  *    batch is probed against the index as-of batch start); the periodic
  *    sweep is [[graft.operators.Similarity.annPairs]] over the corpus.
  *  - The gate's recall IS the ANN recall at the configured nprobe: an
  *    arrival whose true near-neighbor lives in an unprobed cell is
  *    admitted. That is the standard ANN-dedup trade — raise nprobe to
  *    buy recall; the exact alternative re-scores the corpus per batch,
  *    which is precisely what this gate exists to avoid.
  *  - Replay convergence: foreachBatch is at-least-once; a replayed batch
  *    probes WITH self-matches kept (`excludeSelf = false`), so its own
  *    already-stored copies answer at cos 1 and every replayed arrival is
  *    dropped — index content converges to exactly-once (receipts may
  *    carry the extra attempt, labeled with its batch id).
  */
object VectorIngestGate {

  /** Gate one batch (vec_id, embedding) against the index; returns
    * (receipts, kept). Receipts: one row per arrival —
    * (vec_id, dup_of, cos, is_dup). Exposed for direct batch use and
    * for the spec. */
  def gateBatch(tag: String, batch: DataFrame, threshold: Double,
                nprobe: Int): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val arrivals = batch.select(col("vec_id"), col("embedding"))
    val best = IvfIndex.search(spark, tag, arrivals, nprobe = nprobe, k = 1,
        excludeSelf = false)
      .select(col("query_id").as("vec_id"), col("neighbor_id").as("dup_of"),
        col("cos"))
    val receipts = arrivals.select("vec_id")
      .join(best, Seq("vec_id"), "left")
      .withColumn("is_dup", coalesce(col("cos") >= threshold, lit(false)))
    val kept = arrivals
      .join(receipts.filter(!col("is_dup")).select("vec_id"), "vec_id")
    (receipts, kept)
  }

  /** Start the gate. `stream` must carry (vec_id: long, embedding:
    * array<float>); the index under `indexTag`/`indexPath` must already
    * be built ([[IvfIndex.build]] — paid once). Admitted vectors are
    * appended to the index AND to `landingDir`; verdicts append to
    * `receiptsDir` with the micro-batch id. */
  def start(indexTag: String, indexPath: String, stream: DataFrame,
            landingDir: String, receiptsDir: String, checkpointDir: String,
            threshold: Double = 0.92, nprobe: Int = 4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val (receipts, kept) = gateBatch(indexTag, batch, threshold, nprobe)
          // one gate evaluation feeds receipts, landing AND the index
          // append — persist so the probe join runs once
          kept.persist(); receipts.persist()
          try {
            receipts.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(receiptsDir)
            kept.write.mode("append").parquet(landingDir)
            IvfIndex.assignInto(batch.sparkSession, indexTag, indexPath, kept)
          } finally { kept.unpersist(); receipts.unpersist() }
        }
      }
      .start()
}
