package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-ingestion gate — the daily-crawl pipeline as a
  * structured stream: every micro-batch of arriving documents is gated
  * against the corpus with [[Dedup.incrementalDedupOn]] (canonical
  * exact-duplicate check + best near-dup Jaccard match), admitted
  * documents land in an append-only parquet zone, and every document —
  * admitted or dropped — gets a verdict receipt.
  *
  * The corpus a batch is gated against is the STATIC corpus UNION the
  * landing zone so far, re-read each micro-batch: a document admitted in
  * batch N is a first-class dedup target for batch N+1, so replays
  * across batches are dropped without any unbounded driver-side state —
  * the landing zone itself is the ledger. Within one micro-batch the
  * gate also collapses exact duplicates (canonical fingerprint, lowest
  * doc_id wins); NEAR-dup pairs that co-arrive in a single batch are
  * both admitted by design — run [[graft.operators.Dedup.jaccardPairs]]
  * over the landing zone for the periodic sweep, exactly as a batch
  * pipeline would.
  *
  * Delivery semantics: foreachBatch is at-least-once into the landing
  * zone on crash between the write and the checkpoint commit; a replayed
  * batch re-gates against the landing zone that already contains its own
  * docs, so replayed documents are dropped as exact dups of themselves —
  * the landing zone converges to exactly-once content (the receipts may
  * carry the extra attempt, honestly labeled with its batch id).
  *
  * Scale: the gate inherits the incremental-dedup plan — fused corpus
  * index, equi-join probe, stats-honest checkpoints, no static
  * broadcasts; the landing-zone re-read is a parquet scan that prunes to
  * the columns the gate needs. */
object IngestGate {

  /** Canonical content fingerprint (same normalization as [[Dedup.exact]]). */
  private def fp = Dedup.canonicalFp(coalesce(col("text"), lit("")))

  /** Gate one arriving batch against `corpus`; returns (receipts, kept).
    * Receipts carry one row per ARRIVING doc: corpus verdicts for the
    * within-batch representatives, plus (exact_dup=true, dup_of=the
    * batch representative) rows for within-batch copies. Exposed for
    * direct batch use and for the spec. */
  /** Within-batch exact collapse: lowest doc_id per canonical fingerprint
    * represents the content; later copies get a receipt pointing at their
    * in-batch representative. Returns (unique, inBatchDup receipts). */
  private def collapseBatch(batch: DataFrame): (DataFrame, DataFrame) = {
    // a wider batch schema carrying these names would be silently
    // captured by the join below — fail loudly (saltedJoin precedent)
    require(!batch.columns.contains("__fp") && !batch.columns.contains("keep_id"),
      "the gate reserves the column names __fp and keep_id; rename them on the input first")
    val ranked = batch.select(col("doc_id"), col("text"), fp.as("__fp"))
    val firstPerFp = ranked.groupBy("__fp").agg(min(col("doc_id")).as("keep_id"))
    val tagged = ranked.join(firstPerFp, "__fp")
    val unique = tagged.filter(col("doc_id") === col("keep_id"))
      .select("doc_id", "text")
    val inBatchDups = tagged.filter(col("doc_id") =!= col("keep_id"))
      .select(col("doc_id"), lit(true).as("exact_dup"),
        col("keep_id").as("dup_of"), lit(null).cast("long").as("shared"),
        lit(null).cast("double").as("jaccard"), lit(true).as("is_dup"))
    (unique, inBatchDups)
  }

  private def assemble(batch: DataFrame, verdicts: DataFrame,
                       inBatchDups: DataFrame): (DataFrame, DataFrame) = {
    val receipts = verdicts.unionByName(inBatchDups)
    // kept derives from `receipts` (not the verdicts subtree) so a caller
    // persisting receipts pays for the gate exactly once across both uses
    val kept = batch.select("doc_id", "text")
      .join(receipts.filter(!col("is_dup")).select("doc_id"), "doc_id")
    (receipts, kept)
  }

  def gateBatch(corpus: DataFrame, batch: DataFrame,
                threshold: Double): (DataFrame, DataFrame) = {
    val (unique, inBatchDups) = collapseBatch(batch)
    val verdicts = Dedup.incrementalDedupOn(corpus, unique, threshold)
    assemble(batch, verdicts, inBatchDups)
  }

  /** Merge two one-row-per-doc verdict relations (same schema as
    * [[Dedup.incrementalDedupOn]]'s output) into one: exact flags OR
    * together; the best near-dup match is the higher Jaccard, ties to the
    * lower dup_of — the same (j desc, id asc) preference the per-relation
    * ArgMaxStruct uses, applied here to the ROUNDED j the outputs carry
    * (divergence from a single global argmax is only possible for
    * matches equal to 6 decimals across the two relations). */
  private def mergeVerdicts(a: DataFrame, b: DataFrame, threshold: Double): DataFrame = {
    val bb = b.select(col("doc_id"), col("exact_dup").as("b_exact"),
      col("dup_of").as("b_dup_of"), col("shared").as("b_shared"),
      col("jaccard").as("b_jaccard"))
    val aj = coalesce(col("jaccard"), lit(-1d))
    val bj = coalesce(col("b_jaccard"), lit(-1d))
    val bWins = bj > aj ||
      (bj === aj && coalesce(col("b_dup_of"), lit(Long.MaxValue)) <
        coalesce(col("dup_of"), lit(Long.MaxValue)))
    a.join(bb, "doc_id")
      .select(
        col("doc_id"),
        (col("exact_dup") || col("b_exact")).as("exact_dup"),
        when(bWins, col("b_dup_of")).otherwise(col("dup_of")).as("dup_of"),
        when(bWins, col("b_shared")).otherwise(col("shared")).as("shared"),
        when(bWins, col("b_jaccard")).otherwise(col("jaccard")).as("jaccard"))
      .withColumn("is_dup",
        col("exact_dup") || coalesce(col("jaccard") >= threshold, lit(false)))
  }

  /** Gate one arriving batch against a PRE-BUILT [[graft.operators.ShingleIndex]]
    * (the static corpus, indexed once) plus the live landing zone — the
    * 100 TB shape: per-batch cost is O(batch + landing + matched index
    * rows), with no per-batch re-aggregation of the corpus. Verdict
    * semantics match [[gateBatch]] over corpus ∪ landing, except the df
    * cap applies per relation rather than over the union (the operator
    * family's documented asymmetric-cap convention; identical while the
    * cap is inert) and cross-relation best-match ties break on the
    * rounded j (see [[mergeVerdicts]]). */
  def gateBatchIndexed(indexTag: String, landing: Option[DataFrame],
                       batch: DataFrame, threshold: Double): (DataFrame, DataFrame) = {
    val spark = batch.sparkSession
    val (unique, inBatchDups) = collapseBatch(batch)
    val corpusVerdicts = graft.operators.ShingleIndex.probe(spark, indexTag, unique, threshold)
    val verdicts = landing match {
      case None => corpusVerdicts
      case Some(l) =>
        mergeVerdicts(corpusVerdicts,
          Dedup.incrementalDedupOn(l, unique, threshold), threshold)
    }
    assemble(batch, verdicts, inBatchDups)
  }

  /** Start the streaming gate against a pre-built [[graft.operators.ShingleIndex]]
    * instead of a corpus directory. Replay convergence is unchanged (the
    * landing zone is still the ledger, re-read per batch); the INDEX is
    * never mutated by the stream — fold the landing zone into it with
    * `ShingleIndex.append`/`rebuild` during quiescence (between
    * AvailableNow drains, after checkpoint commit), then truncating the
    * landing zone is safe because no uncommitted batch can replay. */
  def startIndexed(indexTag: String, stream: DataFrame, landingDir: String,
                   receiptsDir: String, checkpointDir: String,
                   threshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val landingPath = new org.apache.hadoop.fs.Path(landingDir)
          val fs = landingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val landed =
            if (fs.exists(landingPath))
              Some(spark.read.parquet(landingDir).select("doc_id", "text"))
            else None
          val (receipts, kept) =
            gateBatchIndexed(indexTag, landed, batch.select("doc_id", "text"), threshold)
          receipts.persist()
          try {
            receipts.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(receiptsDir)
            kept.write.mode("append").parquet(landingDir)
          } finally receipts.unpersist()
        }
      }
      .start()

  /** Start the streaming gate. `stream` must carry (doc_id: long,
    * text: string). Admitted docs append to `landingDir`; per-doc
    * verdicts append to `receiptsDir` with the micro-batch id. */
  def start(corpusDir: String, stream: DataFrame, landingDir: String,
            receiptsDir: String, checkpointDir: String,
            threshold: Double = 0.5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val corpusStatic = spark.read.parquet(s"$corpusDir/documents.parquet")
            .select("doc_id", "text")
          // Hadoop FS, not java.io.File: the landing zone IS the ledger,
          // and a local-only existence check on S3/HDFS would silently
          // disable cross-batch dedup
          val landingPath = new org.apache.hadoop.fs.Path(landingDir)
          val fs = landingPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val landed =
            if (fs.exists(landingPath))
              Seq(spark.read.parquet(landingDir).select("doc_id", "text"))
            else Nil
          val corpus = (corpusStatic +: landed).reduce(_ unionAll _)
          val (receipts, kept) = gateBatch(corpus, batch.select("doc_id", "text"), threshold)
          // the gate (corpus index + probe) is computed once: receipts are
          // pinned before both writes, released after (Serving's pattern)
          receipts.persist()
          try {
            receipts.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(receiptsDir)
            kept.write.mode("append").parquet(landingDir)
          } finally receipts.unpersist()
        }
      }
      .start()
}
