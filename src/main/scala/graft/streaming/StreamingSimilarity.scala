package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{broadcast, col, lit}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental top-k similarity search over a vector STREAM — the
  * continuously-ingested-corpus shape (cf. "Incremental Based Framework
  * for Efficient Top-K Similarity Search in Interactive Data Analysis
  * Sessions", EDBT 2020; "Continuously Adaptive Similarity Search",
  * SIGMOD 2020): a fixed panel of query vectors is registered up front,
  * new corpus vectors arrive in micro-batches, and each query's top-k
  * neighbor set updates incrementally — per-query state holds ONLY the
  * current k best (k rows per query, regardless of how much corpus has
  * streamed past), and a result row is emitted per batch for each entry
  * that is IN the new top-k but was not in (or improved over) the old.
  *
  * Scale shape: candidates are pruned MAP-SIDE to each partition's
  * per-query top-k before they shuffle (only a partition-local top-k
  * member can possibly enter the global one), so the shuffle carries
  * ≤ partitions × queries × k rows per micro-batch — never one row per
  * (vector, query) — and the state fold never buffers a batch: each
  * candidate merges into a ≤ k buffer in O(k). State is O(queries × k).
  * The batch counterpart is [[graft.operators.Similarity.topK]].
  *
  * Robustness (totality policy — malformed input degrades, never kills
  * the stream): vectors whose dimension differs from a query's, and
  * vectors producing a non-finite cosine (NaN/zero norms), are skipped
  * for that query.
  */
object StreamingSimilarity {

  case class VecRow(vec_id: Long, embedding: Array[Float])
  case class Candidate(query_id: Long, vec_id: Long, cos: Double)
  case class Entered(query_id: Long, vec_id: Long, cos: Double)

  /** Merge one candidate into a ≤ k best-first buffer: dedups by vec_id
    * (a re-ingested vector REPLACES its old entry rather than occupying
    * two slots), keeps (−cos, vec_id) order, O(k). */
  private def merge(top: Seq[Candidate], c: Candidate, k: Int): Seq[Candidate] = {
    val existing = top.find(_.vec_id == c.vec_id)
    if (existing.exists(_.cos >= c.cos)) top
    else {
      val without = existing.fold(top)(_ => top.filterNot(_.vec_id == c.vec_id))
      val last = without.lastOption
      val enters = without.size < k || last.exists(l =>
        c.cos > l.cos || (c.cos == l.cos && c.vec_id < l.vec_id))
      if (!enters) top
      else (without :+ c).sortBy(x => (-x.cos, x.vec_id)).take(k)
    }
  }

  /** Stream of corpus vectors → rows that entered some query's top-k this
    * batch (new vec_id, or an improved cosine for a re-ingested one). */
  def incrementalTopK(vectors: Dataset[VecRow],
                      queries: Seq[(Long, Array[Float])],
                      k: Int = 5): Dataset[Entered] = {
    require(k > 0, s"incrementalTopK needs k > 0, got $k")
    import vectors.sparkSession.implicits._
    val panel = queries.map { case (qid, v) => (qid, v, Similarity.normP(v)) }
    // map-side prune: per partition, per query, keep only the k best
    val candidates = vectors.mapPartitions { rows =>
      val best = scala.collection.mutable.HashMap.empty[Long, Seq[Candidate]]
      rows.foreach { row =>
        val nv = Similarity.normP(row.embedding)
        panel.foreach { case (qid, qv, nq) =>
          if (row.embedding.length == qv.length) {
            val cos = Similarity.dotP(qv, row.embedding) / (nq * nv)
            if (java.lang.Double.isFinite(cos)) {
              val c = Candidate(qid, row.vec_id, cos)
              best.update(qid, merge(best.getOrElse(qid, Seq.empty), c, k))
            }
          }
        }
      }
      best.valuesIterator.flatten
    }
    foldTopK(candidates, k)
  }

  /** The per-query state fold shared by both panel forms: merge the
    * batch's (map-side-pruned) candidates into the ≤ k state, emit what
    * entered. */
  private def foldTopK(candidates: Dataset[Candidate], k: Int): Dataset[Entered] = {
    import candidates.sparkSession.implicits._
    candidates
      .groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[Candidate], state: GroupState[Seq[Candidate]]) =>
          val prior = state.getOption.getOrElse(Seq.empty)
          var top = prior
          it.foreach(c => top = merge(top, c, k)) // O(k) per candidate, no buffering
          state.update(top)
          // deterministic emissions: members of the new top-k that were
          // not in the old one (or re-entered with a better cosine) —
          // independent of arrival order within the batch
          val priorCos = prior.map(x => x.vec_id -> x.cos).toMap
          top.iterator
            .filter(x => !priorCos.get(x.vec_id).contains(x.cos))
            .map(x => Entered(x.query_id, x.vec_id, x.cos))
      }
  }

  /** [[incrementalTopK]] with the query panel as a DATAFRAME — the
    * stream-static form: the panel relation re-evaluates every
    * micro-batch, so a query registered in the backing store (a JDBC
    * registry table, a catalog table) joins the stream WITHOUT restarting
    * it. Dynamism is bounded by the static source's re-evaluation
    * semantics: a JDBC/catalog relation re-queries per trigger; a plain
    * parquet path pins its file listing at DataFrame creation and will
    * NOT see files appended later.
    *
    * Panel schema: (query_id: long, embedding: array<float>). A query
    * registered mid-stream ranks only vectors ingested AFTER registration
    * — its state starts empty, there is no retroactive backfill (the
    * batch counterpart [[graft.operators.Similarity.topK]] covers the
    * history).
    *
    * Scale shape: the panel BROADCAST-joins each micro-batch (static side
    * is tiny by nature — it is a query registry), the cosine evaluates in
    * the same primitive kernel, and the same map-side per-partition top-k
    * prune bounds the shuffle at partitions × |panel| × k rows before the
    * unchanged state fold. */
  def incrementalTopKDynamic(vectors: Dataset[VecRow], panel: DataFrame,
                             k: Int = 5): Dataset[Entered] = {
    require(k > 0, s"incrementalTopKDynamic needs k > 0, got $k")
    import vectors.sparkSession.implicits._
    // constant-key equi-join instead of a bare cross join: same cartesian
    // semantics (the panel is tiny), but it stays on the supported
    // stream-static broadcast-hash-join path
    val joined = vectors.toDF().withColumn("__one", lit(1))
      .join(broadcast(panel
        .select(col("query_id").cast("long").as("query_id"),
          col("embedding").as("q_embedding"))
        .withColumn("__one", lit(1))), "__one")
      .select(col("query_id"), col("q_embedding"), col("vec_id"), col("embedding"))
      .as[(Long, Array[Float], Long, Array[Float])]
    val candidates = joined.mapPartitions { rows =>
      val best = scala.collection.mutable.HashMap.empty[Long, Seq[Candidate]]
      rows.foreach { case (qid, qv, vid, v) =>
        if (v != null && qv != null && v.length == qv.length) {
          val cos = Similarity.dotP(qv, v) / (Similarity.normP(qv) * Similarity.normP(v))
          if (java.lang.Double.isFinite(cos)) {
            val c = Candidate(qid, vid, cos)
            best.update(qid, merge(best.getOrElse(qid, Seq.empty), c, k))
          }
        }
      }
      best.valuesIterator.flatten
    }
    foldTopK(candidates, k)
  }
}
