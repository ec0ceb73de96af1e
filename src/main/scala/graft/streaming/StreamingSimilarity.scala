package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental top-k similarity search over a vector STREAM — the
  * continuously-ingested-corpus shape (cf. "Incremental Based Framework
  * for Efficient Top-K Similarity Search in Interactive Data Analysis
  * Sessions", EDBT 2020; "Continuously Adaptive Similarity Search",
  * SIGMOD 2020): a fixed panel of query vectors is registered up front,
  * new corpus vectors arrive in micro-batches, and each query's top-k
  * neighbor set updates incrementally — per-query state holds ONLY the
  * current k best (k rows per query, regardless of how much corpus has
  * streamed past), and a result row is emitted exactly when a new vector
  * ENTERS some query's top-k.
  *
  * Scale shape: each incoming vector scores against the query panel in a
  * narrow map (the panel is small by construction — it rides into the
  * closure as a broadcastable array); the shuffle carries only
  * (query_id, vec_id, cos) candidate rows, never embeddings; state is
  * O(queries × k). The batch counterpart is [[graft.operators.Similarity.topK]].
  */
object StreamingSimilarity {

  case class VecRow(vec_id: Long, embedding: Array[Float])
  case class Candidate(query_id: Long, vec_id: Long, cos: Double)
  case class Entered(query_id: Long, vec_id: Long, cos: Double)

  /** Stream of corpus vectors → rows that enter some query's top-k.
    * Ties break on vec_id (smaller wins) — deterministic under any
    * arrival order within a batch; across batches, arrival order decides
    * what was "current" when a vector arrived, which is inherent to
    * incremental semantics. */
  def incrementalTopK(vectors: Dataset[VecRow],
                      queries: Seq[(Long, Array[Float])],
                      k: Int = 5): Dataset[Entered] = {
    import vectors.sparkSession.implicits._
    val panel = queries.map { case (qid, v) => (qid, v, Similarity.normP(v)) }
    val candidates = vectors.flatMap { row =>
      val nv = Similarity.normP(row.embedding)
      panel.iterator.flatMap { case (qid, qv, nq) =>
        val denom = nq * nv
        if (denom == 0d) None
        else Some(Candidate(qid, row.vec_id, Similarity.dotP(qv, row.embedding) / denom))
      }
    }
    candidates
      .groupByKey(_.query_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (qid: Long, it: Iterator[Candidate], state: GroupState[Seq[Candidate]]) =>
          // fold the batch into the current top-k; emit what ENTERED.
          // Sorting the incoming batch keeps within-batch arrival order
          // irrelevant; the state never exceeds k entries.
          var top = state.getOption.getOrElse(Seq.empty)
          val entered = scala.collection.mutable.ArrayBuffer.empty[Entered]
          it.toSeq.sortBy(c => (-c.cos, c.vec_id)).foreach { c =>
            val enters = top.size < k ||
              c.cos > top.last.cos ||
              (c.cos == top.last.cos && c.vec_id < top.last.vec_id)
            if (enters) {
              top = (top :+ c).sortBy(x => (-x.cos, x.vec_id)).take(k)
              entered += Entered(qid, c.vec_id, c.cos)
            }
          }
          state.update(top)
          entered.iterator
      }
  }
}
