package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY §2.10 forward path): per-key running
  * aggregation via `flatMapGroupsWithState` — the primitive behind
  * streaming sessionization/dedup ledgers at 100 TB (state lives in the
  * state store, partitioned by key, checkpointed per micro-batch; pair
  * with a watermark + `EventTimeTimeout` in production to bound it).
  */
object StatefulOps {

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserState(count: Long, sum: Double)
  case class UserUpdate(user_id: Long, events_so_far: Long, value_so_far: Double)

  /** Running per-user event count + value sum, carried across micro-batches
    * in the state store. Events within a batch process in (event-time,
    * value) order — the value tie-break keeps intermediate updates
    * deterministic even when timestamps collide (shuffle arrival order is
    * not stable).
    *
    * Note: the per-key batch materializes in memory before sorting — a
    * pathological hot key (bot traffic on one user_id) is bounded by the
    * micro-batch size, so cap batches via `maxFilesPerTrigger` /
    * `maxOffsetsPerTrigger` when keys can be skewed. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var c = prev.count
          var s = prev.sum
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.value)).map { e =>
            c += 1; s += e.value
            UserUpdate(user, c, s)
          }
          state.update(UserState(c, s))
          out.iterator
      }
  }

  case class SessionAcc(count: Long, sum: Double, startMs: Long, endMs: Long)
  case class SessionSummary(user_id: Long, events: Long, total_value: Double,
                            started: java.sql.Timestamp, ended: java.sql.Timestamp)

  /** Custom sessionization with EXPIRING state — the bounded-state
    * counterpart to [[runningUserTotals]] (whose ledger-style state grows
    * with the key space): a per-user session accumulates silently, and
    * when the WATERMARK passes the last event + `gap`, the state times
    * out — the closed session is emitted exactly once and the key's state
    * is REMOVED. At 100 TB/day of events the difference between
    * NoTimeout and EventTimeTimeout is whether the state store's size
    * tracks ACTIVE users or ALL users ever seen.
    *
    * The input must carry a watermark on `ts` (EventTimeTimeout requires
    * one); this is the hand-rolled flavor of what `session_window` does
    * natively — kept because custom state is the only way to attach
    * arbitrary per-session payloads (counts + sums here; a fraud score or
    * a session fingerprint in production). */
  def expiringSessions(events: Dataset[UserEvent],
                       gapMs: Long = 30L * 60 * 1000): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    def summary(user: Long, s: SessionAcc) = SessionSummary(user, s.count, s.sum,
      new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.endMs))
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove() // frees the key: state size tracks ACTIVE sessions
            Iterator.single(summary(user, s))
          } else {
            // events process in event-time order, and a gap larger than
            // `gapMs` WITHIN the accumulated run closes the session
            // inline — otherwise a backfill (months of events arriving in
            // a few micro-batches, faster than the watermark can time
            // anything out) would merge every burst into one giant
            // session. Sorting materializes the per-key batch — bounded
            // by micro-batch size, same caveat as runningUserTotals.
            var acc = state.getOption.getOrElse(SessionAcc(0L, 0.0, Long.MaxValue, Long.MinValue))
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionSummary]
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (acc.count > 0 && t > acc.endMs + gapMs) {
                closed += summary(user, acc)
                acc = SessionAcc(0L, 0.0, Long.MaxValue, Long.MinValue)
              }
              acc = SessionAcc(acc.count + 1, acc.sum + e.value,
                math.min(acc.startMs, t), math.max(acc.endMs, t))
            }
            state.update(acc)
            // the still-open tail closes when the watermark passes its
            // last event + gap
            state.setTimeoutTimestamp(acc.endMs + gapMs)
            closed.iterator
          }
      }
  }

  // ---- streaming dedup ledger (EP2 audit-hash dedup, SURVEY §4) -------

  case class LedgerDoc(doc_id: Long, fingerprint: String, text: String)
  case class LedgerState(first_doc_id: Long, dupes_dropped: Long)

  /** Streaming anti-join against an already-seen fingerprint ledger: the
    * first document carrying a fingerprint passes, every replay — within
    * the same micro-batch or any later one — is dropped. The state store IS
    * the ledger (keyed by fingerprint, partitioned with the stream,
    * checkpointed per micro-batch), so the exactly-once-per-content
    * contract survives restarts from the checkpoint.
    *
    * Within-batch replays resolve deterministically: the minimum doc_id
    * wins regardless of shuffle arrival order.
    *
    * Scale notes: a dedup ledger is deliberately unbounded state —
    * fingerprints must be remembered forever, so unlike sessionization
    * there is no timeout to set. At 100 TB fingerprint cardinality the
    * per-key footprint (16-byte key hash + 16-byte state) is what matters:
    * use the RocksDB state store provider and scale
    * `spark.sql.shuffle.partitions` with the key count. For bounded-recall
    * requirements (dedup within N days), switch to `EventTimeTimeout` +
    * watermark and let expired fingerprints re-admit. */
  def dedupLedger(docs: Dataset[LedgerDoc]): Dataset[LedgerDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[LedgerDoc], state: GroupState[LedgerState]) =>
          // one-pass fold — never buffer the group: a heavily-replayed
          // fingerprint (the hot-replay case the ledger exists for) would
          // otherwise hold every copy's full text in memory at once
          state.getOption match {
            case Some(prev) => // replayed fingerprint: drop all, count them
              state.update(prev.copy(dupes_dropped = prev.dupes_dropped + it.size))
              Iterator.empty
            case None =>
              var keep: LedgerDoc = null
              var n = 0L
              it.foreach { d =>
                n += 1
                if (keep == null || d.doc_id < keep.doc_id) keep = d
              }
              state.update(LedgerState(keep.doc_id, n - 1L))
              Iterator.single(keep)
          }
      }
  }

  // ---- typed Aggregator (UDAF surface, SURVEY §2.12) ------------------

  case class TrustSummary(n: Long, mean: Double, buckets: Seq[Long])
  case class TrustBuf(n: Long, sum: Double, buckets: Array[Long])

  /** Corpus-level trust-score distribution: count, mean, and a 4-bucket
    * histogram ([0,.25),[.25,.5),[.5,.75),[.75,1]) — a typed
    * `Aggregator[IN, BUF, OUT]` usable in both batch `agg()` and streaming
    * aggregations. The buffer is a case class with a product encoder, so
    * partials shuffle as a plain struct (no kryo dependency). */
  object TrustStatsAggregator extends Aggregator[Double, TrustBuf, TrustSummary] {
    override def zero: TrustBuf = TrustBuf(0L, 0.0, Array.fill(4)(0L))
    override def reduce(b: TrustBuf, score: Double): TrustBuf = {
      val idx = math.min(3, math.max(0, (score * 4).toInt))
      b.buckets(idx) += 1
      TrustBuf(b.n + 1, b.sum + score, b.buckets)
    }
    override def merge(a: TrustBuf, b: TrustBuf): TrustBuf =
      TrustBuf(a.n + b.n, a.sum + b.sum,
        a.buckets.zip(b.buckets).map { case (x, y) => x + y })
    override def finish(r: TrustBuf): TrustSummary =
      TrustSummary(r.n, if (r.n == 0) 0.0 else r.sum / r.n, r.buckets.toSeq)
    override def bufferEncoder = Encoders.product[TrustBuf]
    override def outputEncoder = Encoders.product[TrustSummary]
  }
}
