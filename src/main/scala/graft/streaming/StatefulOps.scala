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
    * in the state store. Events within a batch process in event-time order
    * so the running numbers are deterministic. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var c = prev.count
          var s = prev.sum
          val out = it.toSeq.sortBy(_.ts.getTime).map { e =>
            c += 1; s += e.value
            UserUpdate(user, c, s)
          }
          state.update(UserState(c, s))
          out.iterator
      }
  }

  // ---- typed Aggregator (UDAF surface, SURVEY §2.12) ------------------

  case class TrustSummary(n: Long, mean: Double, buckets: Seq[Long])

  /** Corpus-level trust-score distribution: count, mean, and a 4-bucket
    * histogram ([0,.25),[.25,.5),[.5,.75),[.75,1]) — a typed
    * `Aggregator[IN, BUF, OUT]` usable in both batch `agg()` and streaming
    * aggregations. Buffer is a flat tuple → partial-agg/merge friendly. */
  object TrustStatsAggregator extends Aggregator[Double, (Long, Double, Array[Long]), TrustSummary] {
    override def zero: (Long, Double, Array[Long]) = (0L, 0.0, Array.fill(4)(0L))
    override def reduce(b: (Long, Double, Array[Long]), score: Double): (Long, Double, Array[Long]) = {
      val idx = math.min(3, math.max(0, (score * 4).toInt))
      b._3(idx) += 1
      (b._1 + 1, b._2 + score, b._3)
    }
    override def merge(a: (Long, Double, Array[Long]), b: (Long, Double, Array[Long])): (Long, Double, Array[Long]) =
      (a._1 + b._1, a._2 + b._2, a._3.zip(b._3).map { case (x, y) => x + y })
    override def finish(r: (Long, Double, Array[Long])): TrustSummary =
      TrustSummary(r._1, if (r._1 == 0) 0.0 else r._2 / r._1, r._3.toSeq)
    override def bufferEncoder = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.kryo[Array[Long]])
    override def outputEncoder = Encoders.product[TrustSummary]
  }
}
