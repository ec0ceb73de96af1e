package graft.operators

/** Driver-side job overlap (guide §2.6: Spark happily runs several jobs
  * at once inside one application — actions are only sequential because
  * the driver calls them sequentially). [[concurrently]] submits
  * independent thunks from futures and SETTLES every one before
  * returning (the Pq.train discipline, ADVICE r14): a failed thunk must
  * not leave sibling jobs running against state a finally-block is about
  * to free. The first failure is rethrown after all thunks finish.
  *
  * Used for independent CATALOG WRITES to DIFFERENT tables and
  * independent action chains; never for two writers of the same table
  * (that is what the [[LeaseLock]] serializes). */
object Jobs {
  def concurrently[T](thunks: Seq[() => T]): Seq[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    import scala.util.Try
    val settled = thunks.map(t => Future(t()))
      .map(f => Await.result(f.transform(Try(_)), Duration.Inf))
    settled.map(_.get)
  }
}
