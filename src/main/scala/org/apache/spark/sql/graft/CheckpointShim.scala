package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Lives under `org.apache.spark.sql` for `private[sql]` access — the one
  * sanctioned way to reach `internalCreateDataFrame` without copying rows
  * through the public Row-based API.
  *
  * Why this exists: `Dataset.localCheckpoint()` returns a `LogicalRDD`
  * carrying `originStats` — the PRE-checkpoint Catalyst estimate. For
  * relations whose cardinality Catalyst cannot estimate (a UDF explode,
  * a typed flatMap), that estimate is garbage, and it is garbage in the
  * dangerous direction: a tiny sizeInBytes invites the static planner to
  * BROADCAST a data-sized relation. AQE only ever upgrades shuffle joins
  * to broadcast (measured-small sides); it never demotes a statically
  * planned broadcast — so a static underestimate is unrecoverable at
  * runtime and OOMs the driver at scale (measured: the inverted-index
  * pair kernel at 30× corpus scale, SCALING.md).
  *
  * [[statsHonestLocalCheckpoint]] re-wraps the checkpointed RDD in a
  * fresh `LogicalRDD` WITHOUT origin stats, so downstream planning sees
  * `spark.sql.defaultSizeInBytes` (effectively "unknown = huge"): every
  * join against it plans as a shuffle join statically, and AQE restores
  * broadcast per-join from TRUE runtime sizes. Toy corpora keep their
  * broadcasts; 100 TB corpora keep their drivers. */
object CheckpointShim {

  /** Re-wrap `df`'s physical RDD in a fresh LogicalRDD with NO origin
    * stats — downstream planning sees unknown=huge instead of whatever
    * estimate `df`'s plan carried. No action is run; for an
    * already-checkpointed `df` the wrapped RDD reads the stored blocks. */
  def honestStats(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, df.schema)
  }

  def statsHonestLocalCheckpoint(df: DataFrame): DataFrame =
    honestStats(df.localCheckpoint())
}
