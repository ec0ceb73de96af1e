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

  def statsHonestLocalCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    val classic = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, ck.schema)
  }
}
