package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input spreading (r14 optimization round).
  *
  * The guide §2.5 "unsplittable input" case, measured here: every
  * /root/testdata sf parquet table is ONE file with ONE row group, so a
  * scan yields ONE input split and every narrow stage above it (UDF
  * kernels, typed maps, explodes) runs single-threaded no matter how many
  * cores the session has — at local[32] that is a 32× parallelism loss on
  * exactly the CPU-bound stages. At deployment scale a 100 TB table scans
  * as thousands of splits and needs no help.
  *
  * [[spread]] is therefore CONDITIONAL: it repartitions to the session's
  * default parallelism only when the source currently plans to fewer
  * partitions than that — a no-op wherever the scan already parallelizes,
  * one cheap round-robin exchange of the (projected, narrow) input rows
  * otherwise. Round-robin repartition sorts its input partition-locally
  * first (spark.sql.execution.sortBeforeRepartition, default on), so the
  * row→partition assignment is deterministic and retry-safe.
  *
  * CALLER CONTRACT (why this is not applied blanket): downstream of a
  * spread the per-reduce-key partial-aggregation MERGE ORDER changes, so
  * only paths whose aggregates are exact (longs, min/max, counts,
  * strings) or per-row (no aggregation) may use it. Floating-point SUM/AVG
  * chains keep their single-split input order untouched — the repo's
  * cross-engine determinism discipline depends on it.
  */
object Partitioning {
  def spread(df: DataFrame): DataFrame = {
    // a streaming frame cannot be planned eagerly (and its micro-batches
    // are already split by the source) — pass it through untouched
    if (df.isStreaming) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Read the partition count from queryExecution.toRdd (ADVICE r14):
    // `.rdd` additionally builds a row-DESERIALIZING lineage on top of the
    // physical plan just to read a count; toRdd is the already-planned
    // internal-row RDD. Both are the PRE-execution shape — AQE can still
    // coalesce at runtime, so the probe is a static-planning heuristic
    // (exactly what a conditional exchange has to be: the decision must
    // precede execution).
    val planned = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.toRdd.getNumPartitions
    if (planned >= target) df
    else df.repartition(target)
  }
}
