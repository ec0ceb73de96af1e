package graft.operators

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Shared compaction for append-accreted BUCKETED catalog tables — the
  * staged-swap rewrite used by [[ShingleIndex.compact]] and
  * [[IvfIndex.compact]]. Every bucketed append adds one file per bucket;
  * after N appends a probe/search opens O(N·buckets) files. The rewrite:
  * pinned bucketed scan (one partition per bucket — see the inline note),
  * write one file per bucket to a fresh generation directory, swap the
  * catalog entry, delete the old files. Data and bucket layout are
  * unchanged. Not concurrency-safe with a writer (single-maintainer
  * contract, same as [[Layout.compact]]). */
object BucketedMaintenance {

  /** Rewrite each (table, bucketColumn) once. `path` hosts the fresh
    * generation directories. */
  def compact(spark: SparkSession, tables: Seq[(String, String)], path: String): Unit =
    tables.foreach { case (t, bucketCol) =>
      // REFRESH before reading: appends may have come from another session
      // (streaming foreachBatch runs in a cloned session) and this
      // session's cached file listing would not include them — a compact
      // over a stale listing would rewrite the stale subset and then
      // delete the directory holding the unseen files. Found live by
      // StreamBench's vecgate census (index frozen while landing grew).
      spark.catalog.refreshTable(t)
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(t))
      val buckets = meta.bucketSpec.map(_.numBuckets).getOrElse(
        throw new IllegalStateException(s"$t is not bucketed — nothing to compact"))
      val oldLocation = new org.apache.hadoop.fs.Path(meta.location)
      // fresh generation dir: never rewrite in place (a failed job would
      // destroy the only copy), never reuse a dir (stale files would be
      // picked up by the new table's scan)
      val gen = Iterator.from(0).map(g => s"$path/$t-gen$g")
        .find(p => !new java.io.File(p).exists()).get
      val stage = s"${t}_stage"
      spark.sql(s"DROP TABLE IF EXISTS `$stage`")
      // ZERO-shuffle rewrite: force the bucketed scan (one partition per
      // bucket, all of that bucket's accreted files) so each write task
      // holds exactly one bucket and emits exactly one file. Without the
      // pin, the planner auto-disables the bucketed scan for a plain
      // read-write (nothing downstream demands the distribution — an
      // explicit repartition gets optimizer-removed as redundant against
      // the table's bucketing first), tasks span buckets, and the
      // "compaction" writes a file per (task × bucket) pair.
      val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val prevAuto = spark.conf.getOption(autoKey)
      spark.conf.set(autoKey, "false")
      try
        spark.table(t).write.mode(SaveMode.Overwrite).format("parquet")
          .bucketBy(buckets, bucketCol).sortBy(bucketCol)
          .option("path", gen).saveAsTable(stage)
      finally prevAuto match {
        case Some(v) => spark.conf.set(autoKey, v)
        case None    => spark.conf.unset(autoKey)
      }
      spark.sql(s"DROP TABLE `$t`")
      spark.sql(s"ALTER TABLE `$stage` RENAME TO `$t`")
      val fs = oldLocation.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(oldLocation, true)
    }

  /** Drop `table` and its backing files (wherever a prior [[compact]] left
    * them) so an Overwrite re-creation can re-pin the canonical path
    * without tripping the existing-location mismatch check. No-op when the
    * table doesn't exist. */
  def dropWithFiles(spark: SparkSession, table: String): Unit =
    if (spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
      spark.sql(s"DROP TABLE `$table`")
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    }

  /** Parquet file count across `tables` — the quantity compaction bounds. */
  def fileCount(spark: SparkSession, tables: Seq[String]): Long =
    tables.map { t =>
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(t)).location)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(loc, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }.sum
}
