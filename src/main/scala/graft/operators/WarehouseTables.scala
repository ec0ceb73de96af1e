package graft.operators

import org.apache.spark.sql.SparkSession

/** Shared hygiene for MANAGED model tables (default warehouse location,
  * no explicit `path` option): [[QualityClassifier.persist]],
  * [[BloomDedup.persist]], [[LanguageModel.persist]], and the curation
  * calibration table all write `saveAsTable(tag_…)` into the session
  * warehouse and need the same two pieces:
  *
  *  1. A GRAFT MARKER (`_graft_table` file) stamped into the table
  *     location after a successful write, so reconciliation can prove a
  *     directory was graft-written before touching it.
  *  2. FRESH-CATALOG/STALE-WAREHOUSE reconciliation: Spark's in-memory
  *     catalog restarts empty while a managed table's directory survives
  *     the JVM, and the next `saveAsTable` refuses with
  *     LOCATION_ALREADY_EXISTS (hit live by the bench harness — its
  *     second run found the first run's directory). A location with no
  *     catalog entry is unreferenced by THIS session; if it carries the
  *     graft marker it is deleted under the caller's lease. A markerless
  *     non-empty orphan is NOT deleted — it raises a loud error naming
  *     the path, because nothing proves graft wrote it (ADVICE r11: the
  *     unconditional delete could remove foreign data in a shared
  *     warehouse).
  *
  * Assumption boundary (stated, per ADVICE r11): this regime is sound for
  * a SINGLE-APPLICATION warehouse with the in-memory session catalog —
  * the repo's deployment shape. With a shared warehouse across concurrent
  * APPLICATIONS, or a persistent metastore whose other sessions still
  * reference the table, "no catalog entry here" does not imply
  * "unreferenced": the lease serializes graft writers only, so a
  * concurrent non-graft reader of the same location could still observe
  * the delete. Use a persistent catalog + table-format commit protocol
  * (the [[LeaseLock]] scaladoc's manifest-log boundary) for that shape. */
object WarehouseTables {

  val MarkerFile = "_graft_table"

  /** Pre-write INTENT marker (ADVICE r12): a SIBLING file
    * `<table>._graft_writing` next to the managed location — it cannot
    * live inside it, because `saveAsTable` refuses a non-empty
    * pre-existing location (the CTAS LOCATION_ALREADY_EXISTS check).
    * [[reconcileOrphan]] stamps it before the caller's `saveAsTable`;
    * [[mark]] clears it after the post-write marker lands. A crash in the
    * saveAsTable→mark window therefore leaves a markerless directory
    * WITH a live intent sibling — proven graft-initiated, so the next
    * reconcile self-heals (deletes and rewrites) instead of demanding a
    * human, closing the r12 ADVICE gap where a transient crash turned
    * into a permanent manual-intervention failure for retrying
    * streaming/bench harnesses. Foreign data never carries the sibling
    * and is still refused loudly.
    *
    * The intent EXPIRES after [[IntentTtlMs]] (review r13): a failure
    * between reconcile and the caller's `saveAsTable` (exception, abort)
    * leaves the sibling with nothing to clear it, and a permanent token
    * would eventually launder genuinely foreign data written at the same
    * location weeks later into "graft-initiated" — the exact deletion
    * the marker regime exists to prevent. A stale intent therefore
    * counts as absent (the loud pre-r13 refusal returns), bounding the
    * self-heal window to the retry-loop timescale it was built for —
    * the same honesty trade as the lease's mtime expiry. */
  val IntentTtlMs: Long = LeaseLock.DefaultLeaseMs

  private def intentPath(loc: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(loc.getParent, loc.getName + "._graft_writing")

  private def intentLive(fs: org.apache.hadoop.fs.FileSystem,
                         loc: org.apache.hadoop.fs.Path): Boolean = {
    val p = intentPath(loc)
    fs.exists(p) &&
      fs.getFileStatus(p).getModificationTime > System.currentTimeMillis() - IntentTtlMs
  }

  private def location(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))

  /** Stamp the graft marker into `table`'s managed location and clear the
    * pre-write intent sibling. Call immediately after the `saveAsTable`
    * that creates it, inside the same lease. */
  def mark(spark: SparkSession, table: String): Unit = {
    val loc = location(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, MarkerFile), true)
    try out.write("graft".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(intentPath(loc), false)
  }

  /** If the session catalog lacks `table` but its default managed location
    * exists on disk: delete the orphan when something proves graft wrote
    * it — the in-location graft marker, a live pre-write intent sibling
    * (crash between saveAsTable and mark), or an empty directory — and
    * error loudly when nothing does. Then stamp the intent sibling for
    * the `saveAsTable` the caller is about to run. Call under the table's
    * lease, before `saveAsTable`. */
  def reconcileOrphan(spark: SparkSession, table: String): Unit = {
    val loc = location(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!spark.catalog.tableExists(table) && fs.exists(loc)) {
      val marker = new org.apache.hadoop.fs.Path(loc, MarkerFile)
      val empty = fs.listStatus(loc).isEmpty
      require(empty || fs.exists(marker) || intentLive(fs, loc),
        s"orphan table location $loc exists without a $MarkerFile marker " +
          "or a LIVE pre-write intent sibling. Nothing proves graft wrote " +
          "it (foreign data, pre-marker data, or a graft crash older than " +
          s"the ${IntentTtlMs / 60000} min intent TTL) - graft will not " +
          "delete it. If the content is a graft model/filter you are " +
          s"about to rewrite, remove the directory manually: $loc")
      fs.delete(loc, true)
    }
    // declare the write that follows this reconcile (same lease): create
    // the sibling even when the location did not exist, so ANY crash
    // before mark() leaves a self-healable trace, never a refusal.
    // SKIPPED when the catalog already holds the table (review r14): the
    // in-memory catalog dies with the JVM, so after any crash the restart
    // sees no entry and the location's previous successful write already
    // carries the in-location marker — an intent here would only add a
    // live 15-minute token during which markerless data appearing at the
    // location gets deleted, a laundering window with no self-heal case
    // left to buy.
    if (!spark.catalog.tableExists(table))
      fs.create(intentPath(loc), true).close()
  }

  /** Remove the pre-write intent sibling without writing. For callers
    * that abort BETWEEN [[reconcileOrphan]] and their `saveAsTable`
    * (review r14): an intent with no write behind it is a live token
    * that would launder markerless foreign data at the location for the
    * TTL — clear it when the write is not going to be attempted. */
  def clearIntent(spark: SparkSession, table: String): Unit = {
    val loc = location(spark, table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(intentPath(loc), false)
  }

  /** The full managed-write lifecycle the persist paths share:
    * reconcile (+ intent stamp), evaluate `rows` (plan construction /
    * analysis — if THIS throws, the write was never attempted, so the
    * intent is cleared and a live token cannot outlive an aborted
    * caller), run `write` (if this throws the intent STAYS: files may
    * already be at the location, which is exactly the graft-initiated
    * crash the intent self-heals), then [[mark]]. Call under the
    * table's lease. */
  def writeManaged(spark: SparkSession, table: String)
                  (rows: => org.apache.spark.sql.DataFrame)
                  (write: org.apache.spark.sql.DataFrame => Unit): Unit = {
    reconcileOrphan(spark, table)
    val df =
      try rows
      catch { case e: Throwable => clearIntent(spark, table); throw e }
    write(df)
    mark(spark, table)
  }
}
