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

  private def location(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))

  /** Stamp the graft marker into `table`'s managed location. Call
    * immediately after the `saveAsTable` that creates it, inside the same
    * lease. */
  def mark(spark: SparkSession, table: String): Unit = {
    val loc = location(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, MarkerFile), true)
    try out.write("graft".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** If the session catalog lacks `table` but its default managed location
    * exists on disk: delete the orphan when it carries the graft marker
    * (or is an empty directory), error loudly when it doesn't. Call under
    * the table's lease, before `saveAsTable`. */
  def reconcileOrphan(spark: SparkSession, table: String): Unit =
    if (!spark.catalog.tableExists(table)) {
      val loc = location(spark, table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) {
        val marker = new org.apache.hadoop.fs.Path(loc, MarkerFile)
        val empty = fs.listStatus(loc).isEmpty
        // Deliberate trade (stated): a crash in the window between
        // saveAsTable and mark() leaves a graft-written but markerless
        // directory this refusal will NOT self-heal — the price of never
        // deleting data nothing proves graft wrote (ADVICE r11). The
        // error names both possibilities and the remedy.
        require(empty || fs.exists(marker),
          s"orphan table location $loc exists without a $MarkerFile marker. " +
            "Either it is foreign/pre-marker data (do not let graft delete " +
            "it), or a graft persist crashed between its table write and " +
            "its marker write. If the content is a graft model/filter you " +
            s"are about to rewrite, remove the directory manually: $loc")
        fs.delete(loc, true)
      }
    }
}
