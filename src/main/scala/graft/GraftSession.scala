package graft

import org.apache.spark.sql.SparkSession

/** The library's front door: a SparkSession builder pre-wired with
  * everything graft needs to behave as documented —
  *
  *   - [[graft.plans.GraftExtensions]] (codegen fiscal validators as
  *     native SQL functions + the `SimplifyFiscalValidation` optimizer
  *     rule);
  *   - the registered UDF surface ([[graft.functions.Udfs.registerAll]]);
  *   - UTC session time (the oracle-parity convention every date/time
  *     query in this repo assumes);
  *   - AQE left ON with skew-join handling (the runtime half of the skew
  *     story; the static half is `Analytics.saltedJoin`).
  *
  * Deliberately NOT set here: master, shuffle partitions, memory — those
  * are deployment decisions (a 1000-executor cluster and `local[32]`
  * want different values), and hard-coding them in a library is how jobs
  * end up with 200 shuffle partitions on a 4-core laptop. Callers chain
  * their own `.master(…)`/`.config(…)` on the returned builder.
  */
object GraftSession {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")

  /** Build (or reuse) the session and register the UDF surface — UDF
    * registration is per-session state, so it happens at getOrCreate
    * time, not builder time.
    *
    * If a SparkSession ALREADY exists (shell, notebook), Spark ignores
    * `withExtensions` and static configs on it — the front-door contract
    * (native `cnpj_is_valid` etc.) silently cannot be met. That case is
    * detected by probing the function registry and FAILS FAST with a
    * remediation hint instead of returning a half-wired session. */
  def getOrCreate(configure: SparkSession.Builder => SparkSession.Builder = identity): SparkSession = {
    val spark = configure(builder()).getOrCreate()
    if (!spark.catalog.functionExists("cnpj_is_valid"))
      throw new IllegalStateException(
        "GraftSession.getOrCreate reused an existing SparkSession that was built " +
          "WITHOUT GraftExtensions (Spark cannot inject extensions into a running " +
          "session). Either stop() the existing session first, or build your own " +
          "with .withExtensions(new graft.plans.GraftExtensions).")
    graft.functions.Udfs.registerAll(spark)
    spark
  }
}
