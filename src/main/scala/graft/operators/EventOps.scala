package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table (SURVEY §2.10: the
  * reference is architected for streaming but implements none — these are
  * the Spark-native event-time operators the event envelope contract
  * implies). The same logic runs under Structured Streaming via
  * [[graft.streaming.StreamingPipeline]]; batch versions here are the
  * oracle-checkable semantics.
  *
  * Scale notes: tumbling-window agg groups on (hour, type) — tiny shuffle
  * after partial agg. Sessionize and as-of partition by user_id — a single
  * well-distributed shuffle; a skewed power-user key would be handled by
  * AQE skew-join/salting, and state in the streaming variant is bounded by
  * watermarking.
  */
object EventOps {

  /** Reads the events table through the encoding-adaptive
    * [[graft.sources.Tables]] reader (ns-as-long / TIMESTAMP_NTZ /
    * TIMESTAMP all normalize to µs TimestampType instants — the
    * mixed-writer-lake contract that broke in round 5 when this reader
    * hard-coded one encoding), plus a loud contract check: every
    * downstream event-time operator assumes `ts` is a TimestampType. */
  private[graft] def events(spark: SparkSession, dir: String): DataFrame = {
    val df = graft.sources.Tables.read(spark, dir, "events")
    val t = df.schema("ts").dataType
    if (t != org.apache.spark.sql.types.TimestampType)
      throw new IllegalStateException(
        s"events.parquet ts read as unsupported type $t (dir=$dir)")
    df
  }

  /** Tumbling 1-hour event-time windows per event type. */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"),
        count_distinct(col("user_id")).as("users"))
      .orderBy("window_start", "event_type")

  val hourlyWindowSql: String = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
  COUNT(*) AS events,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
  COUNT(DISTINCT user_id) AS users
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".trim

  /** Gap-based sessionization (30-minute inactivity gap): classic
    * lag + cumulative-sum session assignment, then per-session rollup.
    * One shuffle on user_id; per-user state is a sorted walk. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMicros = 30 * 60 * 1000000L // compare in µs — second-truncation
    // would disagree with the oracle at exact-gap boundaries
    val withGap = events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withGap
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  val sessionizeSql: String = """
WITH g AS (
  SELECT user_id, event_id, ts,
    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, event_id, ts,
    SUM(CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS events,
  MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY 1, 2 ORDER BY 1, 2
""".trim

  /** Per-user running analytics: cumulative value, previous-event gap
    * (lag), and next event type (lead) — the §2.8 analytic-window surface
    * over event time. One shuffle on user_id. */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(spark, dir)
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("prev_gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("running_value"),
        col("prev_gap_us"), col("next_type"))
      .orderBy("event_id")
  }

  val runningTotalsSql: String = """
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER
    (PARTITION BY user_id ORDER BY ts, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS prev_gap_us,
  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events ORDER BY event_id
""".trim

  /** As-of join: for every purchase event, the most recent STRICTLY-PRIOR
    * click of the same user. Implemented the scale-friendly way — union the
    * two streams, one window pass carrying the last click timestamp forward
    * — instead of an O(n²) range self-join. A 1000-executor cluster does one
    * shuffle on user_id and a sorted walk per user. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val tagged = ev.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type"),
      when(col("event_type") === "click", col("ts")).as("click_ts"))
    // strictly prior: order clicks before purchases at identical ts via a
    // tie-break rank (click=0 sorts first, window excludes current row range)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
        col("last_click_ts"))
      .orderBy("event_id")
  }

  /** Oracle uses the naive correlated formulation — same semantics, O(n²)
    * per user, fine for DuckDB at verification scale. `<` plus the
    * (ts,event_id) tie-break mirrors the window's strictly-prior frame. */
  val asofJoinSql: String = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
  (SELECT max(c.ts) FROM events c
   WHERE c.user_id = p.user_id AND c.event_type = 'click'
     AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))) AS last_click_ts
FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id
""".trim

  /** CDC-style compaction: collapse a versioned event log to the LATEST
    * version per entity — the "keep the newest crawl of each URL" /
    * upsert-materialization step every training-data refresh runs.
    *
    * Deliberately NOT the row_number()-window formulation: that plan
    * shuffles the ENTIRE log on the entity key and sorts each reducer
    * partition by (key, version). This is an aggregation picking the
    * lexicographically-greatest (version..., payload...) struct per
    * entity, so it PARTIAL-aggregates: each map task pre-collapses to one
    * row per entity before the exchange, and the shuffle carries one row
    * per (entity × map partition) instead of the whole log. On a 100 TB
    * log where entities repeat thousands of times, that map-side combine
    * is the difference between shuffling the corpus and shuffling the
    * entity set.
    *
    * The aggregate is [[graft.plans.ArgMaxStruct]], not the declarative
    * `max(struct(...))`: a struct-typed Max buffer is immutable for
    * UnsafeRow, which demotes the plan to SortAggregate (each map split
    * locally sorted by key before the partial aggregate). The typed
    * buffer keeps it in hash-based ObjectHashAggregate. Honest boundary:
    * ObjectHashAggregateExec itself falls back to sort-based aggregation
    * past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (128) distinct keys per task, so at real entity cardinalities the
    * map side DOES sort its post-threshold input unless the deployment
    * raises the threshold to its per-task entity budget (each key holds
    * one buffered row; see the [[graft.plans.ArgMaxStruct]] scaladoc).
    * The generic payload (strings) is what forces the object buffer —
    * the all-primitive arg-max shapes use [[graft.plans.ArgMaxBest]],
    * which has no such fallback. Deterministic because (ts, event_id)
    * is unique — the payload fields after the version prefix are never
    * consulted by the comparison. */
  def latestOn(log: DataFrame, keyCols: Seq[String], versionCols: Seq[String],
               payloadCols: Seq[String]): DataFrame = {
    require(versionCols.nonEmpty, "latestOn needs at least one version column")
    graft.plans.ArgMaxStruct.ensureRegistered(log.sparkSession)
    val fields = (versionCols ++ payloadCols).map(c => s"`$c`").mkString(", ")
    log.groupBy(keyCols.map(col): _*)
      .agg(expr(s"${graft.plans.ArgMaxStruct.FuncName}(struct($fields))").as("latest"),
        count(lit(1)).cast("long").as("n_versions"))
      .select(keyCols.map(col) ++
        (versionCols ++ payloadCols).map(c => col(s"latest.$c").as(c)) :+
        col("n_versions"): _*)
  }

  /** [[latestOn]] for the ALL-PRIMITIVE CDC shape — version =
    * (timestamp, BIGINT id), ONE numeric (BIGINT/DOUBLE) payload. Rides
    * [[graft.plans.ArgMaxBest]]'s fixed-width HashAggregate buffer, so
    * unlike the generic object-buffer path there is NO
    * ObjectHashAggregate 128-key sort-based fallback: the map side
    * combines at ANY entity cardinality — the shape the 100 TB
    * latest-crawl-per-URL compaction actually needs. Row-identical to
    * [[latestOn]] over the same columns (differential-pinned): event
    * micros fit a double EXACTLY below 2^53 (≈ year 2255, loudly
    * required), and latestOn's (ts DESC, id DESC) struct order is
    * ArgMaxBest's (score DESC, id ASC) under id negation. Version
    * columns must be non-null (the generic path sorts null versions
    * first; this one would SKIP null-version rows — the events reader
    * contract guarantees both non-null). */
  def latestNumericOn(log: DataFrame, keyCols: Seq[String], tsCol: String,
                      idCol: String, valueCol: String): DataFrame = {
    graft.plans.ArgMaxBest.ensureRegistered(log.sparkSession)
    val micros = s"unix_micros(`$tsCol`)"
    log.groupBy(keyCols.map(col): _*)
      .agg(expr(s"${graft.plans.ArgMaxBest.FuncName}(" +
          // assert_true yields NULL on pass (throws otherwise — including
          // on a NULL condition, which is how a NULL ts fails), so the
          // coalesce'd + 0.0 leaves the exact micros untouched. The
          // second assert makes the non-null events CONTRACT loud
          // (advisor r10): a NULL version column would otherwise be
          // silently skipped by the arg-max while still counted in
          // n_versions — divergent from latestOn's nulls-first order.
          s"cast($micros AS DOUBLE) + coalesce(cast(assert_true(" +
          s"abs($micros) < 9007199254740992L, " +
          s"'latestNumericOn: |unix_micros($tsCol)| >= 2^53 — micros no " +
          "longer exact in a double; use latestOn') AS DOUBLE), 0.0) " +
          s"+ coalesce(cast(assert_true(" +
          s"`$tsCol` IS NOT NULL AND `$idCol` IS NOT NULL, " +
          s"'latestNumericOn: NULL `$tsCol`/`$idCol` violates the non-null " +
          "version contract; use latestOn (nulls-first order)') AS DOUBLE), 0.0), " +
          s"-cast(`$idCol` AS BIGINT), `$valueCol`)").as("latest"),
        count(lit(1)).cast("long").as("n_versions"))
      .select(keyCols.map(col) ++ Seq(
        timestamp_micros(col("latest.score").cast("long")).as(tsCol),
        (-col("latest.id")).as(idCol),
        col("latest.payload").as(valueCol),
        col("n_versions")): _*)
  }

  /** Latest event per (user, event_type) entity over the events table —
    * the all-primitive shape, so it rides [[latestNumericOn]]'s
    * HashAggregate path (latestOn differential pinned in the spec). */
  def latestByKey(spark: SparkSession, dir: String): DataFrame =
    latestNumericOn(events(spark, dir), keyCols = Seq("user_id", "event_type"),
      tsCol = "ts", idCol = "event_id", valueCol = "value")
      .orderBy("user_id", "event_type")

  /** Oracle uses the window formulation — same semantics, fine at
    * verification scale; ties impossible (event_id unique per row). */
  val latestByKeySql: String = """
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id, value,
    row_number() OVER (PARTITION BY user_id, event_type
                       ORDER BY ts DESC, event_id DESC) AS rn,
    COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_versions
  FROM events
)
SELECT user_id, event_type, ts, event_id, value,
  CAST(n_versions AS BIGINT) AS n_versions
FROM ranked WHERE rn = 1 ORDER BY user_id, event_type
""".trim

  /** Attribution window = bin width for [[binnedRangeJoin]], in µs
    * (3 days). Interval length = bin width ⇒ an interval spans ≤ 2 bins. */
  val RangeBinUs: Long = 3L * 86400L * 1000000L

  /** Interval (range) join the SCALE way: for every purchase, the same
    * user's clicks inside the 3-day attribution window before it.
    *
    * A naive `points.join(intervals, pointInRange)` theta-join plans as
    * BroadcastNestedLoopJoin — O(|a|·|b|) with interpreted predicates, the
    * classic range-join trap. Binning restores an equi-join: each interval
    * explodes to the (≤2) bins it covers, each point maps to exactly one
    * bin, the join runs on (user, bin) through a plain shuffled equi-join,
    * and the residual BETWEEN filter keeps exact semantics. Each matching
    * (click, purchase) pair appears exactly once (the click's single bin).
    * At 100 TB this is one co-partitioned shuffle; bin width tunes the
    * bins-per-interval vs rows-per-bin tradeoff. EventOpsRangeSpec pins
    * that NO BroadcastNestedLoopJoin appears and that the result equals
    * the naive theta formulation. */
  def binnedRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).withColumn("us", unix_micros(col("ts")))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us").as("click_us"), col("value"))
      .withColumn("bin", expr(s"click_us div ${RangeBinUs}L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"), col("us").as("p_us"))
      .withColumn("start_us", col("p_us") - RangeBinUs)
      .withColumn("bin", explode(sequence(
        expr(s"start_us div ${RangeBinUs}L"), expr(s"p_us div ${RangeBinUs}L"))))
    clicks.join(purchases,
        col("user_id") === col("p_user") && clicks("bin") === purchases("bin") &&
          col("click_us").between(col("start_us"), col("p_us")))
      .groupBy(col("p_user").as("user_id"), col("event_id"), col("p_us").as("purchase_us"))
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_click_value"),
        min(col("click_us")).as("first_click_us"),
        max(col("click_us")).as("last_click_us"))
      .orderBy("user_id", "event_id")
  }

  /** Oracle: the plain range join — DuckDB handles the theta form fine at
    * verification scale; timestamps compared in µs (the engines' common
    * precision after the ns→µs truncation). */
  val binnedRangeJoinSql: String = s"""
SELECT p.user_id, p.event_id, epoch_us(p.ts) AS purchase_us,
  CAST(COUNT(*) AS BIGINT) AS n_clicks,
  CAST(SUM(CAST(c.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_click_value,
  min(epoch_us(c.ts)) AS first_click_us,
  max(epoch_us(c.ts)) AS last_click_us
FROM events p JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - $RangeBinUs AND epoch_us(p.ts)
GROUP BY p.user_id, p.event_id, epoch_us(p.ts)
ORDER BY p.user_id, p.event_id
""".trim
}
