package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level relational analytics (SURVEY §2.6-§2.9 extensions: the
  * reference has no grouped aggregation/joins/windows/set-ops — these are
  * the Spark-native extensions BASELINE.json's north star calls for).
  *
  * Scale notes, per operator, assuming the TPC-H-ish star schema at 100 TB:
  *   - fact tables (lineitem, orders, events) are the scan-heavy side; all
  *     aggregations here are partial-agg friendly (map-side combine) and
  *     group on low-cardinality keys → tiny shuffles.
  *   - every dim join (customer/nation/region/supplier) is broadcast —
  *     dims are orders of magnitude smaller than facts, so no fact shuffle.
  *   - window queries partition by a high-cardinality key (custkey/user_id)
  *     → one shuffle, well distributed, no skew hot-spot.
  *   - decimal(18,2) casts BEFORE summing keep results deterministic and
  *     schema-stable across engines (IEEE double summation is
  *     order-dependent; decimal is not).
  */
object Analytics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.read(spark, dir, name)

  /** TPC-H Q1-style pricing summary: single scan, partial agg, 4-group
    * output. At scale: no join, shuffle carries only 4×partitions rows. */
  def aggPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // sum in exact decimal (order-independent), publish as double
        // (identical float64 value on both engines regardless of how each
        // client library surfaces decimals)
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val aggPricingSql: String = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""".trim

  /** Revenue by region/nation: fact scan + 3 broadcast dim joins. At scale
    * the only shuffle is the final tiny groupBy. */
  def joinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val customer = broadcast(t(spark, dir, "customer"))
    val nation = broadcast(t(spark, dir, "nation"))
    val region = broadcast(t(spark, dir, "region"))
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("order_cnt"))
      .orderBy("region_name", "nation_name")
  }

  val joinRevenueSql: String = """
SELECT r_name AS region_name, n_name AS nation_name,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2 ORDER BY 1, 2
""".trim

  /** Top-3 orders per customer by price (deterministic tie-break on
    * orderkey). One shuffle on the high-cardinality partition key. */
  def windowTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rk"),
        col("o_totalprice").as("price"))
      .orderBy("o_custkey", "rk")
  }

  val windowTopKSql: String = """
SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk, o_totalprice AS price
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      FROM orders)
WHERE rk <= 3 ORDER BY o_custkey, rk
""".trim

  /** Customers with no orders BEFORE 1995-07-01 — left-anti join against a
    * predicate-pushed slice of the fact table (the filter reaches the
    * parquet scan; at 100 TB that is the difference between scanning one
    * date slice and scanning everything). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .join(
        t(spark, dir, "orders").filter(col("o_orderdate") < to_timestamp(lit("1995-07-01"))),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")

  val antiJoinSql: String = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01')
ORDER BY c_custkey
""".trim

  /** Suppliers with at least one shipped lineitem — left-semi join. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "supplier")
      .join(t(spark, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")

  val semiJoinSql: String = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem)
ORDER BY s_suppkey
""".trim

  /** Pivot: line counts spread across return flags as columns (explicit
    * pivot values → no extra distinct-values job, stable schema). */
  def pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .count()
      .na.fill(0L)
      .orderBy("l_linestatus")

  val pivotSql: String = """
SELECT l_linestatus,
  COUNT(*) FILTER (WHERE l_returnflag = 'A') AS "A",
  COUNT(*) FILTER (WHERE l_returnflag = 'N') AS "N",
  COUNT(*) FILTER (WHERE l_returnflag = 'R') AS "R"
FROM lineitem GROUP BY 1 ORDER BY 1
""".trim

  /** CUBE over (returnflag, linestatus): all 2² grouping sets. */
  def cube2(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val cube2Sql: String = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
""".trim

  /** Set algebra over nation keys: nations having customers but no
    * suppliers (EXCEPT) and nations having both (INTERSECT), tagged. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val custNations = t(spark, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
    val suppNations = t(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct()
    val both = custNations.intersect(suppNations).withColumn("tag", lit("both"))
    val custOnly = custNations.except(suppNations).withColumn("tag", lit("customer_only"))
    both.union(custOnly).orderBy("tag", "nationkey")
  }

  val setOpsSql: String = """
SELECT nationkey, tag FROM (
  SELECT nationkey, 'both' AS tag FROM
    (SELECT DISTINCT c_nationkey AS nationkey FROM customer
     INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
  UNION ALL
  SELECT nationkey, 'customer_only' AS tag FROM
    (SELECT DISTINCT c_nationkey AS nationkey FROM customer
     EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
) ORDER BY tag, nationkey
""".trim

  /** Skew-safe two-phase aggregation: salt the grouping key, partial-
    * aggregate per (key, salt), then merge the partials. On a skewed key
    * distribution (one hot key at 100 TB) this spreads the hot key over
    * `buckets` reducers instead of one; results are identical because the
    * aggregates (sum/count) are associative. Deterministic salt here
    * (linenumber-derived) so the query is reproducible; production salting
    * hashes a high-cardinality column. */
  def saltedAgg(spark: SparkSession, dir: String, buckets: Int = 16): DataFrame =
    t(spark, dir, "lineitem")
      .withColumn("salt", pmod(col("l_linenumber"), lit(buckets)))
      .groupBy("l_returnflag", "salt")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("partial_qty"),
        count(lit(1)).as("partial_cnt"))
      .groupBy("l_returnflag")
      .agg(sum(col("partial_qty")).cast("double").as("sum_qty"),
        sum(col("partial_cnt")).cast("long").as("cnt"))
      .orderBy("l_returnflag")

  /** The oracle is the UNSALTED aggregation — proving the two-phase plan
    * is a pure refactoring of the straight group-by. */
  val saltedAggSql: String = """
SELECT l_returnflag,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS cnt
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""".trim

  /** Skew-safe equi-join: a hot join key (one user generating a large
    * fraction of events) concentrates a sort-merge/shuffled-hash join's
    * work in one partition. Salting spreads it: the probe (fact) side
    * gets a deterministic per-row salt, the build (dim) side is
    * replicated once per salt bucket, and the join runs on (key, salt) —
    * the hot key's rows now land on `salt` partitions instead of one.
    * Output is row-identical to the plain join (the oracle is the
    * UNSALTED join). Use when the build side is too big to broadcast and
    * AQE's runtime skew split is unavailable or insufficient; the salt
    * multiplies the build side, so keep it small (8–32).
    *
    * The salt derives from the hash of ALL fact columns — deterministic
    * under stage retry (a monotonically_increasing_id salt recomputes
    * DIFFERENTLY after a fetch-failure recompute when the fact side is
    * itself shuffle output, duplicating or dropping join rows —
    * SPARK-23207-class hazard). Restrictions: rows identical in EVERY
    * hashable column share a salt, so a hot key whose rows are full
    * duplicates stays on one partition — deduplicate or add a
    * distinguishing column first; and the salt hashes only the hashable
    * fact columns (MapType is unhashable in Spark — including it would
    * fail the whole join at analysis time), so at least one fact column
    * besides any maps must be hashable. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, salt: Int = 8): DataFrame = {
    // withColumn would silently REPLACE a caller's __salt column and the
    // final drop would then delete their data — fail loudly instead
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt; rename it on the input first")
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case org.apache.spark.sql.types.MapType(_, _, _) => false
      case org.apache.spark.sql.types.ArrayType(et, _) => hashable(et)
      case org.apache.spark.sql.types.StructType(fs)   => fs.forall(f => hashable(f.dataType))
      case _                                           => true
    }
    val saltCols = fact.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    require(saltCols.nonEmpty,
      "saltedJoin: every fact column is unhashable (maps) — add a hashable column to salt on")
    val salted = fact.withColumn("__salt",
      pmod(hash(saltCols.toIndexedSeq: _*), lit(salt)))
    val replicated = dim
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    salted.join(replicated,
      salted(factKey) === replicated(dimKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Oracled demonstration: events ⋈ customer through the salted join,
    * aggregated per market segment. The plain-join SQL oracle proves the
    * salting is a pure refactoring (same rows in, same aggregates out). */
  def saltedJoinAgg(spark: SparkSession, dir: String, salt: Int = 8): DataFrame = {
    // events.user_id is the fact key; the merge hint keeps the dim off
    // the broadcast path so the salted shuffle is what actually runs.
    // (EventOps.events normalizes the ts encoding of this table.)
    val events = EventOps.events(spark, dir).select(col("user_id"), col("value"))
    val customer = t(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(events, customer.hint("merge"), "user_id", "c_custkey", salt)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("c_mktsegment")
  }

  val saltedJoinAggSql: String = """
SELECT c_mktsegment, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
""".trim

  /** Exact interpolated percentiles per group — Spark's `percentile` and
    * DuckDB's `quantile_cont` share the linear-interpolation definition;
    * values round to 4 places to absorb summation-order ulps. At scale
    * exact percentiles sort within groups; the approx_percentile sketch is
    * the billion-row variant (not oracle-able, so not shipped as a query). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("median"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val percentilesSql: String = """
SELECT o_orderpriority,
  round(quantile_cont(o_totalprice, 0.5), 4) AS median,
  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
  COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY 1
""".trim

  /** Mean/stddev per group computed from EXACT decimal power sums — the
    * naive two-pass/Welford variance is merge-order dependent under
    * partitioning, but Σx and Σx² in decimal are exact, so the final
    * double formula is bit-identical on any cluster layout AND matches the
    * oracle computing the same closed form. */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val x = col("o_totalprice").cast("decimal(18,2)")
    t(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"),
        sum((x * x).cast("decimal(30,4)")).as("sx2"))
      .select(col("o_orderpriority"),
        col("n"),
        // round(…,4): DuckDB converts decimal→double in two roundings
        // (int128 value then scale divide), Spark in one — 1-ulp drift
        round(col("sx").cast("double") / col("n"), 4).as("mean"),
        round(sqrt((col("sx2").cast("double") - col("sx").cast("double") *
          col("sx").cast("double") / col("n")) / (col("n") - 1)), 4).as("stddev"))
      .orderBy("o_orderpriority")
  }

  val statsSql: String = """
WITH s AS (
  SELECT o_orderpriority, COUNT(*) AS n,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
    SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(30,4))) AS sx2
  FROM orders GROUP BY 1
)
SELECT o_orderpriority, n,
  round(CAST(sx AS DOUBLE) / n, 4) AS mean,
  round(sqrt((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)), 4) AS stddev
FROM s ORDER BY o_orderpriority
""".trim

  /** ROLLUP over (returnflag, linestatus): grouping-set aggregation with
    * subtotal and grand-total rows. */
  def rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val rollupSql: String = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
""".trim
}
