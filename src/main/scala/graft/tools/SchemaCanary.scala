package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Testdata schema pre-flight: assert every table's column names and
  * PHYSICAL parquet types against the expected catalog before a bench or
  * correctness run touches them.
  *
  * Round 5 motivated this: the testdata generator silently moved `events.ts`
  * from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between the builder's last
  * green run and the driver's gate, and the first symptom was 7 queries
  * failing analysis with a type error three layers away from the cause. A
  * footer read costs milliseconds and names the drifted column directly.
  *
  * Policy: violations are REPORTED, loudly, with the table/column/expected/
  * found spelled out — but the caller keeps running. Aborting the whole run
  * on one drifted column would turn "7 red rows with a clear cause attached"
  * into "57 red rows", which is strictly worse for a correctness gate. The
  * standalone main exits non-zero for script use.
  *
  * A column's accepted set lists every encoding the engine's readers
  * genuinely handle (e.g. [[graft.operators.EventOps.events]] dispatches on
  * ns-as-long vs µs timestamps), so the canary only fires on drift that
  * would actually break something or silently change semantics.
  */
object SchemaCanary {

  /** Expected column → accepted type descriptors ("PHYSICAL" or
    * "PHYSICAL:LOGICAL" as parquet-mr prints them). */
  final case class Col(path: String, accepted: Set[String])

  private def ts(physical: String = "INT64"): Set[String] = Set(
    // every timestamp encoding the readers dispatch on (EventOps.events):
    // µs/ns, tz-adjusted or not; INT96 deliberately absent (stat-less —
    // Layout refuses to write it, and a generator emitting it should fire)
    s"$physical:TIMESTAMP(MICROS,true)", s"$physical:TIMESTAMP(MICROS,false)",
    s"$physical:TIMESTAMP(NANOS,true)", s"$physical:TIMESTAMP(NANOS,false)")

  private val str = Set("BINARY:STRING")
  private def one(t: String): Set[String] = Set(t)
  // generators flip between INT32/INT64 for small key columns; both read fine
  private val int3264 = Set("INT32", "INT64")

  val catalog: Map[String, Seq[Col]] = Map(
    "region" -> Seq(Col("r_regionkey", int3264), Col("r_name", str)),
    "nation" -> Seq(Col("n_nationkey", int3264), Col("n_name", str),
      Col("n_regionkey", int3264)),
    "customer" -> Seq(Col("c_custkey", one("INT64")), Col("c_name", str),
      Col("c_nationkey", int3264), Col("c_acctbal", one("DOUBLE")),
      Col("c_mktsegment", str)),
    "supplier" -> Seq(Col("s_suppkey", one("INT64")), Col("s_name", str),
      Col("s_nationkey", int3264), Col("s_acctbal", one("DOUBLE"))),
    "part" -> Seq(Col("p_partkey", one("INT64")), Col("p_name", str),
      Col("p_brand", str), Col("p_type", str), Col("p_size", int3264),
      Col("p_retailprice", one("DOUBLE"))),
    "orders" -> Seq(Col("o_orderkey", one("INT64")), Col("o_custkey", one("INT64")),
      Col("o_orderstatus", str), Col("o_totalprice", one("DOUBLE")),
      Col("o_orderdate", ts()), Col("o_orderpriority", str)),
    "lineitem" -> Seq(Col("l_orderkey", one("INT64")), Col("l_partkey", one("INT64")),
      Col("l_suppkey", one("INT64")), Col("l_linenumber", int3264),
      Col("l_quantity", one("DOUBLE")), Col("l_extendedprice", one("DOUBLE")),
      Col("l_discount", one("DOUBLE")), Col("l_tax", one("DOUBLE")),
      Col("l_returnflag", str), Col("l_linestatus", str),
      Col("l_shipdate", ts())),
    "events" -> Seq(Col("event_id", one("INT64")), Col("ts", ts()),
      Col("user_id", one("INT64")), Col("event_type", str),
      Col("value", one("DOUBLE")), Col("props", str)),
    "documents" -> Seq(Col("doc_id", one("INT64")), Col("text", str),
      Col("lang", str), Col("source", str), Col("n_chars", one("INT64"))),
    "embeddings" -> Seq(Col("vec_id", one("INT64")),
      Col("embedding.list.element", one("FLOAT")), Col("label", int3264)))

  /** Column path → "PHYSICAL[:LOGICAL]" from the first parquet footer —
    * shared with the adaptive reader ([[graft.sources.Tables]]), which
    * dispatches on the same descriptors this canary polices. */
  def describe(path: Path, conf: Configuration): Map[String, String] =
    graft.sources.Tables.describe(path, conf)

  /** Violations ("table.column: expected X, found Y") for one sf dir.
    * Missing expected columns fire; extra columns are additive and don't. */
  def check(sfDir: String, conf: Configuration): Seq[String] =
    catalog.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val p = new Path(s"$sfDir/$table.parquet")
      scala.util.Try(describe(p, conf)) match {
        case scala.util.Failure(e) => Seq(s"$table: unreadable ($e)")
        case scala.util.Success(found) => cols.flatMap { c =>
          found.get(c.path) match {
            case None => Some(s"$table.${c.path}: MISSING (expected one of ${c.accepted.mkString("|")})")
            case Some(t) if !c.accepted.contains(t) =>
              Some(s"$table.${c.path}: DRIFTED — found $t, expected one of ${c.accepted.mkString("|")}")
            case _ => None
          }
        }
      }
    }

  /** Run the canary over `sfDirs`, print violations to stderr (loud, one
    * clear message per drifted column), return them. Callers keep running —
    * see the policy note above. */
  def preflight(conf: Configuration, sfDirs: Seq[String]): Seq[String] = {
    val violations = sfDirs.filter(d => new java.io.File(d).isDirectory)
      .flatMap(d => check(d, conf).map(v => s"[schema-canary] $d: $v"))
    if (violations.nonEmpty) {
      System.err.println("[schema-canary] TESTDATA SCHEMA DRIFT DETECTED — " +
        "query failures below this line are likely caused by it:")
      violations.foreach(System.err.println)
    }
    violations
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val violations = preflight(new Configuration(), dirs)
    if (violations.isEmpty) println(s"[schema-canary] OK: ${dirs.mkString(", ")}")
    else sys.exit(1)
  }
}
