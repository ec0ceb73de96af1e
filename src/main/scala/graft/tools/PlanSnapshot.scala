package graft.tools
import org.apache.spark.sql.SparkSession
/** Regenerates docs/PLANS.md: physical-plan highlights (scans with
  * pushdown/pruning, exchanges, codegen spans) for the headline queries. */
object PlanSnapshot {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val headline = Seq("q_invoice_pipeline", "q_agg_pricing", "q_join_revenue",
      "q_anti_join", "q_events_hourly", "q_minhash_dedup",
      "q_block_segment", "q_ann_lsh", "q_winnow_overlap", "q_jaccard_pairs",
      "q_passages", "q_pack_sequences", "q_pii_redact", "q_repetition",
      "q_contamination", "q_salted_join", "q_curation_pipeline", "q_bm25",
      "q_ivf_search", "q_ivf_search_int8", "q_latest_by_key",
      "q_dedup_incremental", "q_semantic_dedup", "q_temperature_sample",
      "q_shard_manifest", "q_hashed_features", "q_simhash_pairs")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence for the headline queries\n\n")
    sb.append("Regenerate with `sbt \"runMain graft.tools.PlanSnapshot\"`. Lines\n")
    sb.append("selected: parquet scans (column pruning via ReadSchema, predicate\n")
    sb.append("pushdown via PushedFilters/DataFilters), exchanges (the shuffles),\n")
    sb.append("and whole-stage-codegen markers (`*(n)` prefixes).\n")
    for (name <- headline) {
      val plan = graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      sb.append(s"\n## $name\n\n```\n")
      plan.linesIterator
        .filter(l => l.contains("FileScan") || l.contains("Exchange") ||
          l.contains("ReadSchema") || l.contains("PushedFilters") ||
          l.contains("DataFilters") || l.contains("Join") ||
          l.contains("ObjectHashAggregate") || l.trim.startsWith("*("))
        .map(_.trim.take(170))
        .foreach(l => sb.append(l).append('\n'))
      sb.append("```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("docs/PLANS.md"), sb.toString)
    println("[plans] wrote docs/PLANS.md")
    spark.stop()
  }
}
