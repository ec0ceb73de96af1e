package graft.tools

import graft.functions.{InvoiceParser, Normalizer}
import graft.operators.InvoicePipeline
import org.apache.spark.sql.SparkSession

/** Single-thread stage attribution for the normalize→parse chain: collects
  * the synthetic invoice corpus and times each parse stage in isolation
  * over the same texts, so q_invoice_pipeline's scoreboard cost can be
  * split into construction / normalize / block-scan / field-extraction
  * before optimizing any of them. Usage: ParseProfile [sfDir] [sampleN]. */
object ParseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else Int.MaxValue
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val texts = InvoicePipeline.syntheticCorpus(spark, sfDir)
      .select("text").limit(n).collect().map(_.getString(0))
    println(f"[parseprofile] corpus collect: ${(System.nanoTime() - t0) / 1e9}%.2f s (${texts.length} docs)")

    def timed(label: String)(f: String => Any): Unit = {
      // one warmup pass for JIT, then the timed pass
      var sink = 0
      texts.foreach(t => sink ^= f(t).hashCode())
      val t1 = System.nanoTime()
      texts.foreach(t => sink ^= f(t).hashCode())
      val s = (System.nanoTime() - t1) / 1e9
      println(f"[parseprofile] $label%-28s ${s}%7.2f s  (${s * 1e6 / texts.length}%6.1f µs/doc, sink=${sink & 1})")
    }

    timed("normalizeText (kernel)")(Normalizer.normalizeText)
    val norm = texts.map(Normalizer.normalizeText)
    def timedN(label: String)(f: String => Any): Unit = {
      var sink = 0
      norm.foreach(t => sink ^= f(t).hashCode())
      val t1 = System.nanoTime()
      norm.foreach(t => sink ^= f(t).hashCode())
      val s = (System.nanoTime() - t1) / 1e9
      println(f"[parseprofile] $label%-28s ${s}%7.2f s  (${s * 1e6 / norm.length}%6.1f µs/doc, sink=${sink & 1})")
    }
    timedN("extractBlocks")(InvoiceParser.extractBlocks)
    timedN("emission+competence")(InvoiceParser.extractEmissionAndCompetence)
    timedN("findKeyValidAccess")(InvoiceParser.findKeyValidAccess)
    val blocks = norm.map(InvoiceParser.extractBlocks)
    def timedB(label: String, key: String)(f: String => Any): Unit = {
      var sink = 0
      blocks.foreach(b => sink ^= f(b(key)).hashCode())
      val t1 = System.nanoTime()
      blocks.foreach(b => sink ^= f(b(key)).hashCode())
      val s = (System.nanoTime() - t1) / 1e9
      println(f"[parseprofile] $label%-28s ${s}%7.2f s  (${s * 1e6 / blocks.length}%6.1f µs/doc, sink=${sink & 1})")
    }
    timedB("party(ISSUER)", "ISSUER")(InvoiceParser.extractPartyFromBlock)
    timedB("party(RECIPIENT)", "RECIPIENT")(InvoiceParser.extractPartyFromBlock)
    timedB("items(ITEMS)", "ITEMS")(InvoiceParser.extractItemsFromBlock)
    timedB("total(FINANCIALS)", "FINANCIALS")(InvoiceParser.extractTotalFromBlock)
    timedN("extractFromText (full)")(t => InvoiceParser.extractFromText(t))
    spark.stop()
  }
}
