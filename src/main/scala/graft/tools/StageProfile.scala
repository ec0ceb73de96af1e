package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{Normalizer, Udfs, InvoiceParser}
object StageProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = 20000
    val docs = spark.range(n).select(col("id"), lit(GoldenFixture.text).as("text"))
      .repartition(32).cache()
    docs.count()
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warm
      val t0 = System.nanoTime(); df.count()
      println(f"[prof] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s for $n docs")
    }
    time("normalize only")(docs.select(Normalizer.normalizeTextCol(col("text")).as("n")).filter(length(col("n")) > 0))
    time("parse only (pre-norm scala)")(
      docs.select(Udfs.parseInvoice(col("text"), lit(null).cast("string")).as("i")).filter(col("i.raw_text").isNotNull))
    time("norm+parse")(
      docs.select(Udfs.parseInvoice(Normalizer.normalizeTextCol(col("text")), lit(null).cast("string")).as("i"))
        .filter(col("i.raw_text").isNotNull))
    time("full process")(graft.operators.InvoicePipeline.process(docs).filter(col("status").isNotNull))
    // pure scala baseline: same work in a plain mapPartitions
    time("pure-scala kernel")(
      docs.as[(Long, String)].mapPartitions(_.map { case (id, t) =>
        val inv = InvoiceParser.extractFromText(Normalizer.normalizeText(t))
        (id, inv.financials.total.getOrElse(""))
      }).toDF("id", "total").filter(col("total").isNotNull))
    spark.stop()
  }
}
