package graft

import graft.operators.EventOps
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** `EventOps.events` must read the SAME instants regardless of the writer's
  * physical timestamp encoding — the mixed-writer-lake contract that round
  * 5's single-encoding reader broke. The driver's testdata now exercises
  * only the µs path, so this spec keeps the legacy TIMESTAMP(NANOS) branch
  * pinned with a fixture written through parquet-mr directly (Spark 4 can
  * read ns via the nanosAsLong flag but cannot write it). */
class EventOpsEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schemaNs = MessageTypeParser.parseMessageType(
    """message events {
      |  required int64 event_id;
      |  required int64 ts (TIMESTAMP(NANOS,false));
      |  required int64 user_id;
      |  required binary event_type (STRING);
      |  required double value;
      |  required binary props (STRING);
      |}""".stripMargin)

  test("ns- and us-encoded events read as identical instants") {
    import spark.implicits._
    // base rows with sub-second precision worth preserving (µs resolution;
    // the ns writer adds sub-µs noise below to prove truncation semantics)
    val baseUs = Seq(
      (1L, 1700000000000001L, 10L, "click", 1.5, "{}"),
      (2L, 1700000000123456L, 10L, "purchase", 2.5, "{}"),
      (3L, 1700000086399999L, 11L, "click", 0.0, "{}"))

    // µs copy: what the current testdata generator writes (TIMESTAMP_NTZ
    // micros via Spark is close enough — events() takes the NTZ branch)
    val usDir = Files.createTempDirectory("graft-enc-us").toString
    baseUs.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$usDir/events.parquet")

    // ns copy: parquet-mr example writer, TIMESTAMP(NANOS) — each value
    // gets +789 ns of sub-µs noise that the reader must truncate away
    val nsDir = Files.createTempDirectory("graft-enc-ns").toString
    new java.io.File(s"$nsDir/events.parquet").mkdirs()
    val conf = spark.sparkContext.hadoopConfiguration
    val writer = ExampleParquetWriter.builder(HadoopOutputFile.fromPath(
        new Path(s"$nsDir/events.parquet/part-0.parquet"), conf))
      .withType(schemaNs).build()
    val gf = new SimpleGroupFactory(schemaNs)
    try baseUs.foreach { case (id, us, uid, typ, v, props) =>
      val g = gf.newGroup()
      g.add("event_id", id)
      g.add("ts", us * 1000L + 789L)
      g.add("user_id", uid)
      g.add("event_type", typ)
      g.add("value", v)
      g.add("props", props)
      writer.write(g)
    } finally writer.close()

    val fromUs = EventOps.events(spark, usDir).orderBy("event_id").collect()
    val fromNs = EventOps.events(spark, nsDir).orderBy("event_id").collect()
    assert(fromUs.length == 3 && fromNs.length == 3)
    // identical schema (ts normalized to TimestampType in both) and rows
    assert(EventOps.events(spark, usDir).schema("ts") ==
      EventOps.events(spark, nsDir).schema("ts"))
    fromUs.zip(fromNs).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
    // and the instants are the expected epoch-µs values
    assert(EventOps.events(spark, nsDir).select(unix_micros(col("ts")))
      .orderBy("ts").collect().map(_.getLong(0)).toSeq == baseUs.map(_._2))
  }

}
