package graft

import graft.tools.SchemaCanary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The testdata pre-flight: green on the real dirs, and a deliberately
  * mutated local copy must produce a violation NAMING the drifted column —
  * the "one clear message" that round 5's silent ts regeneration lacked. */
class SchemaCanarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  test("real testdata dirs pass clean") {
    for (sf <- Seq("sf0.001", "sf0.01"); d = s"/root/testdata/$sf"
         if new java.io.File(d).isDirectory) {
      val v = SchemaCanary.check(d, conf)
      assert(v.isEmpty, v.mkString("; "))
    }
  }

  test("drifted ts encoding fires a violation naming events.ts") {
    val dir = Files.createTempDirectory("graft-canary").toString
    // symlink the untouched tables so only events drifts
    for (t <- SchemaCanary.catalog.keys if t != "events")
      Files.createSymbolicLink(Paths.get(s"$dir/$t.parquet"),
        Paths.get(s"/root/testdata/sf0.001/$t.parquet"))
    // the mutation: ts written as a PLAIN INT64 (epoch µs, no logical
    // annotation) — plausible generator drift that silently changes the
    // column's meaning
    graft.operators.EventOps.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", unix_micros(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val v = SchemaCanary.check(dir, conf)
    assert(v.nonEmpty)
    assert(v.exists(m => m.contains("events.ts") && m.contains("DRIFTED") &&
      m.contains("found INT64")), v.mkString("; "))
    // nothing else fires — the message points at exactly the drifted column
    assert(v.forall(_.contains("events.ts")), v.mkString("; "))
  }

  test("missing expected column fires MISSING with the column named") {
    val dir = Files.createTempDirectory("graft-canary-miss").toString
    for (t <- SchemaCanary.catalog.keys if t != "documents")
      Files.createSymbolicLink(Paths.get(s"$dir/$t.parquet"),
        Paths.get(s"/root/testdata/sf0.001/$t.parquet"))
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .drop("lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val v = SchemaCanary.check(dir, conf)
    assert(v.exists(_.contains("documents.lang: MISSING")), v.mkString("; "))
  }
}
