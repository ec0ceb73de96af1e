package graft

import graft.operators.Layout
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** The write-time layout contracts the 100 TB scan story rests on:
  * directory partitioning must actually prune (PartitionFilters in the
  * scan, fewer files touched), the within-file sort must actually produce
  * monotone parquet min/max stats (read straight from the footers), and
  * compaction must reduce file count without changing data. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-layout-$tag").toString + "/t"

  /** (min, max) of `column` per parquet file under `dir` (recursive),
    * straight from the footer block statistics. */
  private def footerRanges(dir: String, column: String): Seq[(Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[Path]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) b += f
      }
      b.result()
    }
    assert(files.nonEmpty, s"no parquet files under $dir")
    files.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala
        val stats = blocks.map(_.getColumns.asScala
          .find(_.getPath.toDotString == column)
          .getOrElse(fail(s"no column $column in $f")).getStatistics)
        (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
          stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
      } finally reader.close()
    }
  }

  private def parquetFileCount(dir: String): Long = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
    n
  }

  test("writeClustered: partition pruning fires and per-directory files are sort-disjoint") {
    val out = tmpDir("clustered")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Layout.writeClustered(docs, out, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"), maxRecordsPerFile = 40)

    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length > 1, "fixture needs several langs for pruning to mean anything")

    // pruning: the filtered scan must carry the predicate as a
    // PartitionFilter (pruned from the file index, not row-filtered)
    val one = spark.read.parquet(out).filter(col("lang") === langs.head)
    val n = one.count()
    assert(n > 0)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"), // not demoted to a data filter
      plan)

    // round-trip identity
    assert(spark.read.parquet(out).count() == docs.count())

    // layout: inside one lang directory, files cover DISJOINT doc_id
    // ranges (the repartition+sortWithinPartitions+maxRecordsPerFile
    // combination) — the precondition for min/max skipping on the key
    val firstLangDir = s"$out/lang=${langs.head}"
    val ranges = footerRanges(firstLangDir, "doc_id").sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping file ranges in $firstLangDir: $ranges")
      case _ => // single file — trivially disjoint
    }
  }

  test("writeRangeClustered: one global monotone run of the key across files") {
    val out = tmpDir("range")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Layout.writeRangeClustered(docs, out, sortCols = Seq("doc_id"), numFiles = 5)
    assert(spark.read.parquet(out).count() == docs.count())
    val ranges = footerRanges(out, "doc_id").sortBy(_._1)
    assert(ranges.length >= 4, s"expected ~5 range shards, got $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping range shards: $ranges")
      case _ =>
    }
    // a point predicate's pushed filter can now skip all but one file's
    // row groups: assert the filter IS pushed to the scan
    val probe = spark.read.parquet(out).filter(col("doc_id") === ranges.head._2)
    assert(probe.count() == 1)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(doc_id"), plan)
  }

  test("timestamp sort key: footers carry int64 micros stats, not stat-less INT96") {
    // Spark's default outputTimestampType=INT96 writes NO min/max
    // statistics — a timestamp-clustered table would silently get zero
    // row-group pruning. Layout forces TIMESTAMP_MICROS for its writes
    // (and restores the session conf afterwards).
    val out = tmpDir("tsrange")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    val ev = spark.range(0, 1000)
      .select(col("id"),
        to_timestamp(lit("2024-01-01 00:00:00")).plus(expr("make_interval(0,0,0,0,0,0,id*60)")).as("ts"))
    Layout.writeRangeClustered(ev, out, sortCols = Seq("ts"), numFiles = 4)
    assert(spark.conf.getOption("spark.sql.parquet.outputTimestampType") == prev,
      "Layout leaked the outputTimestampType conf")
    // footerRanges casts the stats to Long — which only exists at all for
    // the annotated int64 form — and the shards must be disjoint in µs
    val ranges = footerRanges(out, "ts").sortBy(_._1)
    assert(ranges.length >= 3, s"expected ~4 range shards, got $ranges")
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping ts range shards: $ranges")
      case _ =>
    }
  }

  test("compact: file count collapses to ceil(rows/target), data unchanged") {
    val out = tmpDir("compact")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(37).write.parquet(out) // deliberately fragmented
    val rows = docs.count()
    val checksumBefore = spark.read.parquet(out)
      .agg(sum(col("doc_id")), sum(length(col("text")))).collect()(0)
    assert(parquetFileCount(out) == 37)

    val (before, after) = Layout.compact(spark, out, targetRowsPerFile = 100)
    assert(before == 37)
    val expected = (rows + 99) / 100
    assert(after == expected, s"expected $expected files, got $after")
    assert(parquetFileCount(out) == expected)
    val reread = spark.read.parquet(out)
    assert(reread.count() == rows)
    assert(reread.agg(sum(col("doc_id")), sum(length(col("text")))).collect()(0)
      == checksumBefore)
  }
}
