package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

import scala.jdk.CollectionConverters._

/** Encoding-adaptive parquet table reader — the mixed-writer-lake contract
  * for EVERY table, not just events (round 5 broke when one hard-coded
  * reader met a regenerated encoding; round 6 generalized the fix).
  *
  * Timestamp columns are normalized to `TimestampType` (µs instants under
  * the UTC session timezone all Graft sessions pin) regardless of the
  * writer's physical choice:
  *   - TIMESTAMP(NANOS): Spark 4 refuses ns natively; the legacy
  *     nanosAsLong flag surfaces it as LongType — indistinguishable from a
  *     genuine long column in the Spark schema, so the parquet FOOTER
  *     decides which long columns are really timestamps. ns → µs by
  *     integral `div` (ns epoch values exceed 2^53; a double would lose
  *     precision), matching DuckDB's ns→µs read.
  *   - TIMESTAMP_NTZ (µs/ms, isAdjustedToUTC=false): epoch-preserving cast.
  *   - TIMESTAMP (tz-adjusted): passes through.
  * Encoding is read from ONE footer: a table whose files disagree on the
  * timestamp encoding is not supported (Spark's own scan would refuse the
  * merge anyway); [[graft.tools.SchemaCanary]] polices the catalog level.
  */
object Tables {

  /** Column path → "PHYSICAL[:LOGICAL]" (as parquet-mr prints them) from
    * the first parquet footer at `path` (a file, or a directory of part
    * files). */
  def describe(path: Path, conf: Configuration): Map[String, String] = {
    val fs = path.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(path).isFile) path
      else {
        val it = fs.listFiles(path, true)
        var found: Path = null
        while (found == null && it.hasNext) {
          val f = it.next().getPath
          if (f.getName.endsWith(".parquet")) found = f
        }
        require(found != null, s"no parquet file under $path")
        found
      }
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try reader.getFooter.getFileMetaData.getSchema.getColumns.asScala.map { cd =>
      val pt = cd.getPrimitiveType
      val logical = Option(pt.getLogicalTypeAnnotation).map(":" + _.toString).getOrElse("")
      cd.getPath.mkString(".") -> (pt.getPrimitiveTypeName.toString + logical)
    }.toMap
    finally reader.close()
  }

  /** Read `<dir>/<name>.parquet` with timestamp normalization (see object
    * doc). The nanos flag is consulted at schema-inference time only;
    * save-and-restore keeps it from leaking session-wide. */
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    val raw =
      try spark.read.parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    lazy val footer = describe(new Path(path), spark.sparkContext.hadoopConfiguration)
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case LongType if footer.get(f.name).exists(_.startsWith("INT64:TIMESTAMP(NANOS")) =>
          df.withColumn(f.name, timestamp_micros(expr(s"`${f.name}` div 1000")))
        case TimestampNTZType =>
          df.withColumn(f.name, col(f.name).cast(TimestampType))
        case _ => df
      }
    }
  }
}
