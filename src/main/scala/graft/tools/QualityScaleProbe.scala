package graft.tools

import graft.operators.QualityClassifier
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 1×→100× scaling of the trained quality classifier: duplicate the sf0.1
  * corpus k× with re-keyed doc_ids (each copy keeps its source-derived
  * label, so class balance and token distributions are scale-invariant)
  * and time train+score end-to-end under the bench's toRdd action.
  * Usage: QualityScaleProbe [sfDir] [factors…] (default 1 10 100). */
object QualityScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 10, 100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        col("source").isin(QualityClassifier.PositiveSources: _*).as("label"),
        col("text"))
    // HOLDOUT mode (SPARK_GRAFT_HOLDOUT=1): split the BASE docs by the
    // md5 fold BEFORE replication — every replica of a training doc stays
    // on the training side, so the held-out half is genuinely disjoint
    // text, not a copy of the training set wearing a new id. Train on the
    // replicated fold-0 half, score the replicated fold-1 half, publish
    // the gate metrics beside the wall.
    val holdout = sys.env.get("SPARK_GRAFT_HOLDOUT").contains("1")
    factors.foreach { k =>
      def replicate(d: org.apache.spark.sql.DataFrame) = d
        .crossJoin(spark.range(k).select(col("id").as("rep")))
        .select((col("doc_id") * k + col("rep")).as("doc_id"),
          col("label"), col("text"))
        .repartition(spark.sparkContext.defaultParallelism)
      val t0 = System.nanoTime()
      if (holdout) {
        val fold = QualityClassifier.holdoutFold(col("doc_id"))
        val (model, totals) = QualityClassifier.train(spark,
          replicate(base.filter(fold === 0)), QualityClassifier.DefaultDim)
        val scored = QualityClassifier.score(replicate(base.filter(fold === 1)),
          model, totals, QualityClassifier.DefaultDim)
        val m = QualityClassifier.metrics(scored).collect()(0)
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[qualityscale-holdout] ${k}%4dx  held-out docs=${m.getAs[Long]("n")}%9d  " +
          f"tp=${m.getAs[Long]("tp")} fp=${m.getAs[Long]("fp")} fn=${m.getAs[Long]("fn")} " +
          f"tn=${m.getAs[Long]("tn")}  precision=${Option(m.get(5)).getOrElse("null")} " +
          f"recall=${Option(m.get(6)).getOrElse("null")} accuracy=${Option(m.get(7)).getOrElse("null")}  " +
          f"train+score wall ${s}%7.2f s")
      } else {
        val labeled = replicate(base)
        val (model, totals) = QualityClassifier.train(spark, labeled, QualityClassifier.DefaultDim)
        val scored = QualityClassifier.score(labeled, model, totals, QualityClassifier.DefaultDim)
        val n = scored.queryExecution.toRdd.count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[qualityscale] ${k}%4dx  docs=$n%9d  train+score wall ${s}%7.2f s")
      }
    }
    spark.stop()
  }
}
