package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** Featurization operators: hashed tf and BPE pair counts must agree with
  * plain-loop reimplementations over the collected corpus. */
class TextFeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private def texts: Seq[(Long, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toSeq

  test("hashed features ≡ loop reimplementation (hash included)") {
    val got = TextAnalysis.hashedFeatures(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val want = texts.flatMap { case (id, t) =>
      val toks = t.split(" ", -1)
      val feats = toks.map { tok =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(tok.getBytes("UTF-8")).take(7).map("%02x".format(_)).mkString
        // 13 hex digits = 52 bits (14 hex chars = 7 bytes; drop the last nibble)
        (java.lang.Long.parseLong(hex.take(13), 16) % 64).toInt
      }
      feats.groupBy(identity).map { case (f, xs) =>
        (id, f) -> BigDecimal(xs.length.toDouble / toks.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    assert(got.size == want.size && got.nonEmpty)
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-9, s"$k: ${got(k)} vs $v") }
  }

  test("BPE pair counts ≡ loop reimplementation; top cut deterministic") {
    val got = TextAnalysis.bpePairCounts(spark, dir, topN = 50).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == 50)
    val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
    val wordFreq = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(_._2.split(" ", -1).filter(_.length >= 2)
      .foreach(w => wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1))
    wordFreq.foreach { case (w, f) =>
      w.sliding(2).foreach { p =>
        val k = (p.substring(0, 1), p.substring(1, 2))
        counts(k) = counts.getOrElse(k, 0L) + f
      }
    }
    val want = counts.toSeq.map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(50)
    assert(got.toSeq == want, s"\n got=${got.take(5).toSeq}\nwant=${want.take(5)}")
  }
}
