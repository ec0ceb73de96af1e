package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** CCNet-style bigram-LM perplexity: hand-computed add-one estimates on a
  * tiny corpus, the Laplace floor on disjoint train/score corpora, token
  * hygiene (case folding, empty tokens, null text), a loop
  * reimplementation over the real sf0.001 corpus, and the no-cartesian
  * plan pin. */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(
      rows.map { case (id, t) => Row(id, t) }.asJava, schema)

  private def collectPpl(out: org.apache.spark.sql.DataFrame): Map[Long, (Long, Option[Double])] =
    out.collect().map { r =>
      r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toMap

  private def r3(x: Double): Double =
    BigDecimal(x).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-computed add-one bigram estimates on a tiny corpus") {
    val corpus = df(1L -> "a b a b", 2L -> "a b c")
    // c12: (a,b)=3, (b,a)=1, (b,c)=1; c1: a=3, b=2; V=3
    val pBA = 4.0 / 6; val pAB = 2.0 / 5; val pCB = 2.0 / 5
    val got = collectPpl(LanguageModel.scoreOn(corpus, corpus))
    val m1 = (math.log(pBA) + math.log(pAB) + math.log(pBA)) / 3
    val m2 = (math.log(pBA) + math.log(pCB)) / 2
    assert(got(1L) == ((3L, Some(r3(math.exp(-m1))))))
    assert(got(2L) == ((2L, Some(r3(math.exp(-m2))))))
  }

  test("disjoint corpora hit the Laplace floor: unseen context → ppl = V") {
    // train vocab {a,b} → V=2; every scored bigram has unseen context:
    // P = (0+1)/(0+2) = 1/2, so ppl = 2.0 exactly
    val got = collectPpl(LanguageModel.scoreOn(df(9L -> "x y z"), df(1L -> "a b")))
    assert(got(9L) == ((2L, Some(2.0))))
  }

  test("seen context, unseen bigram: P = 1/(c1+V)") {
    // train "a b a c": c1(a)=2... contexts: (a,b),(b,a),(a,c) → c1: a=2, b=1; V=3
    // score "a a": bigram (a,a) unseen, context a seen → P=(0+1)/(2+3)=1/5
    val got = collectPpl(LanguageModel.scoreOn(df(5L -> "a a"), df(1L -> "a b a c")))
    assert(got(5L) == ((1L, Some(5.0))))
  }

  test("token hygiene: case folds, runs of spaces drop, null/short → NULL ppl") {
    val corpus = df(1L -> "A  a", 2L -> null, 3L -> "solo", 4L -> "")
    val got = collectPpl(LanguageModel.scoreOn(corpus, corpus))
    // doc 1 tokenizes to [a, a] (case-folded, empty token dropped):
    // bigram (a,a) c12=1, c1=1, V=2 → P=2/3
    assert(got(1L) == ((1L, Some(1.5))))
    assert(got(2L) == ((0L, None)))
    assert(got(3L) == ((0L, None)))
    assert(got(4L) == ((0L, None)))
  }

  test("real corpus ≡ loop reimplementation (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("")).toSeq
    def toks(t: String): Array[String] =
      t.toLowerCase.split(" ", -1).filter(_.nonEmpty)
    val bis = texts.flatMap { case (id, t) =>
      val w = toks(t); w.indices.dropRight(1).map(i => (id, w(i), w(i + 1)))
    }
    val c12 = bis.groupBy(b => (b._2, b._3)).map { case (k, xs) => k -> xs.size.toLong }
    val c1 = bis.groupBy(_._2).map { case (k, xs) => k -> xs.size.toLong }
    val v = texts.flatMap(t => toks(t._2)).distinct.size.toLong
    val want = texts.map { case (id, t) =>
      val lnps = {
        val w = toks(t)
        w.indices.dropRight(1).map { i =>
          math.log((c12((w(i), w(i + 1))) + 1.0) / (c1(w(i)) + v))
        }
      }
      id -> (lnps.size.toLong,
        if (lnps.isEmpty) None else Some(math.exp(-lnps.sum / lnps.size)))
    }.toMap
    val got = collectPpl(LanguageModel.perplexity(spark, dir))
    assert(got.size == want.size && got.nonEmpty)
    want.foreach { case (id, (n, ppl)) =>
      val (gn, gp) = got(id)
      assert(gn == n, s"doc $id bigram count")
      (ppl, gp) match {
        case (None, None) =>
        case (Some(a), Some(b)) =>
          // b carries the operator's round-3 (grid ±5e-4); the loop sums
          // in document order vs Spark's partition order (~ulp noise)
          assert(math.abs(a - b) < 6e-4 + 1e-7 * a, s"doc $id: $a vs $b")
        case other => fail(s"doc $id: $other")
      }
    }
  }

  test("plan: no cartesian product; the only nested-loop join broadcasts the 1-row V") {
    val corpus = df(1L -> "a b c", 2L -> "b c d")
    val plan = LanguageModel.scoreOn(corpus, corpus)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
