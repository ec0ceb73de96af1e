package graft

import graft.operators.Search
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RRF fusion invariants: the fused score is exactly the sum of the
  * legs' reciprocal ranks (hand-recomputed from the standalone legs),
  * single-leg docs carry one term, and a doc ranked first in BOTH legs
  * dominates any single-leg doc. */
class HybridRrfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("fused scores recompute from the standalone legs") {
    val n = 50
    val sparseRanks = Search.bm25(spark, dir, Search.DefaultTerms, n)
      .collect().sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
      .zipWithIndex.map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1) }.toMap
    val denseRanks = graft.operators.Similarity.topK(spark, dir, k = n, nQueries = 1)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Int]("rk")).toMap
    val fused = Search.hybridRrf(spark, dir).collect()
    assert(fused.length == Search.DefaultK)
    fused.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = sparseRanks.get(id).map(rk => 1.0 / (Search.RrfK + rk)).getOrElse(0.0) +
        denseRanks.get(id).map(rk => 1.0 / (Search.RrfK + rk)).getOrElse(0.0)
      val wantR = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - wantR) < 1e-9, s"doc $id")
      // rank columns carry the legs' ranks (null when a leg missed)
      assert(Option(r.getAs[Integer]("rank_s")).map(_.toInt) == sparseRanks.get(id))
      assert(Option(r.getAs[Integer]("rank_d")).map(_.toInt) == denseRanks.get(id))
    }
    // descending fused order with doc_id tie-break
    val keys = fused.map(r => (r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(keys.sliding(2).forall { case Array((a, i1), (b, i2)) =>
      a > b || (a == b && i1 < i2) })
  }

  test("both-leg membership dominates: top-1+top-1 beats any single leg") {
    // 1/(60+1) + 1/(60+1) > 1/(60+1) + 0 — structural, but assert it on
    // the real output: any doc present in both legs outranks every doc
    // present in exactly one leg at equal-or-worse ranks
    val fused = Search.hybridRrf(spark, dir).collect()
    val both = fused.filter(r => r.getAs[Integer]("rank_s") != null &&
      r.getAs[Integer]("rank_d") != null)
    val single = fused.filter(r => r.getAs[Integer]("rank_s") == null ||
      r.getAs[Integer]("rank_d") == null)
    if (both.nonEmpty && single.nonEmpty) {
      val worstBoth = both.map(_.getAs[Double]("rrf")).min
      val bestSingleCap = 1.0 / (Search.RrfK + 1)
      assert(single.map(_.getAs[Double]("rrf")).max <= bestSingleCap + 1e-9)
      // a doc in both legs always carries two positive terms
      assert(worstBoth > 1.0 / (Search.RrfK + 50) - 1e-9)
    }
  }
}
