package graft

import graft.operators.{Imi, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IMI invariants: the product assignment must equal the brute-force
  * argmin over all k1² product cells (the additive-distance trick changes
  * COST, never the answer), and search with nprobe = k1² must degenerate
  * to the exact top-k — the same whole-pipeline invariant the flat IVF
  * carries. */
class ImiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("product assignment ≡ brute-force argmin over all k1² cells") {
    import spark.implicits._
    val k1 = 4
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (cl, cr) = Imi.models(base, k1)
    val got = Imi.assign(spark, dir, k1 = k1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val vecs = base.as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(got.length == vecs.length)
    got.zip(vecs).foreach { case ((id, l, r, cell), (vid, v)) =>
      assert(id == vid)
      // brute force: full distance to every product cell (concatenated
      // centroid), strict-< argmin with ascending cell_id tie-break
      var best = -1L; var bestD = Double.MaxValue
      for (i <- 0 until k1; j <- 0 until k1) {
        val cid = i.toLong * k1 + j
        val d = Similarity.dist2P(v.take(Imi.HalfDim), cl(i)) +
          Similarity.dist2P(v.drop(Imi.HalfDim), cr(j))
        if (d < bestD) { bestD = d; best = cid }
      }
      assert(cell == best, s"vec $id: product cell $cell != brute-force $best")
      assert(l * k1 + r == cell)
    }
  }

  test("search with nprobe = k1² degenerates to exact topK") {
    val k1 = 4
    val got = Imi.search(spark, dir, k1 = k1, nprobe = k1 * k1, k = 5).collect()
    val want = Similarity.topK(spark, dir, k = 5, nQueries = 50).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }
}
