package graft

import graft.operators.{Sampling, Sharding}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Temperature sampling and shard-manifest semantics: the md5 coin is a
  * real uniform, the α=0.5 acceptance follows k/√n exactly, and the shard
  * manifest is a deterministic total order with exact running totals. */
class ShardingSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"

  test("temperature sample: accept prob is k/√n_lang; expected take ∝ √n") {
    val rows = Sampling.temperatureSample(spark, dir, k = 4.0).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rows.length == docs.count())
    val nLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (lang, u, a, kept) =
        (r.getString(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))
      assert(u >= 0.0 && u < 1.0)
      val want = math.min(1.0, 4.0 / math.sqrt(nLang(lang).toDouble))
      assert(math.abs(a - want) < 1e-6, s"$lang: accept_prob $a, want $want")
      // rounded columns can't decide the boundary, but away from it they do
      if (math.abs(u - a) > 1e-5) assert(kept == (u < a), s"row $r")
    }
    // high-resource langs are down-sampled RELATIVELY: kept fraction
    // should track a_s, so kept counts ≈ √n·k — en (218 docs) keeps a
    // smaller share than fr (64 docs)
    val keptByLang = rows.filter(_.getBoolean(4))
      .groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val enShare = keptByLang("en").toDouble / nLang("en")
    val frShare = keptByLang("fr").toDouble / nLang("fr")
    assert(enShare < frShare,
      s"α-smoothing must favor low-resource strata: en $enShare vs fr $frShare")
    // and the realized take per stratum is within binomial noise of k·√n
    nLang.foreach { case (lang, n) =>
      val expect = math.min(n.toDouble, 4.0 * math.sqrt(n.toDouble))
      val got = keptByLang.getOrElse(lang, 0).toDouble
      val sd = math.sqrt(expect) * 3 + 3
      assert(math.abs(got - expect) <= sd, s"$lang: kept $got, expect $expect ± $sd")
    }
  }

  test("shard manifest: deterministic total order, exact running totals") {
    val m = Sharding.shardManifest(spark, dir, shards = 16).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.length == docs.size, "every document lands in exactly one shard")
    assert(m.map(_.getLong(0)).toSet == docs.keySet)
    m.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      val inOrder = rows.sortBy(_.getLong(2))
      assert(inOrder.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq,
        s"shard $shard: pos is a dense 1..n ranking")
      var cum = 0L
      inOrder.foreach { r =>
        cum += docs(r.getLong(0))
        assert(r.getLong(3) == cum, s"shard $shard pos ${r.getLong(2)}: cum_chars")
      }
    }
    // balance: md5 spreads uniformly — no shard dominates
    val sizes = m.groupBy(_.getInt(1)).map(_._2.length)
    assert(sizes.size == 16 && sizes.max <= sizes.min * 3,
      s"shard sizes ${sizes.toSeq.sorted}")
    // rerun ≡ run (the whole point vs random())
    val again = Sharding.shardManifest(spark, dir, shards = 16).collect()
    assert(m.toSeq == again.toSeq)
  }
}
