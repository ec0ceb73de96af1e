package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** The off-engine BPE trainer vs the engine-paced sequential trainer —
  * merge-list equality on the real corpus and on corpora engineered at the
  * semantics' edges (ties under binary order, overlapping pairs,
  * multi-round merge chains, astral-plane symbols, exhaustion). */
class BpeLocalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mergesOf(df: org.apache.spark.sql.DataFrame): Seq[(Int, String, String, Long)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def docsDf(texts: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  private def sameMerges(texts: Seq[String], k: Int, clue: String): Unit = {
    val df = docsDf(texts)
    val local = mergesOf(TextAnalysis.bpeMergesLocalOn(df, k))
    val engine = mergesOf(TextAnalysis.bpeMergesOn(df, k))
    assert(local == engine, s"$clue: local $local != engine $engine")
  }

  test("local ≡ engine on the real sf0.001 corpus, k=12") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val local = mergesOf(TextAnalysis.bpeMergesLocalOn(df, 12))
    val engine = mergesOf(TextAnalysis.bpeMergesOn(df, 12))
    assert(local.nonEmpty)
    assert(local == engine)
  }

  test("min-rank local encode ≡ the engine's sequential replace chain; merges compress") {
    // the encoder leg of the scan→loop→encode round trip: per-word
    // min-rank application of a trained merge list must reproduce the
    // engine's k-chained replaces token-for-token
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val k = 8
    val merges = mergesOf(TextAnalysis.bpeMergesLocalOn(df, k)).map(m => (m._2, m._3))
    val local = TextAnalysis.bpeEncodeCountsLocalOn(df, merges)
      .collect().map(_.toString).toSeq
    val engine = TextAnalysis.bpeEncodeCountsOn(df, k)
      .collect().map(_.toString).toSeq
    assert(local == engine && local.nonEmpty)
    // compression sanity: trained merges strictly reduce total tokens vs
    // the zero-merge (per-codepoint) segmentation, and every document
    // still carries at least one token per whitespace word
    val withM = TextAnalysis.bpeEncodeCountsLocalOn(df, merges)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0).getLong(0)
    val noM = TextAnalysis.bpeEncodeCountsLocalOn(df, Seq.empty)
      .agg(org.apache.spark.sql.functions.sum("n_bpe_tokens")).collect()(0).getLong(0)
    assert(withM < noM, s"merges bought no compression: $withM vs $noM")
    TextAnalysis.bpeEncodeCountsLocalOn(df, merges).collect().foreach { r =>
      assert(r.getLong(1) >= r.getLong(2), s"fewer BPE tokens than words: $r")
    }
  }

  test("ties break identically under UTF-8 binary order") {
    // 'ab' and 'ba' tie at 2; engine picks (a,b) < (b,a); second round the
    // other pair; also a multi-byte vs ASCII tie: 'é' (0xC3A9) sorts after
    // every ASCII symbol in byte order
    sameMerges(Seq("ab ab ba ba", "éz éz az az"), 4, "two-way ties")
    sameMerges(Seq("xé xé xz xz"), 3, "multi-byte right-symbol tie")
  }

  test("overlapping pairs count with overlaps and merge left-to-right") {
    // 'aaaa': (a,a) counts 3 per occurrence; merge gives [aa,aa], next
    // round (aa,aa)
    sameMerges(Seq("aaaa aaaa aaa"), 4, "overlap runs")
  }

  test("merge chains: created symbols feed later rounds") {
    sameMerges(Seq("abc abc abc abcd abcd"), 6, "chained merges")
  }

  test("astral-plane symbols are single codepoints in both trainers") {
    val rocket = new String(Character.toChars(0x1F680))
    sameMerges(Seq(s"$rocket$rocket a$rocket a$rocket"), 3, "astral symbols")
  }

  test("exhaustion: both stop at the same round when nothing is left to merge") {
    val df = docsDf(Seq("ab ab"))
    val local = mergesOf(TextAnalysis.bpeMergesLocalOn(df, 10))
    val engine = mergesOf(TextAnalysis.bpeMergesOn(df, 10))
    assert(local == engine)
    assert(local.size < 10, "tiny corpus must exhaust before k")
  }

  test("vocabulary cap fails loudly, before any collect-sized work") {
    val df = docsDf(Seq("one two three four five six"))
    val e = intercept[IllegalArgumentException](
      TextAnalysis.bpeMergesLocalOn(df, 2, maxVocab = 3))
    assert(e.getMessage.contains("maxVocab"))
  }
}
