package graft

import graft.operators.UnigramLm
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer invariants the DuckDB hash can't explain: DP
  * optimality (differential against brute-force segmentation
  * enumeration), tie determinism, char totality, and the learned-piece
  * compression behavior on a crafted corpus. */
class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkDocs(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  /** All segmentations of `w` into vocab pieces of length ≤ MaxPieceLen. */
  private def allSegs(w: String, vocab: Set[String]): Seq[Seq[String]] = {
    if (w.isEmpty) return Seq(Seq.empty)
    (1 to math.min(UnigramLm.MaxPieceLen, w.length)).flatMap { l =>
      val head = w.substring(0, l)
      if (vocab(head)) allSegs(w.substring(l), vocab).map(head +: _)
      else Seq.empty
    }
  }

  test("viterbi returns the min-cost segmentation (brute-force differential)") {
    val nlp = Map("a" -> 2.0, "b" -> 2.0, "ab" -> 1.5, "ba" -> 3.9, "aba" -> 3.4)
    for (w <- Seq("a", "ab", "aba", "abab", "ababa", "bb", "baba")) {
      val got = UnigramLm.viterbi(w, nlp)
      val best = allSegs(w, nlp.keySet)
        .map(s => (s.map(nlp).sum, s.mkString(UnigramLm.Sep, UnigramLm.Sep, "")))
        .minBy { case (c, p) => (math.rint(c * 1e6) / 1e6, p) }
      assert(got.mkString(UnigramLm.Sep, UnigramLm.Sep, "") == best._2,
        s"$w: got $got, want ${best._2}")
    }
  }

  test("viterbi tie breaks on the lexicographically smallest path") {
    // 'ab' via piece "ab" (cost 2.0) vs "a"+"b" (1.0+1.0): exact tie →
    // path '␟a␟b' < '␟ab' lexicographically ('a' then SEP(0x1F) < 'b')
    val nlp = Map("a" -> 1.0, "b" -> 1.0, "ab" -> 2.0)
    assert(UnigramLm.viterbi("ab", nlp) == Seq("a", "b"))
    // flip the tie the other way: make the single piece cheaper
    assert(UnigramLm.viterbi("ab", nlp.updated("ab", 1.9)) == Seq("ab"))
  }

  test("every word stays segmentable: chars are never pruned") {
    val docs = mkDocs(Seq.fill(50)("zz zz zz qqqq") :+ "rare xyz")
    val model = UnigramLm.trainOn(docs)
    val pieces = model.map(_._1).toSet
    for (c <- "zqrarexyz".map(_.toString).distinct)
      assert(pieces(c), s"char $c pruned")
    // the dominant words become single pieces (frequency-ranked seeding)
    assert(pieces("zz") && pieces("qqqq"))
  }

  test("learned pieces compress: dominant word costs 1 token, rare word falls toward chars") {
    val docs = mkDocs(Seq.fill(50)("abab abab") :+ "qq")
    val model = UnigramLm.trainOn(docs).map { case (p, _, nlp) => p -> nlp }.toMap
    assert(UnigramLm.viterbi("abab", model).length == 1)
    // encode query shape: n_unigram_tokens between n_ws_tokens and char count
    val enc = UnigramLm.encodeCounts(spark, "/root/testdata/sf0.001").collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2),
        s"doc ${r.getLong(0)}: fewer pieces than words")
    }
  }

  test("model probabilities are a distribution: exp(-nlp) sums to ~1") {
    val docs = mkDocs(Seq.fill(20)("join hash row batch scan"))
    val model = UnigramLm.trainOn(docs)
    val mass = model.map { case (_, _, nlp) => math.exp(-nlp) }.sum
    assert(math.abs(mass - 1.0) < 1e-3, s"probability mass $mass")
    // counts positive, nlp consistent with counts: smaller count → larger nlp
    val sorted = model.sortBy(_._2)
    assert(sorted.head._3 >= sorted.last._3 - 1e-9)
  }
}
