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

  // --- soft EM (round 13): the spec-only pins for trainSoftOn ----------

  test("forward-backward Z and expected counts are exact vs brute-force enumeration") {
    val nlp = Map("a" -> 2.0, "b" -> 2.0, "ab" -> 1.5, "ba" -> 3.9, "aba" -> 3.4)
    for (w <- Seq("a", "ab", "aba", "abab", "ababa", "bb", "baba")) {
      val segs = allSegs(w, nlp.keySet)
      val probs = segs.map(s => s -> math.exp(-s.map(nlp).sum))
      val z = probs.map(_._2).sum
      val expect = probs.flatMap { case (s, pr) => s.map(p => p -> pr / z) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val (got, lz) = UnigramLm.forwardBackward(w, nlp)
      assert(math.abs(lz - math.log(z)) < 1e-12, s"$w: ll $lz vs ${math.log(z)}")
      assert(got.keySet == expect.keySet, s"$w: ${got.keySet} vs ${expect.keySet}")
      expect.foreach { case (p, e) =>
        assert(math.abs(got(p) - e) < 1e-12, s"$w piece $p: ${got(p)} vs $e") }
      // posterior sanity: expected piece count per word = expected parse
      // length, which lies between 1 and the word's length
      val totalPieces = got.values.sum
      assert(totalPieces >= 1.0 - 1e-12 && totalPieces <= w.length + 1e-12)
    }
  }

  test("posterior concentrates on a dominant parse (soft recovers hard at the limit)") {
    val nlp = Map("a" -> 10.0, "b" -> 10.0, "ab" -> 0.1)
    val (cnt, _) = UnigramLm.forwardBackward("abab", nlp)
    // best parse ab|ab costs 0.2; every alternative uses >= 2 single chars
    // (cost >= 20), so its posterior mass is ~e^-20
    assert(math.abs(cnt("ab") - 2.0) < 1e-6, s"$cnt")
    assert(cnt.getOrElse("a", 0.0) < 1e-6 && cnt.getOrElse("b", 0.0) < 1e-6)
    assert(UnigramLm.viterbi("abab", nlp) == Seq("ab", "ab"))
  }

  test("soft-EM corpus log-likelihood is non-decreasing across rounds") {
    // real repeated structure; every char frequent, so the +1 keep-alive
    // perturbation is negligible against true counts
    val docs = mkDocs(Seq.fill(30)("abab abba baab abab") ++
      Seq.fill(10)("bbbb aaaa abab") ++ Seq.fill(5)("ba ab aa bb"))
    val wordsDf = UnigramLm.wordsOf(docs)
    val words = wordsDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seed = UnigramLm.seedCounts(wordsDf)
    val (_, lls) = UnigramLm.trainSoftLocal(words, seed, iters = 5)
    assert(lls.size == 5)
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"EM log-likelihood decreased: $lls")
    }
    // and the rounds genuinely move (not a fixed point from the start)
    assert(lls.last > lls.head, s"EM never improved: $lls")
  }

  test("distributed soft trainer equals the driver-local reference (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dist = UnigramLm.trainSoftOn(docs, iters = UnigramLm.EmIters)
    val wordsDf = UnigramLm.wordsOf(docs)
    val words = wordsDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val seed = UnigramLm.seedCounts(wordsDf)
    val (local, _) = UnigramLm.trainSoftLocal(words, seed, UnigramLm.EmIters)
    // maps with tolerance, not sequences: distributed double-sum order
    // differs from the local accumulation order by ulps
    val dm = dist.map { case (p, n, c) => p -> (n, c) }.toMap
    val lm = local.map { case (p, n, c) => p -> (n, c) }.toMap
    assert(dm.keySet == lm.keySet,
      s"only dist: ${dm.keySet -- lm.keySet}; only local: ${lm.keySet -- dm.keySet}")
    dm.foreach { case (p, (n, c)) =>
      assert(math.abs(n - lm(p)._1) <= 1e-6 * math.max(1.0, lm(p)._1), s"count $p")
      assert(math.abs(c - lm(p)._2) <= 2e-6, s"nlp $p")
    }
  }

  test("soft and hard training agree on vocabulary and ranking on the sf corpus") {
    // not bit-identical (different E-steps) but the same corpus structure:
    // the final kept piece set should substantially overlap and single
    // chars are never pruned by either
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hard = UnigramLm.trainOn(docs).map(_._1).toSet
    val soft = UnigramLm.trainSoftOn(docs).map(_._1).toSet
    val chars = hard.filter(p => p.codePointCount(0, p.length) == 1)
    assert(chars.subsetOf(soft), "soft must keep every single char hard kept")
    val overlap = (hard & soft).size.toDouble / (hard | soft).size
    assert(overlap >= 0.6, f"piece-set Jaccard $overlap%.2f too low: soft and hard diverged")
  }
}
