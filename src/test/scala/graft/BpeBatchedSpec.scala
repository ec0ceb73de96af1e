package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Batched BPE training must be EXACTLY one-at-a-time BPE: the acceptance
  * rule (symbol-disjointness + strict dominance over created-pair bounds)
  * may only shorten a batch, never change the merge sequence. These
  * differentials drive the corpora that break naive batching. */
class BpeBatchedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def rows(df: DataFrame): Seq[(Int, String, String, Long)] =
    df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def assertEqualMerges(df: DataFrame, k: Int, lookahead: Int = 16): Unit = {
    val seq = rows(TextAnalysis.bpeMergesOn(df, k))
    val bat = rows(TextAnalysis.bpeMergesBatchedOn(df, k, lookahead))
    assert(bat == seq, s"\nbatched: $bat\nsequential: $seq")
  }

  test("real corpus: batched(k=24) ≡ sequential(k=24) at several lookaheads") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assertEqualMerges(df, 24, lookahead = 1) // degenerate = sequential
    assertEqualMerges(df, 24, lookahead = 8)
    assertEqualMerges(df, 24, lookahead = 32)
  }

  test("created-pair domination: merging top pair births a pair that outranks candidate 2") {
    // 'xab' × 40: top pair (a,b) cnt 40; merging creates (x,ab) cnt 40,
    // which in sequential order wins round 2 over (c,d) cnt 30. A batch
    // that accepted (c,d) alongside (a,b) would emit the wrong round 2.
    val df = corpus(Seq.fill(40)("xab").mkString(" ") + " " +
      Seq.fill(30)("cd").mkString(" "))
    assertEqualMerges(df, 4)
    val bat = rows(TextAnalysis.bpeMergesBatchedOn(df, 4))
    assert(bat.map(m => (m._2, m._3)).take(3) ==
      Seq(("a", "b"), ("x", "ab"), ("c", "d")), bat.toString)
  }

  test("shared-symbol candidates cannot co-apply: chain a·b·c") {
    // 'abc' words: (a,b) and (b,c) tie at full count; merging (a,b)
    // consumes every b, so sequential round 2 is NOT (b,c). Batching must
    // refuse the shared symbol.
    val df = corpus(Seq.fill(25)("abc").mkString(" "))
    assertEqualMerges(df, 3)
  }

  test("count ties with created-pair bound: strict-dominance stop") {
    // (a,b) and (c,d) are symbol-disjoint with EQUAL counts, and merging
    // (a,b) creates (z,ab) at that same count: candidate 2's cnt is NOT
    // strictly above the bound, so the batch must stop after (a,b) —
    // accepting (c,d) would still be correct here ((c,d) < (z,ab)? equal
    // counts order lexically: "c" < "z" wait — (c,d) sorts before (z,ab)
    // at equal cnt, so co-applying happens to coincide) — the point is
    // EQUALITY with sequential either way, which the differential pins.
    val df = corpus(Seq.fill(20)("zab").mkString(" ") + " " +
      Seq.fill(20)("cd").mkString(" "))
    assertEqualMerges(df, 4)
  }

  test("exhaustion inside a batch: fewer pairs than k stops cleanly") {
    val df = corpus("ab ab ab")
    val bat = rows(TextAnalysis.bpeMergesBatchedOn(df, 8))
    val seq = rows(TextAnalysis.bpeMergesOn(df, 8))
    assert(bat == seq && bat.length < 8)
  }

  test("repeated-symbol pair (a,a) batches safely") {
    val df = corpus(Seq.fill(12)("aaaa").mkString(" ") + " " +
      Seq.fill(9)("bc").mkString(" "))
    assertEqualMerges(df, 4)
  }

  // ── token-string collision guards (advisor r9) ─────────────────────
  // A 200k-corpus brute-force search over adversarial {a,b,c} and
  // periodic vocabularies found NO reachable state where a merge's
  // result string is already a live symbol under these greedy
  // replace-all semantics — so the collision hazards cannot be driven
  // through the replace loop from a character-split corpus. The guards
  // are unconditional anyway; these tests drive the factored acceptance
  // rule directly with the ledger states the loop cannot reach.

  test("collision ledger: accepted concat already a symbol stops the batch (pooled counts)") {
    // 'ab' is (ever) a symbol: accepting (a,b) must end the batch even
    // though (c,d) is symbol-disjoint and strictly dominates the bounds —
    // pre-existing (p,ab) pairs pool with created ones, so the created-
    // pair bound no longer caps the post-merge count of any (·,ab) pair.
    val top = Seq(("a", "b", 100L), ("c", "d", 40L))
    val acc = TextAnalysis.acceptBatchPrefix(top, Map(("a", "b") -> 10L), Set("ab"))
    assert(acc == Seq(("a", "b", 100L)))
  }

  test("collision guard: candidate carrying an about-to-be-created token is rejected") {
    // accepting (a,b) creates token 'ab'; candidate ('ab','c') measured
    // its count BEFORE that creation — stale, must stop the batch.
    val top = Seq(("a", "b", 100L), ("ab", "c", 40L), ("e", "f", 30L))
    val acc = TextAnalysis.acceptBatchPrefix(top, Map(("a", "b") -> 10L), Set.empty)
    assert(acc == Seq(("a", "b", 100L)))
  }

  test("collision guard: two decompositions of the same token string cannot co-apply") {
    // ('ab','c') and ('a','bc') both create 'abc': their created pairs
    // pool, so the second decomposition must stop the batch.
    val top = Seq(("ab", "c", 100L), ("a", "bc", 40L))
    val acc = TextAnalysis.acceptBatchPrefix(top, Map(("ab", "c") -> 10L), Set.empty)
    assert(acc == Seq(("ab", "c", 100L)))
  }

  test("acceptance rule: disjoint dominating candidates still co-apply") {
    val top = Seq(("a", "b", 100L), ("c", "d", 40L), ("e", "f", 30L))
    val acc = TextAnalysis.acceptBatchPrefix(top,
      Map(("a", "b") -> 20L, ("c", "d") -> 20L), Set.empty)
    assert(acc == top)
  }

  test("batch stats report accepted-prefix lengths summing to the merge count") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (out, lens) = TextAnalysis.bpeMergesBatchedWithStats(df, 24, 16)
    assert(out.count() == 24 && lens.sum == 24 && lens.forall(_ >= 1))
  }
}
