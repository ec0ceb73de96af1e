package graft

import graft.operators.ExactSubstr
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Substring-level exact dedup (ExactSubstr): planted-span boundary
  * checks, owner/cut policy, island merging, and kernel self-consistency —
  * the corpus-level hash equality with DuckDB lives in the
  * q_substring_dup / q_substring_cut oracles. */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def spans(df: DataFrame, L: Int): Seq[(Long, Long, Long, Long)] =
    ExactSubstr.spansOn(df, L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  private def cuts(df: DataFrame, L: Int): Map[Long, (Long, Long, String)] =
    ExactSubstr.cutOn(df, L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("planted shared block: exact span boundaries in both documents") {
    val block = "B" * 30 + "SHARED-BOILERPLATE-" + "C" * 31 // 80 cps
    val a = "a" * 100 + block + "x" * 50
    val b = "y" * 10 + block + "z" * 200
    val df = corpus(1L -> a, 2L -> b)
    val got = spans(df, 50)
    // doc 1: block occupies [101, 180]; 80-cp block has 31 L-gram hits
    assert(got.contains((1L, 101L, 180L, 31L)), got.toString)
    assert(got.contains((2L, 11L, 90L, 31L)), got.toString)
    assert(got.size == 2)
    // cut: doc 1 (owner) intact, doc 2 loses exactly the block
    val c = cuts(df, 50)
    assert(c(1L) == ((0L, 0L, a)))
    assert(c(2L) == ((1L, 80L, "y" * 10 + "z" * 200)))
  }

  test("within-document repetition alone is NOT a duplicate") {
    val rep = ("m" * 25 + "n" * 25) * 3 // same 50-gram repeats inside one doc
    val df = corpus(1L -> rep, 2L -> ("q" * 200))
    assert(spans(df, 50).isEmpty)
    val c = cuts(df, 50)
    assert(c(1L)._3 == rep && c(2L)._3 == "q" * 200)
  }

  test("documents shorter than L never participate; null text is empty") {
    val df = corpus(1L -> "short", 2L -> null, 3L -> ("k" * 60), 4L -> ("k" * 60))
    val got = spans(df, 50)
    assert(got.map(_._1).toSet == Set(3L, 4L))
    val c = cuts(df, 50)
    assert(c(1L)._3 == "short" && c(2L)._3 == "")
    assert(c(3L)._3 == "k" * 60, "owner keeps")
    assert(c(4L)._3 == "", "non-owner fully cut")
    assert(c(4L) == ((1L, 60L, "")))
  }

  test("two separated shared blocks merge into two islands, not one") {
    val b1 = "P" * 60
    val b2 = "Q" * 60
    val a = b1 + "-" * 80 + b2
    val other = "u" * 30 + b1 + "v" * 90 + b2 + "w" * 5
    val got = spans(corpus(1L -> a, 2L -> other), 50)
    assert(got.count(_._1 == 1L) == 2, got.toString)
    assert(got.count(_._2 == 31L) <= 2) // doc2's first block starts at 31
    val doc1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(s => (s._2, s._3)) == Seq((1L, 60L), (141L, 200L)))
  }

  test("ownership is per GRAM: a later doc owns content absent from earlier docs") {
    val shared23 = "R" * 70 // appears only in docs 2 and 3 → doc 2 owns it
    val df = corpus(1L -> ("a" * 120), 2L -> (shared23 + "b" * 40),
      3L -> ("c" * 15 + shared23))
    val c = cuts(df, 50)
    assert(c(2L)._3 == shared23 + "b" * 40, "doc 2 is the owner")
    assert(c(3L)._3 == "c" * 15, "doc 3's copy is cut")
  }

  test("rolling kernel ≡ direct Horner hashing at every position (incl. non-BMP)") {
    val text = "ab𝒳cde𝒳fghij" * 9 // astral-plane 𝒳 exercises codepoint indexing
    val L = 7
    val got = ExactSubstr.gramHashes(text, L)
    val cps = text.codePoints().toArray
    assert(got.length == cps.length - L + 1)
    got.foreach { case (pos, h1, h2) =>
      val window = cps.slice(pos.toInt - 1, pos.toInt - 1 + L)
      val d1 = window.foldLeft(0L)((h, c) => (h * 31 + c) % 1048573L)
      val d2 = window.foldLeft(0L)((h, c) => (h * 37 + c) % 999983L)
      assert((h1, h2) == ((d1, d2)), s"pos $pos")
    }
  }

  test("primitive-array kernel ≡ tuple kernel element-for-element (packed)") {
    val texts = Seq("", "short", "a" * 49, "a" * 50, "ab𝒳cde𝒳fghij" * 9,
      "x" * 200 + "y" * 200, null)
    texts.foreach { t =>
      val tuples = ExactSubstr.gramHashes(t, 50)
      val (p, hs) = ExactSubstr.gramHashArrays(t, 50)
      assert(p.length == tuples.length && hs.length == tuples.length,
        s"length for ${Option(t).map(_.take(20))}")
      tuples.zipWithIndex.foreach { case ((tp, t1, t2), i) =>
        // the packed key is bijective in (h1, h2): both moduli < 2^20
        assert((p(i), hs(i)) == ((tp, (t1 << 20) | t2)), s"index $i")
      }
    }
  }

  test("cut reassembly is lossless on the kept side: spans ∪ kept == original") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val orig = df.collect().map(r => r.getLong(0) ->
      Option(r.getString(1)).getOrElse("")).toMap
    val sp = ExactSubstr.spansOn(df, 50).collect()
      .groupBy(_.getLong(0))
    val c = cuts(df, 50)
    // every doc's cut-char count is bounded by its dup-span coverage, and
    // kept length + cut chars == original length (codepoints)
    c.foreach { case (id, (nSpans, nChars, cutText)) =>
      val n = orig(id).codePointCount(0, orig(id).length)
      val kept = cutText.codePointCount(0, cutText.length)
      assert(kept + nChars == n, s"doc $id: $kept + $nChars != $n")
      val dupCover = sp.get(id).map(_.map(r => r.getLong(2) - r.getLong(1) + 1).sum).getOrElse(0L)
      assert(nChars <= dupCover, s"doc $id cuts more than its dup coverage")
      if (nSpans == 0) assert(cutText == orig(id))
    }
    // at least one real document was actually cut at sf0.001
    assert(c.values.exists(_._1 > 0))
  }

  test("materialization tiers are row-equal: recompute ≡ checkpoint on real data") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def canon(d: DataFrame): Seq[String] =
      d.collect().map(_.toString).toSeq.sorted
    assert(canon(ExactSubstr.spansOn(df, 50, materialize = "recompute"))
      == canon(ExactSubstr.spansOn(df, 50, materialize = "checkpoint")))
    assert(canon(ExactSubstr.cutOn(df, 50, materialize = "recompute"))
      == canon(ExactSubstr.cutOn(df, 50, materialize = "checkpoint")))
    // bogus tier rejected loudly
    intercept[IllegalArgumentException](ExactSubstr.spansOn(df, 50, materialize = "disk"))
  }

  test("recompute tier pins no storage blocks; checkpoint tier does; ordered=false is sort-free") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val sp = ExactSubstr.spansOn(df, 50, materialize = "recompute", ordered = false)
    assert(sp.count() > 0)
    val afterRecompute = spark.sparkContext.getPersistentRDDs.keySet
    // the tier's whole point: the gram-position relation (one row per
    // corpus codepoint — PB-scale at 100 TB) must NOT be pinned
    assert((afterRecompute -- before).isEmpty,
      "recompute tier must not pin executor-storage blocks")
    // since the r15 window fusion spansOn has no multi-referenced
    // intermediate — NEITHER tier pins blocks there
    assert(ExactSubstr.spansOn(df, 50, materialize = "checkpoint", ordered = false).count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- afterRecompute).isEmpty,
      "post-fusion spansOn has nothing to materialize on any tier")
    // cutOn still carries one (the thrice-referenced cut-span relation):
    // the checkpoint tier pins it, the recompute tier must not —
    // differential proof the probe above measures the right thing
    assert(ExactSubstr.cutOn(df, 50, materialize = "recompute", ordered = false).count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- afterRecompute).isEmpty,
      "recompute-tier cutOn must not pin executor-storage blocks")
    assert(ExactSubstr.cutOn(df, 50, materialize = "checkpoint", ordered = false).count() > 0)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- afterRecompute).nonEmpty,
      "checkpoint-tier cutOn pins its cut-span relation")
    // the total-order sort is the oracle's, not the operator's
    val topSort = sp.queryExecution.optimizedPlan.toString.linesIterator
      .takeWhile(l => !l.contains("Window")).exists(_.trim.startsWith("Sort"))
    assert(!topSort, "ordered=false must not globally sort the output")
  }
}
