package graft

import graft.operators.{Packing, Privacy, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators: PII redaction, stratified sampling, sequence
  * packing. The DuckDB oracle hash-checks the exact outputs; these specs
  * pin the semantic invariants the hash can't explain. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("pii redaction: every planted identifier is counted and replaced") {
    val out = Privacy.piiRedact(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, red) = (r.getLong(0), r.getString(5))
      if (id % 3 == 0) {
        assert(r.getInt(1) >= 1, s"cust $id: email not counted")
        assert(red.contains("[EMAIL]") && !red.contains("@example.com.br"),
          s"cust $id: email not redacted: $red")
      }
      if (id % 4 == 0) assert(r.getInt(3) >= 1 && red.contains("[CPF]"), s"cust $id: $red")
      if (id % 5 == 0) assert(r.getInt(4) >= 1 && red.contains("[PHONE]"), s"cust $id: $red")
      if (id % 7 == 0) assert(r.getInt(2) >= 1 && red.contains("[CNPJ]"), s"cust $id: $red")
      // nothing matching any pattern survives redaction
      Seq(Privacy.EmailRe, Privacy.CnpjRe, Privacy.CpfRe, Privacy.PhoneRe).foreach { re =>
        assert(!re.r.findFirstIn(red).isDefined, s"cust $id: unredacted PII in: $red")
      }
    }
  }

  test("repetition metrics: crafted duplicates produce exact counts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq(
      (1L, "aaa aaa aaa"),       // word ×3; bigram "aaa aaa" ×2
      (2L, "x y x y x"),         // x×3 y×2; bigrams: "x y"×2, "y x"×2
      (3L, "solo")               // 1 word, 0 bigrams
    ).toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextAnalysis.repetition(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out(1L) == ((3L, 1L, 3L, 2L, 1L, 2L)))
    assert(out(2L) == ((5L, 2L, 3L, 4L, 2L, 2L)))
    assert(out(3L) == ((1L, 1L, 1L, 0L, 0L, 0L)))
  }

  test("stratified sample: quota per language, deterministic, subset of corpus") {
    val quota = 20
    val s1 = Sampling.stratifiedSample(spark, sf, quota)
    val rows = s1.collect()
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val corpusPerLang = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(quota.toLong, corpusPerLang(lang)),
        s"$lang: sampled $n of ${corpusPerLang(lang)} with quota $quota")
    }
    // deterministic across executions
    val again = Sampling.stratifiedSample(spark, sf, quota).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // ranks are 1..n contiguous within each stratum
    rows.groupBy(_.getString(1)).values.foreach { g =>
      assert(g.map(_.getLong(2)).sorted.toSeq == (1L to g.length.toLong))
    }
  }

  test("learned curation: dedup runs FIRST (duplicates cannot move the thresholds); short docs degrade out") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft-curlearn").toString
      rows.toDF("doc_id", "source", "text").write.parquet(s"$dir/documents.parquet")
      dir
    }
    val base = (0 until 40).map { i =>
      val src = if (i % 5 == 0) "src0" else "srcX"
      val words = (0 until 8 + i % 7).map(j => s"w${(i * 13 + j * 7) % 23}")
      (i.toLong, src, words.mkString(" "))
    } :+ ((40L, "srcX", "solo")) // one-token doc: no bigrams, cannot be banded
    val clean = mk(base)
    // duplicate SWARM: exact copies of a few negative docs at higher ids —
    // if dedup ran after the gates, these would shift the score median and
    // the perplexity tercile and change which docs survive
    val dups = mk(base ++ (100 until 130).map(i => (i.toLong, "srcX", base(1)._3)))
    val a = Sampling.curationLearned(spark, clean).collect().map(_.toString).toSeq
    val b = Sampling.curationLearned(spark, dups).collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty,
      "exact duplicates leaked past the dedup stage into the learned thresholds")
    // degradation: the bigram-less doc is dropped, not crashed on
    assert(!a.exists(_.contains("40,")), "one-token doc cannot be perplexity-banded")
    // the gates BITE: the composed output is a strict subset of the corpus
    assert(a.length < 40)
  }

  test("curation v3: rule gates run FIRST and bite; survivors carry CLEANED text downstream") {
    import graft.operators.TextAnalysis
    // funnel on the real corpus: raw → c4 page verdict → gopher verdict.
    // Reconstruct the same stages the pipeline composes and check each
    // strictly reduces (both-ways discrimination at every gate).
    val paged = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text")
      .withColumn("__page", concat(TextAnalysis.c4SyntheticPage,
        when(col("doc_id") % 3 === 0,
          lit("\nand that have with of to be the.")).otherwise(lit(""))))
    val n0 = paged.count()
    val afterC4 = TextAnalysis.c4CleanOn(paged, col("__page"))
      .filter(col("kept"))
      .select(col("doc_id"), col("source"), col("clean_text").as("text"))
    val n1 = afterC4.count()
    val n2 = TextAnalysis.gopherQualityOn(afterC4, col("text"))
      .filter(col("kept")).count()
    assert(n1 > 0 && n1 < n0, s"C4 gate degenerate: $n1/$n0")
    assert(n2 > 0 && n2 < n1, s"Gopher gate degenerate: $n2/$n1")
    // the composed output exists and is a subset of the gopher survivors
    val out = Sampling.curationRules(spark, sf).collect()
    assert(out.nonEmpty && out.length <= n2,
      s"pipeline output ${out.length} vs rule survivors $n2")
    // downstream consumed CLEANED text: a surviving doc's predicted_lang
    // was computed on line-filtered text, so every survivor must also
    // survive when scored standalone on its cleaned text (consistency,
    // not re-derivation): survivors' doc_ids ⊂ rule survivors' doc_ids
    val ruleIds = TextAnalysis.gopherQualityOn(afterC4, col("text"))
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => ruleIds.contains(r.getLong(0))))
    // and this test's stage-by-stage reconstruction must BE the shared
    // prefix the pipeline ships (Sampling.ruleGates) — catches de-sync
    val shared = Sampling.ruleGates(spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(shared == ruleIds, "spec reconstruction diverged from Sampling.ruleGates")
  }

  test("curation v3: the rule-gate prefix adds ZERO shuffles over v2's plan") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    val v2 = exchanges(Sampling.curationLearned(spark, sf))
    val v3 = exchanges(Sampling.curationRules(spark, sf))
    assert(v3 == v2,
      s"rule gates grew the shuffle count: v2=$v2 v3=$v3 — they must stay narrow projections")
  }

  test("curation v4 (DSIR tail): selects only rule+dedup survivors; tail adds only the dedup shuffles") {
    import graft.operators.Dsir
    // every selected doc must be a non-target rule survivor
    val survivors = Sampling.ruleGates(spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "source", "text"))
      .filter(!col("source").isin(Dsir.TargetSources: _*))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val out = Sampling.curationDsir(spark, sf).collect()
    assert(out.nonEmpty && out.forall(r => survivors.contains(r.getLong(0))))
    // deterministic resampling: same inputs, same selection
    val again = Sampling.curationDsir(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // the DSIR tail itself is shuffle-free: the composed plan carries no
    // MORE Exchanges than the rules+dedup prefix alone requires (the
    // fingerprint window). TakeOrderedAndProject adds none.
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    val prefixOnly = Sampling.ruleGates(spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text"))
      .withColumn("fp", graft.operators.Dedup.canonicalFp(col("text")))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp").orderBy("doc_id")))
      .filter(col("rn") === 1)
    assert(exchanges(Sampling.curationDsir(spark, sf)) <= exchanges(prefixOnly) + 0,
      "the DSIR tail must add zero Exchanges over the dedup prefix")
  }

  test("sequence packing: plan is partition-count-invariant and conserves the corpus") {
    val budget = 500L
    val p3 = Packing.packSequences(spark, sf, budget, numPartitions = 3).collect()
    val p8 = Packing.packSequences(spark, sf, budget, numPartitions = 8).collect()
    // the two-phase prefix sum must give the SAME global plan regardless of
    // how the corpus was partitioned — this is the whole point
    assert(p3.map(_.toString).toSeq == p8.map(_.toString).toSeq)
    // conservation: every doc and every token lands in exactly one bin
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(split(col("text"), "\\s+")).cast("long").as("t"))
      .agg(sum("t"), count(lit(1))).collect()(0)
    assert(p3.map(_.getLong(2)).sum == toks.getLong(0)) // total_tokens
    assert(p3.map(_.getLong(1)).sum == toks.getLong(1)) // n_docs
    // bins are contiguous doc-id ranges in order
    val sorted = p3.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(4) < b.getLong(3),
        s"overlapping bins: $a $b")
      case _ =>
    }
    // each bin starts within its budget slot: first doc's start offset is
    // in [bin*budget, (bin+1)*budget) by construction — spot-check monotone
    // non-empty bins
    assert(sorted.forall(_.getLong(1) >= 1))
  }

  test("sequence packing: NULL text counts as '' (one token), never -1") {
    import spark.implicits._
    // Spark's size(split(null)) is -1; without the coalesce a NULL-text
    // doc would SUBTRACT a token from the prefix sum (and diverge from
    // the DuckDB oracle's NULL). The repo convention: NULL behaves as ''.
    val dir = java.nio.file.Files.createTempDirectory("graft-packnull").toString
    Seq((1L, "a b c"), (2L, null.asInstanceOf[String]), (3L, "d e"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Packing.packSequences(spark, dir, budget = 100L).collect()
    // 3 + 1 ('' splits to one empty token) + 2
    assert(out.map(_.getLong(2)).sum == 6, s"got ${out.mkString(";")}")
    assert(out.map(_.getLong(1)).sum == 3)
  }
}
