package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level specs for the pieces the DuckDB oracle can't see:
  * trust-scoring branches, dedup on crafted duplicates, LSH recall,
  * multimodal plumbing. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  // --- trust scoring (ref: orchestrator.py:33-116; test_orchestrator_validation.py) ---

  def score(text: String): (Double, String, Seq[String]) = {
    val df = InvoicePipeline.process(Seq(text).toDF("text"))
      .select(col("trust_score"), col("status"),
        col("validation_issues.code").as("codes"))
      .collect()(0)
    (df.getDouble(0), df.getString(1), df.getSeq[String](2))
  }

  val full: String =
    """PRESTADOR DE SERVIÇOS
      |EMPRESA ALFA LTDA
      |CNPJ: 04.252.011/0001-10
      |TOMADOR DE SERVIÇOS
      |CLIENTE BETA SA
      |CNPJ: 11.222.333/0001-81
      |VALOR TOTAL: R$ 100,00""".stripMargin

  test("success ⇒ score 1.0, no issues (ref: test_orchestrator_validation.py:33-60)") {
    val (s, st, codes) = score(full)
    assert(s == 1.0 && st == "success" && codes.isEmpty)
  }

  test("missing recipient ⇒ partial, 0.9, MISSING_RECIPIENT (ref: :68-98)") {
    val (s, st, codes) = score(full.replace("TOMADOR DE SERVIÇOS", "X")
      .replace("CNPJ: 11.222.333/0001-81", "SEM DOCUMENTO AQUI"))
    assert(s == 0.9 && st == "partial" && codes == Seq("MISSING_RECIPIENT"))
  }

  test("invalid issuer ⇒ error, clamped 0.0 (ref: :106-127)") {
    val (s, st, codes) = score(full.replace("04.252.011/0001-10", "12.345.678/0001-00"))
    assert(s == 0.0 && st == "error" && codes.contains("MISSING_ISSUER"))
  }

  test("missing total ⇒ error severity, -0.5 (ref: orchestrator.py:84-91)") {
    val (s, st, codes) = score(full.replace("VALOR TOTAL: R$ 100,00", "SEM VALORES"))
    assert(s == 0.5 && st == "error" && codes.contains("MISSING_TOTAL"))
  }

  // --- dedup on crafted duplicates ---

  test("exact dedup groups identical normalized content") {
    val docs = Seq(
      (1L, "hello   world  foo"),
      (2L, "Hello world FOO"),   // same after canonicalization
      (3L, "totally different text")).toDF("doc_id", "text")
    val out = docs.groupBy(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
      .orderBy("keep_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 1L && out(0).getLong(2) == 2L) // keep 1, copies 2
  }

  test("jaccard shingle pairs find near-duplicates and skip distinct docs") {
    // two docs sharing most 3-gram shingles + one unrelated
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val withSh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .withColumn("cnt", size(col("sh")))
    val ex = withSh.select(col("doc_id"), col("cnt"), explode(col("sh")).as("s"))
    val pairs = ex.as("a").join(ex.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"),
        col("a.cnt").as("ca"), col("b.cnt").as("cb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("j", col("shared") / (col("ca") + col("cb") - col("shared")))
      .collect()
    assert(pairs.length == 1)
    val p = pairs(0)
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L)
    assert(p.getDouble(5) > 0.5) // 7 shared of 8+8-7=9 → 0.777
  }

  test("minhash LSH recall is 1.0 on the test corpus vs exact jaccard") {
    val exact = Dedup.jaccardPairs(spark, sf).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.minhashDedup(spark, sf).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh == exact, s"minhash=${mh.size} exact=${exact.size} missing=${(exact -- mh).take(5)}")
  }

  test("minhash mega-bucket cap: stride-1+2 chain, same keep-one drop set") {
    // a 5-doc identical-text cluster (the boilerplate shape that went
    // quadratic at 5M docs — see the minhashDedup cap scaladoc) plus one
    // unrelated doc; under a tiny cap the cluster emits the sorted-id
    // stride-1+2 chain (2D−3 pairs) instead of all D*(D-1)/2 — a chain,
    // not a hub star, so a sub-threshold outlier holding the bucket's
    // minimum id can only cost its own incident edges, never the whole
    // cluster's (review r13) — and the dedup outcome (drop all but the
    // first) is identical
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mhcap").toString
    val boiler = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    ((1L to 5L).map(i => (i, boiler)) :+ (99L, "completely different words entirely"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val full = Dedup.minhashDedup(spark, dir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashDedup(spark, dir, maxBandBucket = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)).toSet)
    val stride1 = (2L to 5L).map(j => (j - 1, j)).toSet
    val stride2 = (3L to 5L).map(j => (j - 2, j)).toSet
    assert(capped == stride1 ++ stride2, s"stride-1+2 chain: $capped")
    assert(full.map(_._2) == capped.map(_._2), "identical keep-one drop set")
  }

  test("cappedBucketEdges: single interleaved outliers never disconnect members") {
    // the review-r14 failure mode the stride-2 edges close: duplicates are
    // not adjacent in id order — a sub-threshold hanger-on BETWEEN two
    // cluster members kills both its stride-1 edges, and the same sorted
    // order recurs in every band, so a stride-1-only chain loses the
    // connection systematically. Property: for every outlier subset with
    // no two consecutive sorted positions, the member-to-member graph
    // (edges whose endpoints are both members) stays connected.
    def connectedMembers(ids: Array[Long], outliers: Set[Long]): Boolean = {
      val members = ids.filterNot(outliers)
      if (members.length <= 1) true
      else {
        val edges = Dedup.cappedBucketEdges(ids).filter { case (a, b) =>
          !outliers(a) && !outliers(b) }.toSeq
        val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
        var seen = Set(members.head)
        var frontier = List(members.head)
        while (frontier.nonEmpty) {
          val next = frontier.flatMap(adj.getOrElse(_, Nil)).filterNot(seen)
          seen ++= next
          frontier = next
        }
        members.forall(seen)
      }
    }
    val ids = (1L to 12L).toArray
    // every outlier subset of {1..12} without two consecutive ids
    val nonConsecutive = (0 until (1 << 12)).map(m =>
      (0 until 12).filter(i => (m & (1 << i)) != 0).map(i => ids(i)).toSet)
      .filter(s => !s.exists(x => s.contains(x + 1)))
    nonConsecutive.foreach { out =>
      assert(connectedMembers(ids, out), s"disconnected by outliers $out")
    }
    // and the boundary is honest: two CONSECUTIVE outliers CAN disconnect
    assert(!connectedMembers(ids, Set(6L, 7L)),
      "two consecutive outliers should split the chain (stated boundary)")
    // edge count stays O(D): exactly 2D−3
    assert(Dedup.cappedBucketEdges(ids).size == 2 * ids.length - 3)
  }

  test("simhash: identical docs at hamming 0, near-dups close, output keys sane") {
    val out = Dedup.simhashPairs(spark, sf).collect()
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 3)
    }
  }

  // --- similarity ---

  test("SRP-LSH recall ≥0.95 vs exact baseline at cos 0.8 on the augmented corpus") {
    // the shipped q_ann_lsh configuration: augmented corpus (true
    // near-neighbors above 0.8 exist), 48 bands × 12 planes
    val aug = Similarity.augmentedEmb(spark, sf)
    val exact = Similarity.cosinePairsOn(aug, 0.8).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annPairsOn(aug, 0.8).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size > 1000, s"augmentation fixture broken: only ${exact.size} exact pairs ≥0.8")
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall too low: exact=${exact.size} ann=${ann.size}")
    assert((ann -- exact).isEmpty, "ann emitted a pair below threshold (verify step broken)")
  }

  test("bandingFor: noise budget linear in n, recall restored, planes deepen with scale") {
    def recallOf(b: Int, p: Int, threshold: Double): Double = {
      val q = 1.0 - math.acos(threshold) / math.Pi
      1.0 - math.pow(1.0 - math.pow(q, p), b)
    }
    def noiseOf(b: Int, p: Int, n: Long): Double =
      n.toDouble * (n - 1) / 2 * (1 - math.pow(1 - math.pow(0.5, p), b))
    for (n <- Seq(8000L, 80000L, 800000L)) {
      val (b, p) = Similarity.bandingFor(n, 0.8)
      info(s"n=$n -> ${b}x$p bands, recall=${recallOf(b, p, 0.8)}, noise/vec=${noiseOf(b, p, n) / n}")
      assert(recallOf(b, p, 0.8) >= 0.95, s"n=$n: recall broken")
      assert(noiseOf(b, p, n) <= 64.0 * n, s"n=$n: noise budget broken")
    }
    // the SCALING.md measurement, as an invariant: parameters DEEPEN with n
    assert(Similarity.bandingFor(80000L, 0.8)._2 > Similarity.bandingFor(8000L, 0.8)._2)
    // the shipped 1x regime is what the rule reproduces
    assert(Similarity.bandingFor(8000L, 0.8) == (46, 12),
      s"got ${Similarity.bandingFor(8000L, 0.8)}")
  }

  test("annPairsOn auto default == explicit bandingFor parameters") {
    // the deployment default derives banding from the corpus count — it
    // must be EXACTLY the fixed run at bandingFor(n), not a third regime
    val aug = Similarity.augmentedEmb(spark, sf)
    val (b, p) = Similarity.bandingFor(aug.count(), 0.8)
    val auto = Similarity.annPairsOn(aug, 0.8).collect().toSeq
    val fixed = Similarity.annPairsOn(aug, 0.8, bands = b, planesPerBand = p).collect().toSeq
    assert(auto == fixed, s"auto banding diverged from bandingFor=(${b}x$p)")
    intercept[IllegalArgumentException] {
      Similarity.annPairsOn(aug, 0.8, bands = 48) // half-specified
    }
  }

  test("cellsFor: √n rule, clamped to the broadcast-model cap") {
    assert(Similarity.cellsFor(64L) == 8)
    assert(Similarity.cellsFor(1000000L) == 1000)
    assert(Similarity.cellsFor(1L) == 1)
    // at 10⁹ vectors the flat model hits the cap — the guard boundary
    assert(Similarity.cellsFor(10000000000L) == Similarity.MaxCentroids)
    intercept[IllegalArgumentException](Similarity.cellsFor(0L))
    // candidate volume stays sub-linear: n·nprobe/cellsFor(n) ~ nprobe·√n
    val perQuery1e6 = 1000000.0 * 2 / Similarity.cellsFor(1000000L)
    assert(perQuery1e6 <= 2001.0, s"per-query candidates at 1e6: $perQuery1e6")
  }

  test("IVF model guards: centroid cap and sparse-id seed both fail loudly") {
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.trainedCentroidArrays(base, Similarity.MaxCentroids + 1)
    }
    assert(e1.getMessage.contains("broadcast model"))
    // more cells than populated vec_id residues: the all-zeros seed cells
    // the oracle's cent0 CTE omits — refused instead of diverging
    val n = base.count().toInt
    val e2 = intercept[IllegalArgumentException] {
      Similarity.trainedCentroidArrays(base, n + 7)
    }
    assert(e2.getMessage.contains("residue"))
  }

  test("IVF search with nprobe = nCentroids degenerates to the exact top-k") {
    val ivfAll = Similarity.ivfSearch(spark, sf, nCentroids = 8, nprobe = 8, k = 3, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val exact = Similarity.topK(spark, sf, k = 3, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(ivfAll == exact, "probing every cell must reproduce the exact ranking")
  }

  test("IVF search at nprobe=2 keeps useful recall vs exact top-k") {
    val k = 5
    val ivf = Similarity.ivfSearch(spark, sf, nCentroids = 8, nprobe = 2, k = k, nQueries = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.topK(spark, sf, k = k, nQueries = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // 2 of 8 cells probed — positional recall floor; the measured value is
    // printed so regressions in the quantizer show up in CI logs
    info(s"ivf nprobe=2 recall@$k = $recall")
    assert(recall >= 0.3, s"recall collapsed: $recall")
  }

  test("Lloyd training improves IVF recall over the residue-cell seed") {
    // the round-3 verdict's point: residue cells are arbitrary, so their
    // recall is meaningless as an ANN signal. Two deterministic Lloyd
    // rounds must beat the seed (measured 0.424 → 0.472 at sf0.001,
    // 0.404 → 0.472 at sf0.01; the ceiling is modest because the synthetic
    // corpus is near-uniform — little cluster structure to recover).
    val k = 5
    val exact = Similarity.topK(spark, sf, k = k, nQueries = 50)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def recall(iters: Int): Double = {
      val ivf = Similarity.ivfSearch(spark, sf, nCentroids = 8, nprobe = 2, k = k,
          nQueries = 50, iters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      (exact & ivf).size.toDouble / exact.size
    }
    val seed = recall(0)
    val trained = recall(Similarity.LloydIters)
    info(s"ivf recall@$k: seed=$seed trained=$trained")
    assert(trained > seed,
      s"Lloyd training must improve recall on this corpus: seed=$seed trained=$trained")
    assert(trained >= 0.45, s"trained recall regressed below the measured floor: $trained")
  }

  test("int8-scored IVF search: recall ≥0.95 and cos error within the RMSE budget") {
    // probing ALL cells isolates quantization error as the only difference
    // from the exact float ranking — this is the recall budget of the 4×
    // storage/shuffle reduction, not of the cell probing
    val k = 5
    val exact = Similarity.topK(spark, sf, k = k, nQueries = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val q8 = Similarity.ivfSearchInt8(spark, sf, nCentroids = 8, nprobe = 8, k = k, nQueries = 50)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val recall = (exact.keySet & q8.keySet).size.toDouble / exact.size
    info(s"int8 ivf recall@$k (nprobe=8) = $recall")
    assert(recall >= 0.95, s"int8 scoring broke the ranking: recall=$recall")
    // int8 cosine must track float cosine tightly on shared pairs
    val errs = (exact.keySet & q8.keySet).toSeq.map(p => math.abs(exact(p) - q8(p)))
    val maxErr = errs.max
    info(s"int8 cos error: max=$maxErr")
    assert(maxErr <= 0.02, s"quantized cosine drifted: max |Δcos| = $maxErr")
  }

  test("int8 quantization: range and reconstruction bounds hold corpus-wide") {
    val out = Similarity.quantize(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (scale, q1, qMid, rmse) =
        (r.getDouble(1), r.getInt(2), r.getInt(3), r.getDouble(4))
      assert(scale >= 0)
      // int8 range by construction (scale = max|x|/127)
      assert(q1 >= -127 && q1 <= 127 && qMid >= -127 && qMid <= 127)
      // per-element error ≤ scale/2 ⇒ rmse ≤ scale/2 (+ rounding slack)
      assert(rmse <= scale / 2 + 1e-6, s"vec ${r.getLong(0)}: rmse=$rmse scale=$scale")
    }
  }

  test("top-k neighbors are rank-consistent and self-excluded") {
    val out = Similarity.topK(spark, sf, k = 3, nQueries = 5).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to rows.length))
      rows.foreach(r => assert(r.getLong(2) != q))
      val coss = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(coss.zip(coss.tail).forall { case (a, b) => a >= b })
    }
  }

  // --- sketches ---

  test("approx_count_distinct (HLL++) within 5% of exact at corpus scale") {
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  // --- multimodal plumbing ---

  test("winnowing fingerprints: windows, rightmost ties, short-text edge") {
    import graft.operators.TextAnalysis._
    // shorter than k: nothing
    assert(winnowFingerprints("abcd").isEmpty && winnowFingerprints(null).isEmpty)
    // k ≤ len < k+w−1: hashes exist but no full window
    assert(winnowFingerprints("a" * (WinnowK + WinnowW - 2)).isEmpty)
    // identical repeated text: every k-gram hash equal → rightmost-min per
    // window, so each window picks its LAST position
    val rep = winnowFingerprints("a" * 45) // m = 45-25+1 = 21 hashes
    assert(rep.nonEmpty)
    assert(rep.map(_._2).distinct.size == 1) // single repeated hash value
    // positions are the last slot of each window: ws+w for ws=0..m-w
    assert(rep.map(_._1) == (WinnowW.toLong to 21L))
    // hash value matches the polynomial definition (BigInt ground truth)
    val a = BigInt('a'.toInt)
    val expected = (0 until WinnowK).map(j => a * BigInt(31).pow(j)).sum % BigInt(WinnowP)
    assert(BigInt(rep.head._2) == expected)
    // the winnowing guarantee: a shared substring of length ≥ k+w−1 = 40
    // between two texts must share at least one fingerprint hash
    val shared = "this exact passage of sufficient length is copied verbatim!"
    val fa = winnowFingerprints("AAAA " + shared + " BBBBBBBBBBBBBBBB").map(_._2).toSet
    val fb = winnowFingerprints("CCCCCCCCCCCC " + shared + " DDDD").map(_._2).toSet
    assert(fa.intersect(fb).nonEmpty)
    // sanity: selections sorted, in range
    val fps = winnowFingerprints("the quick brown fox jumps over the lazy dog again and again")
    assert(fps.nonEmpty && fps == fps.sorted)
    assert(fps.forall { case (p, h) => p >= 1 && h >= 0 && h < WinnowP })
  }

  test("fuzz: winnow kernel matches a BigInt reference on random unicode text") {
    import graft.operators.TextAnalysis._
    def reference(text: String): Seq[(Long, Long)] = {
      val cps = text.codePoints().toArray
      val n = cps.length
      if (n < WinnowK) return Seq.empty
      val hs = (0 until n - WinnowK + 1).map { i =>
        ((0 until WinnowK).map(j => BigInt(cps(i + j)) * BigInt(31).pow(WinnowK - 1 - j)).sum
          % BigInt(WinnowP)).toLong
      }
      if (hs.length < WinnowW) return Seq.empty
      (0 to hs.length - WinnowW).map { ws =>
        val win = (ws until ws + WinnowW)
        val best = win.minBy(p => (hs(p), -p))
        (best + 1L, hs(best))
      }.distinct.sorted
    }
    val rnd = new scala.util.Random(7)
    // codepoint STRINGS (not chars) so the non-BMP 𝄞 stays a surrogate
    // PAIR and genuinely exercises supplementary-plane codepoints
    val alphabets: Seq[Seq[String]] = Seq(
      Seq("a", "b"),
      "abcdefgh ".map(_.toString),
      Seq("a", "ç", "€", "中", "𝄞", "x", " "))
    for (trial <- 0 until 200) {
      val alpha = alphabets(trial % alphabets.size)
      val len = rnd.nextInt(120)
      val s = Seq.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString
      assert(winnowFingerprints(s) == reference(s), s"trial $trial: ${s.take(60)}")
    }
  }

  test("contamination: an eval doc embedded verbatim in a train doc scores 1.0") {
    val evalText = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, s"prefix words here $evalText suffix tail words"), // contains eval 17
      (2L, "completely unrelated content about other things entirely"),
      (17L, evalText), // eval set member (17 % 17 == 0)
      (34L, "isolated benchmark item that nothing in training contains")
    )
    val dir = java.nio.file.Files.createTempDirectory("graft-contam").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = Dedup.contamination(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // exactly one contaminated pair: train doc 1 fully contains eval 17
    assert(out.toSeq == Seq((1L, 17L, 1.0)), s"got ${out.toSeq}")
  }

  test("jaccard df cap: a hot shingle is dropped from index AND set sizes") {
    // the skew guard end-to-end (at corpus scale the default cap of 1000
    // never activates, so this pins the semantics the 100 TB story rests
    // on): every doc shares 'x y z' (df 5); with the cap at 4 it must
    // drop from the inverted index and from BOTH set sizes — the exact
    // behavior the DuckDB oracle's `kept` CTE mirrors
    val docs = Seq(
      (1L, "x y z a b c d"), (2L, "x y z a b c e"), (3L, "x y z q r s t"),
      (4L, "x y z u v w m"), (5L, "x y z n o p k"))
    val dir = java.nio.file.Files.createTempDirectory("graft-dfcap").toString
    docs.toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    def pairs(cap: Int) = Dedup.jaccardPairs(spark, dir, threshold = 0.5, maxShingleDf = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // cap inert: docs 1-2 share 4 of 5 shingles -> 4/(5+5-4) = 2/3
    assert(pairs(1000) == Seq((1L, 2L, 4L, 0.666667)), s"got ${pairs(1000)}")
    // cap 4 drops 'x y z' (df 5): 3 shared of 4-shingle sets -> 3/5; the
    // only shingle docs 3-5 share is the dropped one -> still no pairs
    assert(pairs(4) == Seq((1L, 2L, 3L, 0.6)), s"got ${pairs(4)}")
  }

  test("contaminationOn: independent train/eval relations, no identity exclusion") {
    val evalText = "alpha beta gamma delta epsilon"
    val train = Seq(
      (1L, s"prefix words here $evalText suffix tail words"),
      (2L, "completely unrelated content about other things entirely"),
      // same numeric id as an eval doc — separate corpora share no
      // identity, so this pair MUST be emitted (the carved query excludes
      // train_id = eval_id; the two-relation API must not)
      (100L, s"id collision is meaningless across corpora $evalText indeed")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, evalText),
      (200L, "isolated benchmark item that nothing in training contains")
    ).toDF("doc_id", "text")
    val out = Dedup.contaminationOn(train, eval, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 100L, 1.0), (100L, 100L, 1.0)), s"got $out")
  }

  test("contaminationOn: the df cap counts TRAIN frequency only") {
    val evalText = "alpha beta gamma delta epsilon"
    // one train doc carries the text (train df = 1 per shingle); TWO eval
    // docs carry it. With the cap at 1: a train-side cap keeps the
    // shingles (df 1 ≤ 1) and both eval docs match; a combined-corpus cap
    // (the carved query's shape) would see df 3 and drop everything.
    val train = Seq(
      (1L, s"prefix $evalText tail"),
      (2L, "unrelated filler content with different words entirely")
    ).toDF("doc_id", "text")
    val eval = Seq((10L, evalText), (20L, evalText)).toDF("doc_id", "text")
    val out = Dedup.contaminationOn(train, eval, threshold = 0.5, maxShingleDf = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(out == Seq((1L, 10L, 1.0), (1L, 20L, 1.0)), s"got $out")
  }

  test("incrementalDedupOn: exact flag, best-match tie-break, novel docs pass") {
    val corpus = Seq(
      (1L, "a b c d e f g"),
      (2L, "x y z w q r s"),
      (4L, "x y z w q r s"), // identical twin of 2 — tie-break target
      (3L, "now for something completely different okay here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "a b c d e f g"),  // exact dup of 1 (and jaccard 1.0)
      (11L, "a b c d e f h"),  // near dup of 1: 4 of 5 shingles shared
      (12L, "totally novel content here indeed my friend"),
      (14L, "x y z w q r t")   // ties 2 and 4 at equal jaccard → dup_of 2
    ).toDF("doc_id", "text")
    val rows = Dedup.incrementalDedupOn(corpus, batch, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4),
        r.getBoolean(5))).toSeq.sortBy(_._1) // the On-form has no presentation sort
    // 7 words → 5 3-gram shingles; 11 shares 4 with doc 1 → 4/(5+5-4)=2/3
    assert(rows == Seq(
      (10L, true, 1L, 1.0, true),
      (11L, false, 1L, 0.666667, true),
      (12L, false, -1L, -1.0, false),
      (14L, false, 2L, 0.666667, true)), s"got $rows")
  }

  test("passages: merged spans reconstruct the shared passages, island per passage") {
    import graft.operators.TextAnalysis._
    // two docs sharing two passages separated by doc-unique gaps: the span
    // merge must emit exactly one island per shared passage, each contained
    // within (and covering most of) that passage's position range in doc 1
    val p1 = "The quick brown fox jumps over the lazy dog while the rain in spain falls mainly on the plain every single day."
    val p2 = "Lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore et dolore magna."
    val gapA = "zzzz unique first gap AAAA 0123456789 qwerty."
    val gapB = "yyyy other gap BBBB 9876543210 dvorak mmmm."
    val doc1 = p1 + gapA + p2
    val doc2 = p1 + gapB + p2
    val dir = java.nio.file.Files.createTempDirectory("graft-passages").toString
    Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val spans = passages(spark, dir, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(spans.forall { case (a, b, _, _, _) => a == 1L && b == 2L })
    assert(spans.length == 2, s"expected 2 islands, got ${spans.toSeq}")
    // 1-based codepoint ranges of the passages inside doc 1
    val (p1Start, p1End) = (1L, p1.length.toLong)
    val (p2Start, p2End) = (p1.length + gapA.length + 1L, doc1.length.toLong)
    val Seq(s1, s2) = spans.toSeq.sortBy(_._3)
    assert(s1._3 >= p1Start && s1._4 <= p1End, s"island 1 out of passage 1: $s1")
    assert(s2._3 >= p2Start && s2._4 <= p2End, s"island 2 out of passage 2: $s2")
    // each island covers at least half its passage (winnowing guarantees
    // coverage up to k+w−1 boundary loss on each end)
    assert(s1._4 - s1._3 + 1 >= p1.length / 2, s"island 1 too short: $s1")
    assert(s2._4 - s2._3 + 1 >= p2.length / 2, s"island 2 too short: $s2")
    // a doc pair with one contiguous shared passage merges to ONE island
    val dir2 = java.nio.file.Files.createTempDirectory("graft-passages1").toString
    Seq((1L, "AAAA " + p1 + " BBBBBBBBBBBBBBBB"), (2L, p1)).toDF("doc_id", "text")
      .write.parquet(s"$dir2/documents.parquet")
    val one = passages(spark, dir2, threshold = 0.5).collect()
    assert(one.length == 1, s"expected 1 island, got ${one.toSeq}")
  }

  test("multimodal decode: deterministic features, normalized histogram, kinds") {
    val out = Multimodal.featureQuery(spark, sf).collect()
    assert(out.length == 500)
    val again = Multimodal.featureQuery(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq) // deterministic
    out.take(20).foreach { r =>
      assert(Set("image", "audio", "video").contains(r.getString(1)))
      assert(r.getLong(2) > 0) // n_bytes
      assert(r.getInt(3) >= 64 && r.getInt(3) < 128)
    }
  }

  test("multimodal: full feature vector is an L1-normalized histogram") {
    val feats = Multimodal.decodeFeatures(Multimodal.fromDocuments(spark, sf))
    val row = feats.limit(1).collect()(0)
    val sum = row.features.sum
    assert(math.abs(sum - 1.0f) < 1e-3, s"histogram sums to $sum")
  }
}
