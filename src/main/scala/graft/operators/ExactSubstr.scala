package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Substring-level exact deduplication — the ExactSubstr operator of
  * Lee et al. 2022 (arXiv:2107.06499, *Deduplicating Training Data Makes
  * Language Models Better*): find every ≥L-codepoint span that occurs
  * verbatim in more than one document, and cut the repeated copies out of
  * the corpus. This is the granularity the document-level family
  * (exact/MinHash/SimHash) and the chunk-level family (winnowing/
  * containment/passages) both miss: boilerplate headers, license blocks
  * and templated paragraphs that repeat across otherwise-distinct
  * documents survive document dedup entirely, and winnowing only reports
  * WHICH documents share content, not the exact characters to remove.
  *
  * The published implementation builds a monolithic suffix array — a
  * single-machine shape. The distributed re-expression here needs NO
  * suffix array and NO pairwise join:
  *
  *  1. every L-gram position ships as a NARROW row `(doc_id, pos, h)` —
  *     two independent small-modulus rolling hashes packed into one long
  *     (~24 bytes/row, vs 50–200 bytes for the literal gram), computed in
  *     one O(n) pass per document;
  *  2. hash keys occurring in ≥2 distinct documents (an `Aggregate` with
  *     map-side combine: `min(doc_id) ≠ max(doc_id)` — no count-distinct,
  *     no shuffle of anything wider than four longs) select CANDIDATE
  *     positions via a semi-join;
  *  3. only candidates re-derive their literal gram (one join back to the
  *     text by doc_id — text is shuffled once per document, the gram is
  *     projected in-stage) and the ≥2-distinct-docs test re-runs on the
  *     LITERAL gram, so hash collisions cost work, never correctness;
  *  4. confirmed positions merge into maximal spans per document with the
  *     same gaps-and-islands window as [[TextAnalysis.passages]] — each
  *     window partition is one document's hits, so no partition outgrows
  *     a single document regardless of corpus size.
  *
  * Skew note: unlike the Jaccard/winnowing pair generators there is no
  * quadratic pair join anywhere, so this operator carries NO df cap — a
  * boilerplate gram shared by a million documents is exactly the content
  * the operator exists to cut, and every aggregate over it is partially
  * aggregatable (hot keys combine map-side). The one hot-key surface is
  * the dup-gram semi-join, which is a plain equi-join under AQE's skew
  * handling.
  *
  * [[cut]] applies the keep-one-copy policy at gram granularity: the
  * OWNER of a duplicated gram (the smallest doc_id containing it) keeps
  * its occurrences; every other document's occurrences are cut. Cut
  * positions merge into spans, and the complement segments reassemble
  * into the deduplicated text — so shared boilerplate survives in exactly
  * one document, per the paper's "remove all but one copy" semantics.
  */
object ExactSubstr {

  /** Minimum duplicated-span length, in CODEPOINTS. The paper uses 50
    * BPE tokens; 50 codepoints is the same order for code/boilerplate and
    * keeps both engines on the shared substr/length codepoint semantics. */
  val DefaultL = 50

  // two independent rolling-hash channels; both stay int64-exact:
  // h < P < 2^20, h·B + cp < 2^20·37 + 2^21 ≪ 2^63, cp·B^(L−1) mod P
  // products < 2^41. Collisions on the 40-bit pair only add candidates —
  // step 3 re-verifies on the literal gram.
  private val B1 = 31L;  private val P1 = 1048573L
  private val B2 = 37L;  private val P2 = 999983L

  /** All L-gram rolling hashes of one document: (1-based codepoint pos,
    * h1, h2). O(n) via the rolling update; empty below length L. */
  private[graft] def gramHashes(text: String, L: Int): Seq[(Long, Long, Long)] = {
    val cps = (if (text == null) "" else text).codePoints().toArray
    val n = cps.length
    if (n < L) return Seq.empty
    // B^(L-1) mod P for the roll-out term
    def powMod(b: Long, e: Int, p: Long): Long =
      (0 until e).foldLeft(1L)((acc, _) => acc * b % p)
    val bl1 = powMod(B1, L - 1, P1)
    val bl2 = powMod(B2, L - 1, P2)
    var h1 = 0L; var h2 = 0L
    var j = 0
    while (j < L) { h1 = (h1 * B1 + cps(j)) % P1; h2 = (h2 * B2 + cps(j)) % P2; j += 1 }
    val out = new Array[(Long, Long, Long)](n - L + 1)
    out(0) = (1L, h1, h2)
    var i = 1
    while (i <= n - L) {
      h1 = ((h1 + P1 - cps(i - 1) % P1 * bl1 % P1) % P1 * B1 + cps(i + L - 1)) % P1
      h2 = ((h2 + P2 - cps(i - 1) % P2 * bl2 % P2) % P2 * B2 + cps(i + L - 1)) % P2
      out(i) = (i + 1L, h1, h2)
      i += 1
    }
    out.toSeq
  }

  /** [[gramHashes]] as two PRIMITIVE arrays (pos, packed hash) — the UDF
    * return shape [[dupHits]] uses: a tuple-array return allocates four
    * boxed objects per gram (one row per corpus codepoint — tens of
    * millions of allocations at sf0.1), while primitive arrays convert via
    * `UnsafeArrayData.fromPrimitiveArray` and the zip/explode happens in
    * codegen. Both hashes pack bijectively into one long (`h1 << 20 | h2`
    * — P1, P2 < 2²⁰), so the gram-position relation is (doc_id, pos, h) =
    * 24 B/codepoint instead of 32, the candidate aggregate groups one key
    * instead of two, and the checkpoint tier pins 25% less storage.
    * ExactSubstrSpec pins element-equality with [[gramHashes]]. */
  private[graft] def gramHashArrays(text: String, L: Int)
  : (Array[Long], Array[Long]) = {
    val cps = (if (text == null) "" else text).codePoints().toArray
    val n = cps.length
    if (n < L) return (Array.emptyLongArray, Array.emptyLongArray)
    def powMod(b: Long, e: Int, p: Long): Long =
      (0 until e).foldLeft(1L)((acc, _) => acc * b % p)
    val bl1 = powMod(B1, L - 1, P1)
    val bl2 = powMod(B2, L - 1, P2)
    val m = n - L + 1
    val pos = new Array[Long](m); val hs = new Array[Long](m)
    var h1 = 0L; var h2 = 0L
    var j = 0
    while (j < L) { h1 = (h1 * B1 + cps(j)) % P1; h2 = (h2 * B2 + cps(j)) % P2; j += 1 }
    pos(0) = 1L; hs(0) = (h1 << 20) | h2
    var i = 1
    while (i <= n - L) {
      h1 = ((h1 + P1 - cps(i - 1) % P1 * bl1 % P1) % P1 * B1 + cps(i + L - 1)) % P1
      h2 = ((h2 + P2 - cps(i - 1) % P2 * bl2 % P2) % P2 * B2 + cps(i + L - 1)) % P2
      pos(i) = i + 1L; hs(i) = (h1 << 20) | h2
      i += 1
    }
    (pos, hs)
  }

  private def docsOf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Materialization tiers for multi-referenced intermediates. Since the
    * r15 window fusion the gram-position and candidate-gram relations are
    * each referenced ONCE (the per-h / per-g min-max windows replaced the
    * aggregate+semi-join pairs), so the only remaining multi-reference is
    * [[cutOn]]'s cut-span relation (`cuts` — one row per cut span,
    * referenced three times):
    *
    *  - `"checkpoint"`: localCheckpoint `cuts`. Single evaluation, but
    *    the blocks pin executor storage for the query's lifetime. The
    *    small-corpus tier.
    *  - `"recompute"`: no persistence — `cuts` is re-derived per
    *    reference (the full kernel + window chain ×3). Zero
    *    executor-storage pinning (asserted via getPersistentRDDs in
    *    ExactSubstrSpec). The 100 TB tier (on a dup-heavy corpus the cut
    *    relation is data-sized).
    *  - `"auto"` (default): one cheap `sum(length(text))` aggregate picks
    *    the tier by corpus codepoint count vs [[CheckpointMaxChars]].
    *
    * [[spansOn]] accepts the parameter for signature stability and
    * validates it, but after the fusion has nothing left to materialize
    * on either tier. */
  val MaterializeTiers: Set[String] = Set("auto", "checkpoint", "recompute")

  /** `"auto"` tier threshold: corpora up to this many codepoints
    * checkpoint the gram-position relation (128M codepoints ≈ 4 GiB of
    * gram rows — comfortably inside one local[32] storage fraction, and
    * per-executor trivial on a cluster); larger corpora recompute. */
  val CheckpointMaxChars: Long = 128L << 20

  /** Confirmed duplicated positions `(doc_id, pos, g)` — steps 1–3 of the
    * scaladoc plan, shared by [[spans]] and [[cut]]. */
  /** Resolve the `"auto"` materialization tier (one cheap corpus-size
    * aggregate) — factored out so [[spansOn]]/[[cutOn]] can apply the SAME
    * tier decision to their own multi-referenced intermediates (r14 opt). */
  private def tierOf(documents: DataFrame, materialize: String): String = {
    require(MaterializeTiers.contains(materialize),
      s"materialize must be one of $MaterializeTiers, got '$materialize'")
    materialize match {
      case "auto" =>
        val chars = documents
          .agg(sum(length(coalesce(col("text"), lit("")))).as("n"))
          .collect()(0)
        if (!chars.isNullAt(0) && chars.getLong(0) > CheckpointMaxChars)
          "recompute"
        else "checkpoint"
      case t => t
    }
  }

  private def dupHits(documents: DataFrame, L: Int): DataFrame = {
    val hashUdf = udf((t: String) => gramHashArrays(t, L)).asNondeterministic()
    // two-stage select: `g` materializes as an attribute (nondeterministic,
    // so CollapseProject cannot inline the kernel into the two field
    // reads); the zip+explode runs in codegen over primitive arrays.
    // Input spread (r14 opt): the rolling-hash kernel + explode otherwise
    // run on the scan's single split; downstream aggregates here are
    // min/max/count over longs/strings — exact under any merge order.
    val raw = Partitioning.spread(documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), hashUdf(col("text")).as("g"))
      .select(col("doc_id"), col("g._1").as("zp"), col("g._2").as("zh"))
      .select(col("doc_id"),
        explode(arrays_zip(col("zp"), col("zh"))).as("p"))
      .select(col("doc_id"), col("p.zp").as("pos"), col("p.zh").as("h"))
    // Candidate filter as ONE windowed pass (r15 opt, guide §2.1 fewer
    // shuffles — the r14 builder measured these queries stage-count
    // bound): per-h min/max over the h partition replaces the
    // [aggregate → Exchange → SortMergeJoin left_semi] pair, whose probe
    // side shuffled the full gram-position relation by h ANYWAY — the
    // window pays that one exchange+sort and nothing else, and the
    // relation is now referenced ONCE (the r14 checkpoint/recompute tier
    // split for `pos` had nothing left to buy and is gone). Same values:
    // window min/max ≡ aggregate min/max, no floats anywhere.
    // honestStats: the post-UDF-explode estimate is garbage and must not
    // invite a static broadcast of the candidate side at corpus scale.
    val w = Window.partitionBy("h")
    val cand = org.apache.spark.sql.graft.CheckpointShim
      .honestStats(raw)
      .withColumn("dmin", min("doc_id").over(w))
      .withColumn("dmax", max("doc_id").over(w))
      .filter(col("dmin") =!= col("dmax"))
      .select("doc_id", "pos")
    // literal grams for candidates only; the text column lives inside this
    // stage — only (doc_id, pos, 50-codepoint gram) crosses the next shuffle
    cand.join(documents.select(col("doc_id"),
        coalesce(col("text"), lit("")).as("t")), "doc_id")
      .select(col("doc_id"), col("pos"),
        expr(s"substring(t, CAST(pos AS INT), $L)").as("g"))
  }

  /** Gaps-and-islands merge of hit positions into maximal spans
    * `[pos, pos+L−1]` (overlapping or adjacent spans coalesce). */
  private def mergeSpans(hits: DataFrame, L: Int): DataFrame = {
    val ord = Window.partitionBy("doc_id").orderBy("pos")
    val spanEnd = col("pos") + (L - 1)
    hits
      .withColumn("prev_end",
        max(spanEnd).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1).otherwise(0))
      .withColumn("isl", sum(col("ni")).over(ord))
      .groupBy("doc_id", "isl")
      .agg(min(col("pos")).as("start_pos"), max(spanEnd).as("end_pos"),
        count(lit(1)).as("n_grams"))
      .select("doc_id", "start_pos", "end_pos", "n_grams")
  }

  /** The "investigate" output: per document, the maximal spans whose every
    * L-gram occurs verbatim in at least one OTHER document.
    * `ordered = false` drops the final total-order sort — the oracle
    * determinism aid, not part of the operator's semantics, and a
    * needless O(output) global sort in a pipeline (the SemDeDup verdict-
    * ordering precedent); plan-asserted sort-free in ExactSubstrSpec. */
  def spans(spark: SparkSession, dir: String, L: Int = DefaultL): DataFrame =
    spansOn(docsOf(spark, dir), L)

  def spansOn(documents: DataFrame, L: Int = DefaultL,
              materialize: String = "auto", ordered: Boolean = true): DataFrame = {
    require(MaterializeTiers.contains(materialize),
      s"materialize must be one of $MaterializeTiers, got '$materialize'")
    // r15 fusion: the literal-gram confirm is the same windowed-min/max
    // pass as the hash pre-filter (guide §2.1) — `grams` is referenced
    // ONCE, so the r14 per-tier checkpoint (and the tier's sizing
    // aggregate) has nothing left to buy on this path and is gone; the
    // `materialize` parameter stays for signature stability (validated,
    // otherwise inert here — [[cutOn]] still uses the tiers for its
    // thrice-referenced cut-span relation).
    val w = Window.partitionBy("g")
    val hits = dupHits(documents, L)
      .withColumn("dmin", min("doc_id").over(w))
      .withColumn("dmax", max("doc_id").over(w))
      .filter(col("dmin") =!= col("dmax"))
      .select("doc_id", "pos")
    val out = mergeSpans(hits, L)
    if (ordered) out.orderBy("doc_id", "start_pos") else out
  }

  /** Relational oracle for [[spansOn]] — the hash pre-filter is a lossless
    * optimization (every true dup-gram position passes it), so the oracle
    * groups the LITERAL grams directly. */
  def spansSql(L: Int = DefaultL): String = s"""
WITH docs AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, CAST(len(t) AS BIGINT) - $L + 1)) AS i FROM docs
), grams AS (
  SELECT doc_id, i, substr(t, CAST(i AS INTEGER), $L) AS g FROM pos
), dup AS (
  SELECT g FROM grams GROUP BY g HAVING min(doc_id) <> max(doc_id)
), hits AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN dup USING (g)
), marked AS (
  SELECT doc_id, i,
    max(i + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM hits
), islands AS (
  SELECT doc_id, i,
    SUM(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY i) AS isl
  FROM marked
)
SELECT doc_id, MIN(i) AS start_pos, MAX(i) + ${L - 1} AS end_pos,
  CAST(COUNT(*) AS BIGINT) AS n_grams
FROM islands GROUP BY doc_id, isl
ORDER BY doc_id, start_pos
""".trim

  /** The "remove" output: the corpus with every non-owner copy of a
    * duplicated gram cut out. Per document: number of cut spans, cut
    * codepoints, and the reassembled text (kept segments concatenated in
    * order). Documents with nothing to cut pass through byte-identical. */
  def cut(spark: SparkSession, dir: String, L: Int = DefaultL): DataFrame =
    cutOn(docsOf(spark, dir), L)

  def cutOn(documents: DataFrame, L: Int = DefaultL,
            materialize: String = "auto", ordered: Boolean = true): DataFrame = {
    val tier = tierOf(documents, materialize)
    // owner = smallest doc_id containing the gram: it keeps its copies.
    // r15 fusion (the spansOn shape): per-g window min gives the owner in
    // the same pass that confirms the literal gram — `doc_id > own`
    // already implies the gram lives in ≥2 documents, so the old
    // [owner aggregate → Exchange → join] pair collapses into the one
    // windowed exchange the grams relation paid anyway, and `grams` is
    // referenced once (its r14 per-tier checkpoint is gone).
    val wg = Window.partitionBy("g")
    val cutHits = dupHits(documents, L)
      .withColumn("own", min("doc_id").over(wg))
      .filter(col("doc_id") > col("own"))
      .select("doc_id", "pos").distinct()
    // `cuts` is referenced THREE times below (pre, tail, cstat) — on the
    // checkpoint tier materialize it (one row per cut span) instead of
    // re-running the distinct + double-window island merge per reference;
    // the recompute tier keeps its zero-pinning contract (r14 opt)
    val cutsRaw = mergeSpans(cutHits, L)
      .select(col("doc_id"), col("start_pos").as("s"), col("end_pos").as("e"))
    val cuts =
      if (tier == "checkpoint")
        org.apache.spark.sql.graft.CheckpointShim.statsHonestLocalCheckpoint(cutsRaw)
      else cutsRaw
    // complement segments: before each cut (from the previous cut's end+1,
    // clipped by the island invariant), plus the tail after the last cut
    val w = Window.partitionBy("doc_id").orderBy("s")
    val pre = cuts
      .withColumn("ks", coalesce(lag(col("e"), 1).over(w) + 1, lit(1L)))
      .withColumn("ke", col("s") - 1)
      .select("doc_id", "ks", "ke")
    val tail = cuts.groupBy("doc_id")
      .agg((max(col("e")) + 1).as("ks"))
      .withColumn("ke", lit(null).cast("long"))
      .select("doc_id", "ks", "ke")
    val base = documents.select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
    val segs = pre.unionByName(tail)
      .join(base, "doc_id")
      .withColumn("ke", coalesce(col("ke"), length(col("t")).cast("long")))
      .filter(col("ks") <= col("ke"))
      .select(col("doc_id"), col("ks"),
        expr("substring(t, CAST(ks AS INT), CAST(ke - ks + 1 AS INT))").as("seg"))
    val rebuilt = segs.groupBy("doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(ks, seg))), x -> x.seg), '')")
        .as("joined"))
    val cstat = cuts.groupBy("doc_id")
      .agg(count(lit(1)).as("n_cut_spans"), sum(col("e") - col("s") + 1).as("n_cut_chars"))
    val out = base
      .join(cstat, Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_cut_spans"), lit(0L)).as("n_cut_spans"),
        coalesce(col("n_cut_chars"), lit(0L)).as("n_cut_chars"),
        // a fully-cut document has cut stats but no kept segments → ''
        when(col("n_cut_spans").isNull, col("t"))
          .otherwise(coalesce(col("joined"), lit(""))).as("text_cut"))
    if (ordered) out.orderBy("doc_id") else out
  }

  /** Relational oracle for [[cutOn]] — same owner rule, same island merge,
    * same complement reassembly. */
  def cutSql(L: Int = DefaultL): String = s"""
WITH docs AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, CAST(len(t) AS BIGINT) - $L + 1)) AS i FROM docs
), grams AS (
  SELECT doc_id, i, substr(t, CAST(i AS INTEGER), $L) AS g FROM pos
), own AS (
  SELECT g, min(doc_id) AS own FROM grams GROUP BY g HAVING min(doc_id) <> max(doc_id)
), cuthits AS (
  SELECT DISTINCT gr.doc_id, gr.i FROM grams gr JOIN own o ON o.g = gr.g AND gr.doc_id > o.own
), marked AS (
  SELECT doc_id, i,
    max(i + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM cuthits
), islands AS (
  SELECT doc_id, i,
    SUM(CASE WHEN prev_end IS NULL OR i > prev_end + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY i) AS isl
  FROM marked
), cuts AS (
  SELECT doc_id, MIN(i) AS s, MAX(i) + ${L - 1} AS e
  FROM islands GROUP BY doc_id, isl
), kept AS (
  SELECT doc_id, coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s) + 1, 1) AS ks, s - 1 AS ke
  FROM cuts
  UNION ALL
  SELECT doc_id, max(e) + 1 AS ks, NULL AS ke FROM cuts GROUP BY doc_id
), seg AS (
  SELECT k.doc_id, k.ks, coalesce(k.ke, len(d.t)) AS ke, d.t
  FROM kept k JOIN docs d USING (doc_id)
), cutdoc AS (
  SELECT doc_id,
    string_agg(substr(t, CAST(ks AS INTEGER), CAST(ke - ks + 1 AS INTEGER)), '' ORDER BY ks) AS text_cut
  FROM seg WHERE ks <= ke GROUP BY doc_id
), cstat AS (
  SELECT doc_id, COUNT(*) AS n_cut_spans, SUM(e - s + 1) AS n_cut_chars FROM cuts GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(coalesce(cs.n_cut_spans, 0) AS BIGINT) AS n_cut_spans,
  CAST(coalesce(cs.n_cut_chars, 0) AS BIGINT) AS n_cut_chars,
  CASE WHEN cs.doc_id IS NULL THEN d.t ELSE coalesce(cd.text_cut, '') END AS text_cut
FROM docs d
LEFT JOIN cstat cs USING (doc_id)
LEFT JOIN cutdoc cd USING (doc_id)
ORDER BY d.doc_id
""".trim
}
