package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents whose hashed n-gram
  * distribution resembles a curated TARGET corpus, by importance
  * resampling instead of a hard threshold gate.
  *
  * The recipe, faithfully:
  *  1. **Features**: bag of word unigrams + bigrams hashed into `dim`
  *     buckets (the paper's hashed n-gram features; the same 52-bit md5
  *     hash as [[QualityClassifier]] / [[TextAnalysis.hashedFeatures]],
  *     so both engines compute bit-identical bucket ids).
  *  2. **Fit** bag-of-words bucket distributions on the target (p̂) and
  *     the raw corpus (q̂), add-one smoothed. The per-bucket
  *     log-importance `llr(f) = ln p̂(f) − ln q̂(f)` — structurally the
  *     Naive-Bayes llr, fitted target-vs-raw instead of pos-vs-neg.
  *  3. **Weight**: per raw document, log w = Σ_f c_doc(f) · llr(f).
  *  4. **Resample** k documents WITHOUT replacement via Gumbel top-k
  *     (Vieira 2014): key = log w + Gumbel(0,1), take the k largest.
  *     The Gumbel noise is deterministic — u from the md5-52 hash of the
  *     doc id (the engine-portable coin [[Sampling.temperatureSample]]
  *     flips), g = −ln(−ln u) — so selection is bit-reproducible and the
  *     DuckDB oracle replays it exactly.
  *
  * Scale shape (100 TB): fitting is ONE gram scan into a dim-bounded
  * map-side-combinable aggregate (≤ `dim` rows per partial) collected to
  * a dim-element driver array — model-sized, like the NB classifier and
  * the IVF centroid models. Weighting is a pure NARROW map: the model
  * ships as a dim-element array literal and each document folds
  * llr[h52(gram) % dim] over its own gram array in-row — no per-gram
  * explode relation, no (doc, feat) shuffle, no model join. Selection is
  * a global top-k (`TakeOrderedAndProject` — k-sized heaps per
  * partition, never a full sort). The whole selection plan is scan →
  * map → top-k: zero data-sized shuffles (spec-pinned).
  *
  * Documents whose text yields zero tokens fold over an empty gram array
  * to log w = 0 (they still compete in the resampling round, per the
  * paper's "every raw example has a weight").
  *
  * Reference framing: the reference pipeline (SURVEY §2) has no learned
  * selection stage; this is a scale extension beside
  * [[QualityClassifier]] (threshold gate) — DSIR is the published
  * alternative that preserves diversity by sampling instead of gating. */
object Dsir {

  val DefaultDim: Int = 512
  val DefaultK: Int = 200

  /** Target corpus definition shared with the classifier oracle: three
    * synthetic sources play "curated reference corpus". */
  val TargetSources: Seq[String] = QualityClassifier.PositiveSources

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** 52-bit md5 hash — the shared [[EngineHash]] definition. */
  private def h52(c: Column): Column = EngineHash.h52(c)

  private def toksCol(text: Column): Column =
    filter(split(lower(coalesce(text, lit(""))), " ", -1), t => length(t) > 0)

  /** `(carry…, feat)` — one row per unigram AND per space-joined bigram,
    * hashed into [0, dim). Both n-gram orders share the bucket space
    * (the paper's hashing-trick feature map). Built in-stage from the
    * token array (zip with its own 1-shifted self — no position join). */
  private[graft] def gramRows(d: DataFrame, dim: Int,
                              carry: Seq[String]): DataFrame = {
    val toks = d.select(carry.map(col) :+ toksCol(col("text")).as("toks"): _*)
    val n1 = greatest(size(col("toks")) - 1, lit(0))
    val bigrams = zip_with(
      slice(col("toks"), lit(1), n1), slice(col("toks"), lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    toks
      .select(carry.map(col) :+
        explode(concat(col("toks"), bigrams)).as("gram"): _*)
      .select(carry.map(col) :+
        (h52(col("gram")) % dim).cast("int").as("feat"): _*)
  }

  /** Fit the per-bucket log-importance model on `labeled`
    * (doc_id, label: boolean — true = target, text) as a driver-side
    * dim-array. ONE gram scan; the ≤dim count rows come back to the
    * driver (every bucket present — zero-count buckets carry the Laplace
    * floor, so out-of-corpus grams degrade gracefully). */
  def fitLlr(spark: SparkSession, labeled: DataFrame, dim: Int): Array[Double] = {
    val countRows = gramRows(labeled, dim, Seq("label")).groupBy("feat").agg(
      sum(when(col("label"), 1L).otherwise(0L)).as("c_t"),
      sum(when(!col("label"), 1L).otherwise(0L)).as("c_r")).collect()
    val byFeat = countRows.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nT = countRows.map(_.getLong(1)).sum
    val nR = countRows.map(_.getLong(2)).sum
    require(nT > 0 && nR > 0,
      s"Dsir.fit: both the target and the raw corpus must contribute grams " +
        s"(n_target=$nT, n_raw=$nR) — check the target predicate")
    (0 until dim).map { f =>
      val (ct, cr) = byFeat.getOrElse(f, (0L, 0L))
      math.log((ct + 1).toDouble / (nT + dim)) -
        math.log((cr + 1).toDouble / (nR + dim))
    }.toArray
  }

  /** [[fitLlr]] as a (feat, llr) relation — the model-as-relations form
    * for persistence/inspection and for the spec's differential. */
  def fit(spark: SparkSession, labeled: DataFrame, dim: Int): DataFrame = {
    import spark.implicits._
    fitLlr(spark, labeled, dim).toSeq.zipWithIndex
      .map { case (l, f) => (f, l) }.toDF("feat", "llr")
  }

  /** Per-document log importance weight of `raw` (doc_id, text) under a
    * fitted model, folded IN-ROW over the gram array against the model
    * as a dim-element array literal: log w = fold over grams of
    * llr[h52(gram) % dim]. Zero shuffle — no per-gram explode relation,
    * no (doc, feat) aggregation, and zero-token documents fold over an
    * empty array to exactly 0 with no restoration join (the first
    * relational form paid a corpus-sized groupBy(doc, feat) shuffle
    * PLUS a doc_id join, measured 26 µs/doc at 5M docs — this form is a
    * pure narrow map). `round(·, 6)` pins the cross-engine double — the
    * [[LanguageModel]] / [[QualityClassifier]] round-after-sum policy:
    * the DuckDB oracle sums per-feature groups in its own order, so the
    * final round is what absorbs summation-order ulps, exactly as it
    * does for every other ln-sum oracle in the repo. */
  def logWeights(raw: DataFrame, llr: Array[Double], dim: Int): DataFrame = {
    require(llr.length == dim, s"model has ${llr.length} buckets, expected $dim")
    raw.select(col("doc_id"),
      round(weightCol(col("text"), llr, dim), 6).as("log_weight"))
  }

  /** The in-row weight fold as a reusable Column (unrounded). */
  private def weightCol(text: Column, llr: Array[Double], dim: Int): Column = {
    val llrArr = array(llr.map(lit(_)): _*)
    val toks = toksCol(text)
    val n1 = greatest(size(toks) - 1, lit(0))
    val grams = concat(toks,
      zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
        (a, b) => concat(a, lit(" "), b)))
    aggregate(grams, lit(0.0),
      (acc, g) => acc + element_at(llrArr, (h52(g) % dim).cast("int") + 1))
  }

  /** Deterministic Gumbel(0,1) noise for a doc id: u ∈ (0,1) from the
    * md5-52 hash (the +0.5 offset keeps u strictly inside the interval),
    * g = −ln(−ln u). */
  private def gumbel(docId: Column): Column = {
    val u = (h52(concat(lit("dsir:"), docId.cast("string"))).cast("double")
      + lit(0.5)) / lit(4503599627370496.0) // 2^52
    -log(-log(u))
  }

  /** End-to-end oracled selection: fit target-vs-raw on source labels,
    * weight every raw document, Gumbel-top-k resample. Output ordered by
    * the resampling key (the selection order IS the result's meaning). */
  def select(spark: SparkSession, dir: String, k: Int = DefaultK,
             dim: Int = DefaultDim): DataFrame =
    selectOn(spark, docs(spark, dir).select("doc_id", "source", "text"), k, dim)

  /** [[select]] over an arbitrary (doc_id, source, text) relation — the
    * composed-curation hook ([[Sampling.curationDsir]]). */
  def selectOn(spark: SparkSession, corpus: DataFrame, k: Int,
               dim: Int): DataFrame = {
    val labeled = corpus.select(col("doc_id"),
      col("source").isin(TargetSources: _*).as("label"), col("text"))
    val llr = fitLlr(spark, labeled, dim)
    val raw = labeled.filter(!col("label")).select("doc_id", "text")
    logWeights(raw, llr, dim)
      .withColumn("gumbel_key", round(col("log_weight") + gumbel(col("doc_id")), 6))
      .orderBy(col("gumbel_key").desc, col("doc_id"))
      .limit(k)
  }

  /** The weight relation alone (all raw documents, ordered by id) — the
    * denser oracle surface for the model + weighting math. */
  def weightsQuery(spark: SparkSession, dir: String,
                   dim: Int = DefaultDim): DataFrame = {
    val labeled = docs(spark, dir).select(col("doc_id"),
      col("source").isin(TargetSources: _*).as("label"), col("text"))
    val llr = fitLlr(spark, labeled, dim)
    logWeights(labeled.filter(!col("label")).select("doc_id", "text"), llr, dim)
      .orderBy("doc_id")
  }

  /** KL(target ‖ other) over the hashed-gram bucket distributions —
    * the paper's own acceptance metric (Xie 2023 §4 measures selection
    * quality as reduced feature-distribution divergence to the target).
    * Both distributions are add-one smoothed over all `dim` buckets; the
    * two count aggregates are dim-bounded and the division happens on
    * the driver. Used by the scale probe and the spec; selection is DONE
    * when KL(target ‖ selected) < KL(target ‖ raw). */
  def featureKl(spark: SparkSession, target: DataFrame, other: DataFrame,
                dim: Int): Double = {
    def dist(d: DataFrame): Array[Double] = {
      val counts = gramRows(d.select(lit(true).as("label"), col("text")),
          dim, Seq("label"))
        .groupBy("feat").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val n = counts.values.sum.toDouble
      (0 until dim).map(f => (counts.getOrElse(f, 0L) + 1.0) / (n + dim)).toArray
    }
    val p = dist(target)
    val q = dist(other)
    p.zip(q).map { case (pi, qi) => pi * math.log(pi / qi) }.sum
  }

  /** The md5-52 hash in DuckDB — the shared [[EngineHash]] mirror. */
  private def h52Sql(e: String): String = EngineHash.h52Sql(e)

  private def fitCtes(dim: Int, rel: String): String = {
    val tgt = TargetSources.map(s => s"'$s'").mkString(", ")
    s"""
d AS (
  SELECT doc_id, (source IN ($tgt)) AS label,
    list_filter(string_split(lower(coalesce(text, '')), ' '),
                t -> len(t) > 0) AS toks
  FROM $rel
), grams AS (
  SELECT doc_id, label,
    unnest(list_concat(toks,
      list_transform(generate_series(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i + 1]))) AS gram
  FROM d
), hashed AS (
  SELECT doc_id, label,
    CAST(${h52Sql("gram")} % $dim AS INTEGER) AS feat
  FROM grams
), tot AS (
  SELECT sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_t,
         sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS n_r
  FROM hashed
), counts AS (
  SELECT feat, sum(CASE WHEN label THEN 1 ELSE 0 END) AS c_t,
               sum(CASE WHEN NOT label THEN 1 ELSE 0 END) AS c_r
  FROM hashed GROUP BY feat
), model AS (
  SELECT f.feat,
    ln((coalesce(c.c_t, 0) + 1)::DOUBLE / (t.n_t + $dim))
      - ln((coalesce(c.c_r, 0) + 1)::DOUBLE / (t.n_r + $dim)) AS llr
  FROM (SELECT unnest(generate_series(0, $dim - 1)) AS feat) f
  LEFT JOIN counts c USING (feat) CROSS JOIN tot t
), w AS (
  SELECT r.doc_id,
    round(coalesce(s.s, 0), 6) AS log_weight
  FROM (SELECT doc_id FROM d WHERE NOT label) r
  LEFT JOIN (
    SELECT doc_id, sum(c * llr) AS s
    FROM (SELECT doc_id, feat, count(*)::DOUBLE AS c
          FROM hashed WHERE NOT label GROUP BY doc_id, feat) dc
    JOIN model USING (feat) GROUP BY doc_id
  ) s USING (doc_id)
)"""
  }

  /** `prefixCtes` (each ending with a comma) and `rel` retarget the
    * whole chain at a prepared relation — the composed-curation hook
    * ([[Sampling.curationDsirSql]]), mirroring
    * [[Sampling.curationLearnedSql]]'s parameterization. */
  def selectSql(k: Int = DefaultK, dim: Int = DefaultDim,
                prefixCtes: String = "", rel: String = "documents"): String = s"""
WITH $prefixCtes${fitCtes(dim, rel)}
SELECT doc_id, log_weight,
  round(log_weight
    - ln(-ln((${h52Sql("'dsir:' || doc_id::VARCHAR")} + 0.5)
             / 4503599627370496.0)), 6) AS gumbel_key
FROM w
ORDER BY gumbel_key DESC, doc_id
LIMIT $k
"""

  def weightsSql(dim: Int = DefaultDim): String = s"""
WITH ${fitCtes(dim, "documents")}
SELECT doc_id, log_weight FROM w ORDER BY doc_id
"""
}
