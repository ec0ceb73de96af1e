package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over the corpus — BM25 (Robertson/Sparck
  * Jones; the Okapi weighting every search engine ships). A curation
  * pipeline uses this to INSPECT its corpus: "show me the documents
  * about X" during filter/dedup debugging, or to build weak labels.
  *
  * Scale shape: term frequencies are one map-side-combined aggregate over
  * exploded tokens (the inverted-index build — the shuffle carries
  * (term, doc, tf) rows); document frequencies reduce from tf rows (tiny:
  * one row per distinct term); the QUERY terms are a literal broadcast —
  * scoring touches only postings of the query's terms, which is the
  * point of an inverted index. Scores are deterministic: fixed k1/b,
  * ln-based idf, round(·, 6), doc_id tie-break.
  */
object Search {

  val K1 = 1.2
  val B = 0.75

  /** Default query + cutoff, shared by [[bm25]] and [[bm25Sql]] — a
    * single definition so the two sides of the oracle can never silently
    * run different queries. */
  val DefaultTerms: Seq[String] = Seq("the", "data", "model")
  val DefaultK = 20

  /** Top-k BM25 over whitespace-lowered tokens for a fixed query-term
    * set. idf = ln(1 + (N − df + 0.5)/(df + 0.5)) — the non-negative
    * Lucene variant. */
  def bm25(spark: SparkSession, dir: String,
           queryTerms: Seq[String] = DefaultTerms,
           k: Int = DefaultK): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val toks = docs.select(col("doc_id"),
      explode(split(lower(coalesce(col("text"), lit(""))), " ")).as("term"))
    val q = queryTerms.map(_.toLowerCase).distinct
    // ONE tokenize pass (r15 opt, guide §2.3 aggregate-before-shuffle):
    // the r14 shape materialized tf and dl as two separate checkpoints,
    // each re-running the full tokenization (two corpus scans + explodes).
    // For a FIXED small query-term set, per-term tf folds into the dl
    // aggregate as conditional counts — one map-side-combined groupBy per
    // doc carrying |q| extra long columns — and the postings relation
    // derives from it by an in-stage unpivot (tf > 0 keeps exactly the
    // (doc, term) rows the filtered aggregate produced; counts are longs,
    // exact under any merge order). The single checkpoint is referenced
    // by postings, lengths, and corpus stats.
    // stats-honest checkpoint: one row per DOCUMENT — a static broadcast
    // off garbage origin stats would be lethal at corpus scale (the
    // df/stats broadcasts below stay explicit: those are contract-tiny —
    // one row per query term / one row total).
    val perDoc = org.apache.spark.sql.graft.CheckpointShim.statsHonestLocalCheckpoint(
      toks.groupBy("doc_id").agg(
        count(lit(1)).as("dl"),
        q.zipWithIndex.map { case (t, i) =>
          sum(when(col("term") === t, 1L).otherwise(0L)).as(s"__tf$i")
        }: _*))
    val tf = perDoc
      .select(col("doc_id"), explode(array(q.zipWithIndex.map { case (t, i) =>
        struct(lit(t).as("term"), col(s"__tf$i").as("tf"))
      }: _*)).as("p"))
      .select(col("doc_id"), col("p.term").as("term"), col("p.tf").as("tf"))
      .filter(col("tf") > 0)
    val dl = perDoc.select("doc_id", "dl")
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * (col("tf") * lit(K1 + 1)) /
          (col("tf") + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(round(sum(col("w")), 6).as("score"),
        count(lit(1)).as("terms_hit"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Oracle: identical tokenization, postings, and weighting; same
    * round-after-sum policy (ln is IEEE libm on both engines; the final
    * round absorbs summation-order ulps). */
  def bm25Sql(queryTerms: Seq[String] = DefaultTerms,
              k: Int = DefaultK): String = s"""
WITH ${bm25Ctes(queryTerms)}
SELECT doc_id, round(SUM(w), 6) AS score, COUNT(*) AS terms_hit
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT $k
""".trim

  /** The BM25 CTE chain through `scored` — ONE definition shared by
    * [[bm25Sql]] and [[hybridRrfSql]] (the shared-definitions
    * discipline). */
  private def bm25Ctes(queryTerms: Seq[String]): String = {
    val q = queryTerms.map(_.toLowerCase).distinct
      .map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""toks AS (
  SELECT doc_id, unnest(string_split(lower(coalesce(text, '')), ' ')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
), dl AS (
  SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
), stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT AVG(dl) FROM dl) AS avgdl
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.doc_id,
    ln(1.0 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) *
      (tf.tf * (1 + $K1)) /
      (tf.tf + $K1 * (1 - $B + $B * dl.dl / s.avgdl)) AS w
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  WHERE tf.term IN ($q)
)""".trim
  }

  /** RRF constant — Cormack et al. 2009's k=60, the value every hybrid
    * stack ships. */
  val RrfK = 60

  /** Hybrid retrieval — Reciprocal Rank Fusion (Cormack, Clarke &
    * Büttcher 2009) of the sparse BM25 leg and a dense cosine leg:
    * `rrf(d) = Σ_legs 1/(60 + rank_leg(d))`, summed over the legs that
    * retrieved d in their top-`n`. The dense leg is the exact top-n of
    * the query document's embedding (vec_id = doc_id alignment of the
    * corpus tables); the published deployment swaps in the IVF/PQ index
    * search for the same relation shape.
    *
    * Scale shape: both legs end k-bounded (BM25's postings-only scoring
    * + limit; the dense leg is one broadcast-corpus pass), so fusion
    * joins two n-row relations — driver-scale work after two scans.
    * Ranks are computed on each leg's rounded/tie-broken order (the
    * exact orders the standalone oracles pin), so fusion is
    * deterministic. */
  def hybridRrf(spark: SparkSession, dir: String,
                queryTerms: Seq[String] = DefaultTerms,
                n: Int = 50, k: Int = DefaultK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // n-row relation: the global window is a single tiny partition
    val sparse = bm25(spark, dir, queryTerms, n)
      .withColumn("rank_s",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select("doc_id", "rank_s")
    val dense = Similarity.topK(spark, dir, k = n, nQueries = 1)
      .select(col("neighbor_id").as("doc_id"), col("rk").as("rank_d"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("rank_s")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RrfK) + col("rank_d")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select("doc_id", "rrf", "rank_s", "rank_d")
  }

  /** Oracle: the shared BM25 CTEs + the exact dense top-n (the
    * q_ann_topk chain at nQueries=1), ranked and fused identically. */
  def hybridRrfSql(queryTerms: Seq[String] = DefaultTerms,
                   n: Int = 50, k: Int = DefaultK): String = s"""
WITH ${bm25Ctes(queryTerms)}, bm AS (
  SELECT doc_id, round(SUM(w), 6) AS score
  FROM scored GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT $n
), sparse AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank_s
  FROM bm
), dsims AS (
  SELECT b.vec_id AS doc_id, ${Similarity.CosineSqlExpr} AS cos
  FROM embeddings a, embeddings b
  WHERE a.vec_id < 1 AND a.vec_id <> b.vec_id
), dense AS (
  SELECT doc_id, CAST(rk AS INTEGER) AS rank_d FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS rk
    FROM dsims) t
  WHERE rk <= $n
)
SELECT doc_id,
  round(coalesce(1.0 / ($RrfK + rank_s), 0)
      + coalesce(1.0 / ($RrfK + rank_d), 0), 6) AS rrf,
  rank_s, rank_d
FROM sparse FULL OUTER JOIN dense USING (doc_id)
ORDER BY rrf DESC, doc_id LIMIT $k
""".trim
}
