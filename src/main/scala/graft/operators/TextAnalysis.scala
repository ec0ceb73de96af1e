package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All pure column algebra — narrow transformations, fully codegen'd, no
  * UDFs in the hot path; at 100 TB these run at scan speed with column
  * pruning (only `doc_id` + `text` are read).
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Stopword markers per language for the n-gram/stopword langid
    * heuristic. Deterministic argmax with alphabetical tie-break. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq(" der ", " und ", " die ", " ist "),
    "en" -> Seq(" the ", " and ", " of ", " is "),
    "es" -> Seq(" el ", " la ", " los ", " es "),
    "fr" -> Seq(" le ", " la ", " et ", " est "))

  private def occurrences(c: Column, needle: String): Column =
    (length(c) - length(replace(c, lit(needle), lit("")))) / needle.length

  /** Language-ID by stopword evidence; "unknown" when no marker hits. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => occurrences(padded, m)).reduce(_ + _).cast("long")
    }
    val best = scores.foldLeft((lit("unknown"), lit(0L))) {
      case ((bestLang, bestScore), (lang, score)) =>
        // strictly-greater keeps the alphabetically-first language on ties
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }
    docs(spark, dir).select(
      (col("doc_id") +: col("lang").as("labeled_lang") +:
        best._1.as("predicted_lang") +: best._2.as("best_score") +:
        scores.map { case (l, s) => s.as(s"score_$l") }): _*
    ).orderBy("doc_id")
  }

  val langIdSql: String = {
    def occ(m: String) =
      s"(length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', '$m', ''))) // ${m.length}"
    val scoreExprs = LangMarkers.map { case (lang, ms) =>
      lang -> ms.map(occ).mkString("(", " + ", ")")
    }
    val scoreCols = scoreExprs.map { case (l, e) => s"CAST($e AS BIGINT) AS score_$l" }.mkString(",\n  ")
    // The CASE ladder mirrors the Spark fold's strictly-greater semantics:
    // on ties the language earliest in (de,en,es,fr) order wins.
    s"""
WITH scored AS (
  SELECT doc_id, lang AS labeled_lang, $scoreCols
  FROM documents
)
SELECT doc_id, labeled_lang,
  CASE
    WHEN score_fr > score_es AND score_fr > score_en AND score_fr > score_de AND score_fr > 0 THEN 'fr'
    WHEN score_es > score_en AND score_es > score_de AND score_es > 0 THEN 'es'
    WHEN score_en > score_de AND score_en > 0 THEN 'en'
    WHEN score_de > 0 THEN 'de'
    ELSE 'unknown' END AS predicted_lang,
  greatest(score_de, score_en, score_es, score_fr, 0) AS best_score,
  score_de, score_en, score_es, score_fr
FROM scored ORDER BY doc_id
""".trim
  }

  /** Quality metrics — all integer-valued so the oracle compare is exact:
    * char/word/digit/punct counts and longest-word length. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    docs(spark, dir).select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      size(words).as("n_words"),
      length(regexp_replace(col("text"), "[^0-9]", "")).as("n_digits"),
      length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("n_punct"),
      array_max(transform(words, w => length(w))).as("max_word_len"),
      size(array_distinct(words)).as("n_distinct_words")
    ).orderBy("doc_id")
  }

  val qualitySql: String = """
SELECT doc_id,
  CAST(length(text) AS INTEGER) AS n_chars,
  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words,
  CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INTEGER) AS n_digits,
  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS INTEGER) AS n_punct,
  CAST(list_max(list_transform(string_split(text, ' '), w -> length(w))) AS INTEGER) AS max_word_len,
  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_words
FROM documents ORDER BY doc_id
""".trim

  /** Token counting: whitespace tokens plus a BPE-ish regex tokenization
    * (runs of letters | runs of digits | single non-space symbol). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      size(split(col("text"), "\\s+")).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .as("regex_tokens")
    ).orderBy("doc_id")

  val tokenCountSql: String = """
SELECT doc_id,
  CAST(len(regexp_split_to_array(text, '\s+')) AS INTEGER) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS regex_tokens
FROM documents ORDER BY doc_id
""".trim

  /** Canonicalizing fingerprint: md5 over lowercased, whitespace-collapsed
    * text — the cheap exact-dup key for corpus-scale dedup via group-by or
    * anti-join against an already-processed ledger. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"),
      sha2(col("text"), 256).as("sha256")
    ).orderBy("doc_id")

  val fingerprintSql: String = """
SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
  sha256(text) AS sha256
FROM documents ORDER BY doc_id
""".trim

  /** Multimodal-column plumbing: text→binary as a stand-in for image/audio
    * payloads; metadata extraction stays columnar (byte size, codepoints,
    * head bytes as hex). The decode/feature step for real media lives in
    * [[Multimodal]] as a typed mapPartitions with a deterministic stub. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      octet_length(col("text")).as("n_bytes"),
      length(col("text")).as("n_codepoints"),
      hex(encode(substring(col("text"), 1, 8), "UTF-8")).as("head_hex")
    ).orderBy("doc_id")

  val binaryMetaSql: String = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
  CAST(length(text) AS INTEGER) AS n_codepoints,
  upper(hex(encode(substr(text, 1, 8)))) AS head_hex
FROM documents ORDER BY doc_id
""".trim
}
