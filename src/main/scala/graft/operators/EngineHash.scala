package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The repo's engine-portable 52-bit md5 hash — ONE definition for the
  * Column form and its DuckDB mirror (the shared-definitions
  * discipline applied to the oracle-critical hash: [[QualityClassifier]]
  * features, [[Dsir]] grams and Gumbel seeds, and [[BloomDedup]]
  * positions all derive from this pair, and a fix to one side that
  * missed a twin copy would silently de-sync the two engines'
  * position/feature families). */
private[graft] object EngineHash {

  /** First 13 hex digits of md5 as a non-negative long (52 bits). */
  def h52(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** DuckDB mirror of [[h52]]. The inner lambda variable is `hi`, NOT
    * `i` — this hash is spliced inside `list_transform(…, i -> …)`
    * lambdas whose `i` it must not shadow (a shadowing bug here once
    * collapsed all k Bloom probe positions to one value, caught by the
    * python cross-check). */
  def h52Sql(e: String): String =
    s"""CAST(list_sum(list_transform(generate_series(1, 13),
      hi -> (strpos('0123456789abcdef', substr(md5($e), hi, 1)) - 1)
           * (1::BIGINT << (4 * (13 - hi))))) AS BIGINT)"""
}
