package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Differential oracle for the hash-defined `q_simhash_pairs` query (no SQL
  * equivalent — DuckDB has no xxHash64): a SECOND, independent
  * implementation of the whole operator — canonical XXH64 from the public
  * algorithm spec (not Spark's class), plain-Scala tokenize/vote/signature,
  * and an O(n²) Hamming scan with NO banding — must produce the identical
  * pair set. Because the local side skips the 4×16-bit banding and filters
  * on Hamming directly, agreement also proves the banding is lossless at
  * maxHamming ≤ 3 (pigeonhole: ≤3 flipped bits cannot touch all 4 chunks).
  */
class SimHashDifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // --- canonical XXH64 (public reference algorithm), 64-bit seed ---------
  private val P1 = 0x9E3779B185EBCA87L; private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L; private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))
  private def readLong(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 7
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xFFL); j -= 1 }
    v
  }
  private def readInt(b: Array[Byte], i: Int): Long = {
    var v = 0L; var j = 3
    while (j >= 0) { v = (v << 8) | (b(i + j) & 0xFFL); j -= 1 }
    v
  }

  def xxh64(data: Array[Byte], seed: Long): Long = {
    val n = data.length
    var i = 0
    var h = 0L
    if (n >= 32) {
      var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
      while (i + 32 <= n) {
        v1 = rotl(v1 + readLong(data, i) * P2, 31) * P1
        v2 = rotl(v2 + readLong(data, i + 8) * P2, 31) * P1
        v3 = rotl(v3 + readLong(data, i + 16) * P2, 31) * P1
        v4 = rotl(v4 + readLong(data, i + 24) * P2, 31) * P1
        i += 32
      }
      h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
      for (v <- Seq(v1, v2, v3, v4))
        h = (h ^ (rotl(v * P2, 31) * P1)) * P1 + P4
    } else h = seed + P5
    h += n
    while (i + 8 <= n) {
      h = rotl(h ^ (rotl(readLong(data, i) * P2, 31) * P1), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= n) {
      h = rotl(h ^ (readInt(data, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < n) {
      h = rotl(h ^ ((data(i) & 0xFFL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** Plain-Scala SimHash signature with the operator's tokenization
    * contract: split on single space keeping empties, distinct preserving
    * first occurrence, NULL text behaves like "". Spark's xxhash64 seeds
    * with 42. */
  def simhashLocal(text: String): Long = {
    val toks = (if (text == null) "" else text).split(" ", -1).distinct
    val votes = new Array[Int](64)
    for (t <- toks) {
      val h = xxh64(t.getBytes("UTF-8"), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= 1L << i; i += 1 }
    sig
  }

  test("independent xxh64 agrees with known reference vector") {
    // XXH64("", seed=0) = 0xEF46DB3751D8E999 — published reference value
    assert(xxh64(Array.emptyByteArray, 0L) == 0xEF46DB3751D8E999L)
  }

  test("simhashPairs equals the independent O(n²) Hamming scan at sf0.001") {
    import org.apache.spark.sql.functions.col
    val docsLocal = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
    val sigs = docsLocal.map { case (id, t) => (id, simhashLocal(t)) }.sortBy(_._1)
    val expected = (for {
      i <- sigs.indices.iterator
      j <- Iterator.range(i + 1, sigs.length)
      ham = java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2)
      if ham <= 3
    } yield (sigs(i)._1, sigs(j)._1, ham)).toVector.sorted

    val actual = Dedup.simhashPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toVector.sorted

    assert(actual.nonEmpty, "differential corpus produced no simhash pairs")
    assert(actual == expected,
      s"simhash differential mismatch: spark=${actual.size} local=${expected.size}")
  }
}
