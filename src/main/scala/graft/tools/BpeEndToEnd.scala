package graft.tools

import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end BPE tokenizer build on a REAL-DEPTH vocabulary (r10 verdict
  * item: the 30k-merge loop number was measured on a bare synthetic
  * vocabulary; the sf corpora exhaust at 89 merges — no corpus-in,
  * tokens-out run existed). This tool synthesizes a corpus FROM a
  * Zipf-distributed vocabulary deep enough to sustain ≥10k merges, then
  * runs the full deployment path and prints the wall SPLIT:
  *
  *   scan   — the one distributed word-frequency aggregate + collect
  *   loop   — [[TextAnalysis.bpeTrainLocal]] (driver-memory merge loop)
  *   encode — [[TextAnalysis.bpeEncodeCountsLocalOn]] (distinct words
  *            through the min-rank kernel, then explode+join+agg)
  *
  * plus the compression the trained merges actually buy (codepoints per
  * BPE token before/after). Corpus generation is deterministic (splitmix
  * per doc) so runs are comparable.
  *
  * Usage: BpeEndToEnd [k] [nDocs] [wordsPerDoc] [vocabSize]
  *        (defaults 10000, 100000, 100, 500000) */
object BpeEndToEnd {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic word for vocabulary index i: 3–14 lower-case letters
    * derived from the mixed index (collisions merely shrink the vocab). */
  private[tools] def wordOf(i: Long): String = {
    val h = mix(i)
    val len = 3 + (Math.floorMod(h, 12L)).toInt
    val sb = new StringBuilder(len)
    var s = h
    var j = 0
    while (j < len) {
      s = mix(s + j)
      sb.append(('a' + Math.floorMod(s, 26L).toInt).toChar)
      j += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10000)
    val nDocs = if (args.length > 1) args(1).toLong else 100000L
    val wordsPerDoc = if (args.length > 2) args(2).toInt else 100
    val vocabSize = if (args.length > 3) args(3).toLong else 500000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Zipf(α≈1) sampling: u uniform in (0,1) → index ⌊vocabSize^u⌋ — the
    // natural-language frequency shape the merge loop's heap costs track
    val docs = spark.range(nDocs)
      .repartition(spark.sparkContext.defaultParallelism)
      .map { d =>
        val words = Array.tabulate(wordsPerDoc) { j =>
          val u = (Math.floorMod(mix(d * 1000003L + j), 1L << 52)).toDouble / (1L << 52)
          wordOf(math.min(vocabSize - 1, math.pow(vocabSize.toDouble, u).toLong))
        }
        (d, words.mkString(" "))
      }
      .toDF("doc_id", "text")
    docs.persist()
    val nTok = docs.count() * wordsPerDoc

    val t0 = System.nanoTime()
    val vocab = docs
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(length(col("w")) >= 2 && !col("w").contains(TextAnalysis.BpeSep))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val tScan = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val merges = TextAnalysis.bpeTrainLocal(vocab, k)
    val tLoop = (System.nanoTime() - t1) / 1e9

    val t2 = System.nanoTime()
    val enc = TextAnalysis.bpeEncodeCountsLocalOn(docs,
      merges.map(m => (m._2, m._3)))
    val agg = enc.agg(sum("n_bpe_tokens"), sum("n_ws_tokens")).collect()(0)
    val tEnc = (System.nanoTime() - t2) / 1e9
    val bpeToks = agg.getLong(0)

    val cps = vocab.map { case (w, f) => w.codePointCount(0, w.length) * f }.sum
    println(f"[bpee2e] corpus: docs=$nDocs tokens=$nTok distinctWords=${vocab.length} " +
      f"codepoints(in-vocab words)=$cps")
    println(f"[bpee2e] merges requested=$k learned=${merges.length}")
    println(f"[bpee2e] wall: scan=$tScan%.1f s  loop=$tLoop%.1f s  encode=$tEnc%.1f s  " +
      f"total=${tScan + tLoop + tEnc}%.1f s")
    println(f"[bpee2e] tokens: bpe=$bpeToks ws=${agg.getLong(1)} " +
      f"codepointsPerBpeToken=${cps.toDouble / bpeToks}%.2f " +
      f"bpePerWsToken=${bpeToks.toDouble / agg.getLong(1)}%.2f")
    spark.stop()
  }
}
