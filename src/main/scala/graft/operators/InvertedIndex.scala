package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The capped inverted-index pair kernel shared by the near-dup family
  * ([[Dedup.jaccardPairs]] on shingle hashes, [[TextAnalysis.winnowOverlap]]
  * / [[TextAnalysis.passages]] on winnowing fingerprints). One
  * implementation so a fix lands once:
  *
  *   1. df-cap with a count-only aggregate — constant-size buffers absorb
  *      unbounded hot keys; keys above `maxDf` are dropped (skew guard);
  *   2. `collect_list` buckets built only AFTER the cap, so no aggregation
  *      buffer exceeds `maxDf` ids;
  *   3. candidate pairs generate LOCALLY inside each bucket (the unit of
  *      work the cap bounds: ≤ maxDf·(maxDf−1)/2 pairs), with singleton
  *      buckets skipped in columnar space before the typed decode;
  *   4. per-doc retained counts joined onto the pair aggregates WITHOUT a
  *      forced broadcast hint: the relation has one row per document, so
  *      at corpus scale it exceeds the broadcast ceiling — Catalyst/AQE
  *      picks broadcast when it is actually small and a shuffled join when
  *      it is not (a hard `broadcast()` here would fail outright at the
  *      design scale).
  */
private[operators] object InvertedIndex {

  /** Intermediate relations, for callers that need more than the pairs. */
  case class Parts(hot: DataFrame, capped: DataFrame, pairsAgg: DataFrame)

  /** @param rel distinct (doc_id: long, key: long) occurrence rows —
    *            callers are responsible for per-document distinctness and
    *            for checkpointing `rel` if its lineage is expensive (it is
    *            read three times here).
    * @return `pairsAgg`: (id_a, id_b, shared, na, nb) for every pair of
    *         documents sharing ≥ 1 retained key. */
  def parts(rel: DataFrame, maxDf: Int): Parts = {
    import rel.sparkSession.implicits._
    val hot = rel.groupBy("key").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("key")
    val capped = rel.join(broadcast(hot), Seq("key"), "left_anti")
    val buckets = capped
      .groupBy("key").agg(collect_list(col("doc_id")).as("ids"))
      .select("ids").localCheckpoint()
    val cnts = buckets.select(explode(col("ids")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
    val rawPairs = buckets.filter(size(col("ids")) >= 2)
      .as[Seq[Long]].flatMap { bucket =>
        val ids = bucket.toArray
        java.util.Arrays.sort(ids)
        for (i <- ids.indices.iterator; j <- Iterator.range(i + 1, ids.length))
          yield (ids(i), ids(j))
      }.toDF("id_a", "id_b")
    val pairsAgg = rawPairs
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared"))
      .join(cnts.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(cnts.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
    Parts(hot, capped, pairsAgg)
  }
}
