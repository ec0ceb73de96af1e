package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Measures the mega-bucket chain's recall cost (r13 verdict task 5): on a
  * constructed just-over-cap corpus, compare the keep-one representative
  * count under full pair enumeration vs the capped stride-1 chain (the r13
  * shape) vs the stride-1+2 chain (the r14 shape, [[Dedup.cappedBucketEdges]]).
  *
  * Corpus (deterministic, 5,000 docs, ids interleaved by a fixed
  * 10-doc pattern MHMHM U MHMH so hangers-on fall BETWEEN members in
  * sorted-id order — the interleaved-outlier case):
  *  - 2,500 MEMBERS of one true near-dup cluster: shared 62-word
  *    boilerplate skeleton + 12 unique payload words each → pairwise
  *    Jaccard 60/(60+12+12) ≈ 0.714 ≥ 0.5 (one true cluster; ideal
  *    keep-one representative count = 1);
  *  - 2,000 sub-threshold HANGERS-ON: same skeleton + 70 unique payload
  *    words → Jaccard vs a member ≈ 60/(60+70+12) ≈ 0.423 < 0.5, so every
  *    hanger edge FAILS exact verification, yet the hanger band-collides
  *    into the cluster's bucket with probability ≈ (60/130)² ≈ 0.21 per
  *    band (≈97% land in ≥1 of 16 bands);
  *  - 500 unrelated docs (control: must emit no pairs).
  * Members enter the skeleton's band bucket with probability (60/72)² ≈
  * 0.69 per band, so each band's bucket holds ≈1,700 members + ≈430
  * hangers > the 1,000 cap → every band goes through the capped path.
  *
  * Recall metric: connected components among MEMBERS over the verified
  * pair graph (driver union-find — probe-sized corpus). Full enumeration
  * is the truth (1 component). Overshoot = components − 1 = extra kept
  * representatives a downstream keep-one dedup retains. */
object ChainRecallProbe {

  /** Deterministic LCG so the payload-word draw is reproducible without
    * Math.random (same constants as java.util.Random). */
  private final class Lcg(seed0: Long) {
    private var s = (seed0 ^ 0x5DEECE66DL) & ((1L << 48) - 1)
    def nextInt(bound: Int): Int = {
      s = (s * 0x5DEECE66DL + 0xBL) & ((1L << 48) - 1)
      (((s >>> 17).toInt & Int.MaxValue) % bound)
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val skeleton = (0 until 62).map(i => s"skel$i").mkString(" ")
    val rng = new Lcg(42L)
    // 10-id pattern: M H M H M U M H M H → per 10 ids: 5 members,
    // 4 hangers, 1 unrelated; 5,000 ids → 2,500 / 2,000 / 500.
    val pattern = "MHMHMUMHMH"
    val rows = (0 until 5000).map { id =>
      val kind = pattern(id % 10)
      val text = kind match {
        case 'M' => skeleton + " " + (0 until 12).map(k => s"m${id}p$k").mkString(" ")
        case 'H' => skeleton + " " + (0 until 70).map(k => s"h${id}p$k").mkString(" ")
        case _ => (0 until 62).map(k => s"u${id}w${k}x${rng.nextInt(1 << 20)}").mkString(" ")
      }
      (id.toLong, text, kind.toString)
    }
    val dir = "/tmp/graft_chain_recall"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    rows.map { case (id, t, _) => (id, t) }.toDF("doc_id", "text")
      .repartition(8).write.parquet(s"$dir/documents.parquet")
    val members = rows.filter(_._3 == "M").map(_._1).toSet
    println(s"[chain-recall] corpus: ${rows.size} docs, ${members.size} members, " +
      s"${rows.count(_._3 == "H")} hangers, ${rows.count(_._3 == "U")} unrelated")

    def componentsAmongMembers(pairs: Array[(Long, Long)]): (Int, Int) = {
      // union-find over member-member verified edges only (hanger edges
      // must all fail verification; count them to assert that)
      val parent = scala.collection.mutable.Map(members.toSeq.map(m => m -> m): _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      var nonMemberEdges = 0
      pairs.foreach { case (a, b) =>
        if (members(a) && members(b)) parent(find(a)) = find(b)
        else nonMemberEdges += 1
      }
      (members.map(find).size, nonMemberEdges)
    }

    def measure(label: String, cap: Int, stride: Int): Int = {
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashDedup(spark, dir, maxBandBucket = cap,
          chainMaxStride = stride)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val wall = (System.nanoTime() - t0) / 1e9
      val (comps, nonMember) = componentsAmongMembers(pairs)
      println(f"[chain-recall] $label%-28s pairs=${pairs.length}%8d " +
        f"member_components=$comps%4d overshoot=${comps - 1}%4d " +
        f"non_member_edges=$nonMember%3d wall=$wall%7.1f s")
      comps
    }

    val full = measure("full enumeration (truth)", Int.MaxValue, 2)
    val s1 = measure("capped, stride-1 (r13)", 1000, 1)
    val s2 = measure("capped, stride-1+2 (r14)", 1000, 2)
    println(s"[chain-recall] verdict: full=$full reps, stride1=${s1} " +
      s"(overshoot ${s1 - full}), stride2=${s2} (overshoot ${s2 - full})")
    spark.stop()
  }
}
