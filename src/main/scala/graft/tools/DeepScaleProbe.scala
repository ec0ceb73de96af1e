package graft.tools

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The THIRD decade: does the nprobe recall-floor rule still hold at
  * 1000× (2M vectors — exactly the exact-baseline guard's cap, so this
  * is the largest corpus whose recall is still measurable against the
  * true top-k)? Unlike [[IvfNprobeFrontier]] (which retrains per sweep
  * point through the in-memory path), this probe measures the DEPLOYMENT
  * shape: one [[IvfIndex.build]], then the stored bucket-pruned search
  * swept over nprobe — so the sweep pays no repeated training and the
  * timings are the per-batch numbers a production gate would see.
  *
  * Usage: runMain graft.tools.DeepScaleProbe [srcDir] [factor] [genDir] [tiers]
  * tiers: `flat` (default), `imi`, or `flat,imi` — the IMI tier builds the
  * persistent product-cell index on the same corpus and measures its
  * recall tax vs the flat index at the matched (rule / 2·rule) budgets.
  */
object DeepScaleProbe {

  /** Compressed parquet column-chunk bytes per column of a stored table —
    * the honest per-tier candidate-scan I/O accounting (footer metadata
    * only; no data read). */
  private def parquetColumnBytes(spark: SparkSession,
                                 table: String): Map[String, Long] = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = loc.getFileSystem(conf)
    val files = fs.listStatus(loc).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    files.foreach { p =>
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf))
      try {
        rd.getFooter.getBlocks.forEach { b =>
          b.getColumns.forEach { c =>
            val name = c.getPath.toDotString.split('.').head
            acc.update(name, acc.getOrElse(name, 0L) + c.getTotalSize)
          }
        }
      } finally rd.close()
    }
    acc.toMap
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 1000
    val gen = if (args.length > 2) args(2) else s"/tmp/graft_scale${factor}x_vec"
    val tiers = (if (args.length > 3) args(3) else "flat")
      .split(',').map(_.trim).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-deep-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // chunked generation commits data append-by-append, so an existing
    // directory is only trustworthy if it holds EXACTLY factor × base rows
    // — a crashed partial run must be regenerated, not silently measured
    val baseN = spark.read.parquet(s"$src/embeddings.parquet").count()
    val existing = new java.io.File(s"$gen/embeddings.parquet").isDirectory
    val complete = existing &&
      spark.read.parquet(s"$gen/embeddings.parquet").count() == baseN * factor
    if (existing && !complete)
      println(s"[deep] $gen is a PARTIAL generation — regenerating")
    if (!complete) {
      println(s"[deep] generating ${factor}x vector corpus at $gen")
      val t0 = System.nanoTime()
      ScaleProbe.generateEmbeddings(spark, src, factor, gen)
      println(f"[deep] generated in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.sqlContext.clearCache()
      System.gc()
    }
    val emb = spark.read.parquet(s"$gen/embeddings.parquet")
    val n = emb.count()
    val cells = Similarity.cellsFor(n)
    val rule = Similarity.nprobeFor(cells)
    println(s"[deep] n=$n cells=$cells rule nprobe=$rule")
    // corpus-query exact ground truth: only the flat/imi tiers use it,
    // and it only exists under the exact cap — the plant tier carries its
    // own (planted) truth and runs arbitrarily deep
    lazy val exact: Set[(Long, Long)] = {
      val tx = System.nanoTime()
      val e = Similarity.topK(spark, gen, k = 5, nQueries = 50)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      println(f"[deep] exact ground truth in ${(System.nanoTime() - tx) / 1e9}%.1f s")
      drop()
      e
    }
    val queries = emb.filter(col("vec_id") < 50)
    println("\n| corpus | n | cells | variant | nprobe | cell frac | warm s | recall@5 |")
    println("|---|---|---|---|---|---|---|---|")
    def sweep(variant: String, cellCount: Int, nprobe: Int)(
        run: Int => org.apache.spark.sql.DataFrame): Unit = {
      def once(): (Double, Set[(Long, Long)]) = {
        val t0 = System.nanoTime()
        val got = run(nprobe).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        ((System.nanoTime() - t0) / 1e9, got)
      }
      once(); drop()
      val (warm, got) = once(); drop()
      val recall = (exact & got).size.toDouble / exact.size
      val label = if (nprobe == rule) s"$nprobe (rule)" else s"$nprobe"
      println(f"| ${factor}x | $n | $cellCount | $variant | $label | " +
        f"${nprobe.toDouble / cellCount}%.3f | $warm%.2f | $recall%.3f |")
    }
    if (tiers("flat")) {
      val tag = "deepivf"
      val idxDir = java.nio.file.Files.createTempDirectory("graft-deepivf").toString
      val tb = System.nanoTime()
      IvfIndex.build(emb, idxDir, tag, buckets = 32)
      println(f"[deep] IvfIndex.build (train+assign+write) ${(System.nanoTime() - tb) / 1e9}%.1f s")
      drop()
      for ((variant, nprobe) <- Seq(("float", 8), ("float", rule / 2), ("float", rule),
          ("float", 2 * rule), ("int8", rule), ("int8", 2 * rule))) {
        sweep(variant, cells, nprobe) { np =>
          if (variant == "int8") IvfIndex.searchInt8(spark, tag, queries, nprobe = np)
          else IvfIndex.search(spark, tag, queries, nprobe = np)
        }
      }
      Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag))
        .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
    }
    if (tiers("plant") || tiers("plantimi")) {
      import graft.operators.RecallEstimator
      // The FOURTH decade: planted-panel recall estimation past the exact
      // cap (see RecallEstimator). Validation contract: wherever n is
      // still under the cap, exact truth is computed too and the two
      // recalls must be IDENTICAL (the margin makes the planted set the
      // true top-5).
      val tp = System.nanoTime()
      val panel = RecallEstimator.panel(nQueries = 50)
      val pc = RecallEstimator.plantedCorpus(emb, panel)
      // ceiling audit — whole-block stratum targeting ~200k vectors:
      // within-block cosines are mask-invariant, so sampled blocks give
      // exact per-block maxima and only the cross-block tail needs the
      // sample-size argument (reported alongside the margin)
      val mod = math.max(1L, n / 200000L)
      val stratum = emb.filter(
        expr(s"(vec_id div ${ScaleProbe.BlockStride}) % $mod = 0"))
      val nStratum = stratum.count()
      val ceiling = RecallEstimator.naturalCeiling(stratum, panel)
      val margin = panel.minPlantedCos - ceiling.values.max
      println(f"[plant] panel 50×5 built in ${(System.nanoTime() - tp) / 1e9}%.1f s; " +
        f"min planted cos ${panel.minPlantedCos}%.4f, stratum ceiling " +
        f"${ceiling.values.max}%.4f over $nStratum vectors (1/$mod of blocks) " +
        f"→ margin $margin%.4f")
      require(margin > 0, "ceiling audit failed: planted set is not the true top-5")
      if (n + 250 <= Similarity.MaxExactCorpusRows) {
        val ex = RecallEstimator.exactTopK(pc, panel, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        val agree = ex == panel.plantedSet
        println(s"[plant] VALIDATION at n=$n: exact top-5 ≡ planted set: $agree")
        require(agree, "estimator validation failed at sub-cap scale")
      }
      drop()
      def sweepPlanted(variant: String, cellCount: Int, nprobes: Seq[Int])(
          run: Int => org.apache.spark.sql.DataFrame): Unit = {
        println(s"\n| corpus | n | cells ($variant) | nprobe | cell frac | warm s | planted recall@5 | margin |")
        println("|---|---|---|---|---|---|---|---|")
        for (nprobe <- nprobes.distinct) {
          def once(): (Double, Double) = {
            val t0 = System.nanoTime()
            val rec = RecallEstimator.recallAgainst(panel, run(nprobe))
            ((System.nanoTime() - t0) / 1e9, rec)
          }
          once(); drop()
          val (warm, rec) = once(); drop()
          val label = if (nprobe == rule) s"$nprobe (rule)" else s"$nprobe"
          println(f"| ${factor}x | $n | $cellCount | $label | " +
            f"${nprobe.toDouble / cellCount}%.3f | $warm%.2f | $rec%.3f | $margin%.3f |")
        }
      }
      if (tiers("plant")) {
        val tag = "deepplant"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deepplant").toString
        val tb = System.nanoTime()
        graft.operators.IvfIndex.build(pc, idxDir, tag, buckets = 32)
        println(f"[plant] IvfIndex.build on planted corpus " +
          f"${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        sweepPlanted("flat", cells, Seq(8, rule / 2, rule, 2 * rule)) { np =>
          graft.operators.IvfIndex.search(spark, tag, panel.queries(spark), nprobe = np)
        }
        Seq(graft.operators.IvfIndex.modelTable(tag), graft.operators.IvfIndex.assignTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
      if (tiers("plantimi")) {
        // the past-the-cap index under the estimator: does the IMI hold
        // the floor in the fourth decade too?
        val k1 = graft.operators.Imi.k1For(n)
        val tag = "deepplantimi"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deepplantimi").toString
        val tb = System.nanoTime()
        graft.operators.ImiIndex.build(pc, idxDir, tag, buckets = 32, k1 = k1)
        println(f"[plant] ImiIndex.build (k1=$k1 → ${k1 * k1} product cells) " +
          f"${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        sweepPlanted("imi", k1 * k1, Seq(rule, 2 * rule)) { np =>
          graft.operators.ImiIndex.search(spark, tag, panel.queries(spark), nprobe = np)
        }
        Seq(graft.operators.ImiIndex.modelTable(tag), graft.operators.ImiIndex.assignTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
    }
    if (tiers("natural") || tiers("naturalimi") || tiers("naturalpq") ||
        tiers("naturaladaptive") || tiers("plantpq") || tiers("heteroadaptive")) {
      import graft.operators.RecallEstimator
      // NATURAL-BAND recall (r8 verdict item 3, carried through r9): the
      // planted panel measures the cos 0.86–0.98 gate band; the semantic-
      // search consumer lives at the corpus's own top-5 cosines
      // (≈ 0.4–0.5), where constant-nprobe collapsed to 0.236 at 2M and
      // nothing was measured past it. The block-stratum factorization
      // (RecallEstimator.blockStratumTopK) gives EXACT corpus-query truth
      // at ANY factor — no ceiling assumption, no margin, no bound: the
      // sign-mask commutes through the dot product, so the quadratic
      // decomposes into (50·factor) masked probes against the 1× base.
      val k = 5
      val base = spark.read.parquet(s"$src/embeddings.parquet")
      val qids = (0L until 50L).toSeq
      val tt = System.nanoTime()
      val truth = RecallEstimator.blockStratumTopK(base, qids, factor,
        ScaleProbe.BlockStride, k, ScaleProbe.sign)
      val truthSet = truth.toSeq.flatMap { case (q, ns) => ns.map(n => (q, n._1)) }.toSet
      val kth = truth.values.map(_.last._2).toSeq.sorted
      println(f"[natural] block-stratum truth (${qids.length}×$factor probes) in " +
        f"${(System.nanoTime() - tt) / 1e9}%.1f s; k-th-neighbor cos band " +
        f"min/med/max ${kth.head}%.3f/${kth(kth.length / 2)}%.3f/${kth.last}%.3f")
      // validation under the exact cap: the factorized truth must equal
      // the plain quadratic truth EXACTLY (set equality, same tie-break)
      if (n <= Similarity.MaxExactCorpusRows) {
        val ex = Similarity.topK(spark, gen, k = k, nQueries = 50)
          .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        val agree = ex == truthSet
        println(s"[natural] VALIDATION at n=$n: quadratic top-5 ≡ block-stratum top-5: $agree")
        require(agree, "block-stratum truth disagrees with the quadratic under the cap")
      }
      drop()
      def sweepNatural(variant: String, cellCount: Int, nprobes: Seq[Int])(
          run: Int => org.apache.spark.sql.DataFrame): Unit = {
        println(s"\n| corpus | n | cells ($variant) | nprobe | cell frac | warm s | natural recall@5 |")
        println("|---|---|---|---|---|---|---|")
        for (nprobe <- nprobes.distinct) {
          def once(): (Double, Double) = {
            val t0 = System.nanoTime()
            val got = run(nprobe).collect()
              .map(r => (r.getLong(0), r.getLong(2))).toSet
            ((System.nanoTime() - t0) / 1e9, (got & truthSet).size.toDouble / truthSet.size)
          }
          once(); drop()
          val (warm, rec) = once(); drop()
          val label = if (nprobe == rule) s"$nprobe (rule)" else s"$nprobe"
          println(f"| ${factor}x | $n | $cellCount | $label | " +
            f"${nprobe.toDouble / cellCount}%.3f | $warm%.2f | $rec%.3f |")
        }
      }
      if (tiers("natural")) {
        val tag = "deepnat"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deepnat").toString
        val tb = System.nanoTime()
        IvfIndex.build(emb, idxDir, tag, buckets = 32)
        println(f"[natural] IvfIndex.build ${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        sweepNatural("flat", cells, Seq(8, rule / 2, rule, 2 * rule, 4 * rule)) { np =>
          IvfIndex.search(spark, tag, queries, nprobe = np)
        }
        Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
      if (tiers("naturalpq")) {
        // the PQ/ADC tier vs the int8 tier it undercuts (r11 verdict item
        // 1): same natural truth, same probe budgets; candidate-scan
        // BYTES are accounted from the parquet footers — the compressed
        // column-chunk sizes of exactly the columns each tier's scan
        // reads (bucket pruning selects the same fraction for both, so
        // the table-level column ratio IS the candidate-scan ratio)
        val tag = "deepnatpq"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deepnatpq").toString
        // SPARK_GRAFT_PQ_M sweeps the code size (m bytes/vector): m=8 is
        // the default 8-byte code; m=16/32 halve/quarter the per-subspace
        // dimensionality — finer reconstruction for more scan bytes
        val pqM = sys.env.get("SPARK_GRAFT_PQ_M").map(_.toInt).getOrElse(8)
        // SPARK_GRAFT_PQ_RES=1 switches to the residual tier (IVFADC-
        // proper): same code bytes, codes quantize rot(x − c_cell)
        val pqRes = sys.env.get("SPARK_GRAFT_PQ_RES").contains("1")
        val tb = System.nanoTime()
        IvfIndex.build(emb, idxDir, tag, buckets = 32,
          pq = graft.operators.Pq.PqSpec(m = pqM, residual = pqRes))
        println(f"[naturalpq] IvfIndex.build (+PQ m=$pqM residual=$pqRes codebooks) " +
          f"${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        val byCol = parquetColumnBytes(spark, IvfIndex.assignTable(tag))
        def tierBytes(cols: Seq[String]): Long =
          cols.map(c => byCol.getOrElse(c, 0L)).foldLeft(0L)(_ + _)
        val common = Seq("vec_id", "cid")
        println(f"[naturalpq] stored candidate bytes (compressed parquet column chunks): " +
          f"float=${tierBytes(common ++ Seq("embedding", "nrm"))}%,d  " +
          f"int8=${tierBytes(common ++ Seq("qvec", "qnrm"))}%,d  " +
          f"pq=${tierBytes(common ++ Seq("pqcode", "nrm"))}%,d")
        sweepNatural("int8", cells, Seq(rule, 4 * rule)) { np =>
          IvfIndex.searchInt8(spark, tag, queries, nprobe = np)
        }
        sweepNatural("pq/adc", cells, Seq(rule, 4 * rule)) { np =>
          IvfIndex.searchPq(spark, tag, queries, nprobe = np)
        }
        // the widen knob IS the tier's contract: ADC is a candidate
        // FILTER whose ordering noise the float re-rank absorbs — sweep
        // how wide the cut must be to recover the float recall
        for (w <- Seq(4, 16, 64, 256)) {
          sweepNatural(s"pq+rerank(w$w)", cells, Seq(4 * rule)) { np =>
            IvfIndex.searchPqRerank(spark, tag, queries, nprobe = np, widen = w)
          }
        }
        Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag), IvfIndex.pqModelTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
      if (tiers("plantpq")) {
        // the GATE band (planted cos 0.86–0.98 — the dup/ingest-gate
        // regime): where the natural band's tight cosine spacing defeats
        // 8-byte ADC ordering, the gate band's separation should not
        import graft.operators.RecallEstimator
        val panel = RecallEstimator.panel(nQueries = 50)
        val pc = RecallEstimator.plantedCorpus(emb, panel)
        val tag = "deepplantpq"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deepplantpq").toString
        val pqM = sys.env.get("SPARK_GRAFT_PQ_M").map(_.toInt).getOrElse(8)
        val pqRes = sys.env.get("SPARK_GRAFT_PQ_RES").contains("1")
        val tb = System.nanoTime()
        IvfIndex.build(pc, idxDir, tag, buckets = 32,
          pq = graft.operators.Pq.PqSpec(m = pqM, residual = pqRes))
        println(f"[plantpq] IvfIndex.build (+PQ m=$pqM residual=$pqRes) " +
          f"${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        println(s"\n| corpus | n | variant | nprobe | warm s | planted recall@5 |")
        println("|---|---|---|---|---|---|")
        for ((variant, run) <- Seq[(String, Int => org.apache.spark.sql.DataFrame)](
          ("int8", np => IvfIndex.searchInt8(spark, tag, panel.queries(spark), nprobe = np)),
          ("pq/adc", np => IvfIndex.searchPq(spark, tag, panel.queries(spark), nprobe = np)),
          ("pq+rerank(w4)", np => IvfIndex.searchPqRerank(spark, tag, panel.queries(spark), nprobe = np, widen = 4)))) {
          def once(): (Double, Double) = {
            val t0 = System.nanoTime()
            val rec = RecallEstimator.recallAgainst(panel, run(rule))
            ((System.nanoTime() - t0) / 1e9, rec)
          }
          once(); drop()
          val (warm, rec) = once(); drop()
          println(f"| ${factor}x | $n | $variant | $rule (rule) | $warm%.2f | $rec%.3f |")
        }
        Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag), IvfIndex.pqModelTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
      if (tiers("naturaladaptive")) {
        // the adaptive per-query budget vs the fixed budgets it arbitrates
        // between (r11 verdict item 2): recall + warm wall of
        // stability-terminated probing (chunk = rule, cap 4 chunks)
        // against fixed rule and fixed 4·rule, same natural truth
        val tag = "deepnatad"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deepnatad").toString
        val tb = System.nanoTime()
        IvfIndex.build(emb, idxDir, tag, buckets = 32)
        println(f"[naturaladaptive] IvfIndex.build ${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        sweepNatural("fixed", cells, Seq(rule, 2 * rule, 3 * rule, 4 * rule)) { np =>
          IvfIndex.search(spark, tag, queries, nprobe = np)
        }
        // grid over (cap, stability window): the question is whether
        // per-query reallocation beats the fixed recall/budget frontier —
        // a higher cap lets hard queries go past 4·rule while easy ones
        // stop early; a higher window demands stronger stability evidence
        for ((cap, win) <- Seq((4, 1), (4, 2), (8, 1), (8, 2))) {
          val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
          sweepNatural(s"adaptive(cap$cap,w$win)", cells, Seq(rule)) { np =>
            rounds.clear()
            IvfIndex.searchAdaptive(spark, tag, queries, chunk = np, maxChunks = cap,
              onRound = (r, nq) => rounds += ((r, nq)), window = win)
          }
          val bought = rounds.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
          val total = (1 to cap).map(r => bought.getOrElse(r, 0L)).sum
          println(s"[naturaladaptive] cap=$cap w=$win chunks bought per round (last run): " +
            (1 to cap).map(r => s"r$r=${bought.getOrElse(r, 0L)}").mkString(" ") +
            f" → mean budget ${total.toDouble / math.max(1L, bought.getOrElse(1, 0L))}%.2f·rule" +
            s" (fixed 4·rule pays 4.00)")
        }
        Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
      if (tiers("heteroadaptive")) {
        // THE HETEROGENEOUS-DIFFICULTY PANEL (r11 verdict item 5): the
        // adaptive budget's claimed regime is a batch whose queries need
        // genuinely different budgets. Build it explicitly: 25 GATE-BAND
        // queries (planted neighbors at cos 0.86–0.98 — the dup-gate
        // regime, trivially stable after round 1) mixed with 25
        // NATURAL-BAND corpus queries (top-5 at cos ≈ 0.4–0.5, the hard
        // end) in ONE batch. Fixed budgets must pay the hard queries'
        // nprobe for everyone; stability termination should stop the easy
        // half after the stability window. Measured: does that ever win
        // on WALL (not just mean budget)?
        import graft.operators.RecallEstimator
        val p25 = RecallEstimator.panel(nQueries = 25)
        val pc = RecallEstimator.plantedCorpus(emb, p25)
        val hardIds = (0L until 25L).toSet
        val truthHard = truthSet.filter { case (q, _) => hardIds(q) }
        // contamination audit: planted rows are sign-vector constructions
        // ~orthogonal to natural queries; verify they cannot displace any
        // hard query's true top-5 (else the natural truth above — computed
        // over the UNPLANTED corpus — would be wrong for the planted one)
        val hardVecs = emb.filter(col("vec_id") < 25)
          .select("vec_id", "embedding")
          .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        val maxPlantedCos = (for {
          (_, hv) <- hardVecs
          (_, pv) <- p25.plantedRows
        } yield Similarity.dotP(hv, pv) /
          (Similarity.normP(hv) * Similarity.normP(pv))).max
        println(f"[hetero] max planted×natural-query cos $maxPlantedCos%.3f " +
          f"(natural k-th band min ${kth.head}%.3f — planted rows cannot enter hard top-5)")
        require(maxPlantedCos < kth.head,
          "planted rows contaminate the natural truth — widen the band check")
        val tag = "deephet"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deephet").toString
        val tb = System.nanoTime()
        IvfIndex.build(pc, idxDir, tag, buckets = 32)
        println(f"[hetero] IvfIndex.build ${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        val hetQueries = emb.filter(col("vec_id") < 25)
          .select("vec_id", "embedding")
          .unionAll(p25.queries(spark))
        val plantedWant = p25.plantedSet
        def score(got: Set[(Long, Long)]): (Double, Double) =
          ((got & plantedWant).size.toDouble / plantedWant.size,
            (got & truthHard).size.toDouble / truthHard.size)
        println(s"\n| policy (50 mixed queries) | planted recall@5 | natural recall@5 | mean budget (·rule) | warm s |")
        println("|---|---|---|---|---|")
        for (np <- Seq(rule, 2 * rule, 3 * rule, 4 * rule)) {
          def once(): (Double, Set[(Long, Long)]) = {
            val t0 = System.nanoTime()
            val got = IvfIndex.search(spark, tag, hetQueries, nprobe = np)
              .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
            ((System.nanoTime() - t0) / 1e9, got)
          }
          once(); drop()
          val (warm, got) = once(); drop()
          val (pr, nr) = score(got)
          println(f"| fixed ${np / rule}·rule | $pr%.3f | $nr%.3f | ${np.toDouble / rule}%.2f | $warm%.2f |")
        }
        for ((cap, win) <- Seq((4, 1), (4, 2), (8, 1), (8, 2))) {
          val rounds = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
          def once(): (Double, Set[(Long, Long)]) = {
            rounds.clear()
            val t0 = System.nanoTime()
            val got = IvfIndex.searchAdaptive(spark, tag, hetQueries,
              chunk = rule, maxChunks = cap,
              onRound = (r, nq) => rounds += ((r, nq)), window = win)
              .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
            ((System.nanoTime() - t0) / 1e9, got)
          }
          once(); drop()
          val (warm, got) = once(); drop()
          val (pr, nr) = score(got)
          val bought = rounds.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
          val total = (1 to cap).map(r => bought.getOrElse(r, 0L)).sum
          val meanBudget = total.toDouble / math.max(1L, bought.getOrElse(1, 0L))
          println(f"| adaptive cap$cap w$win | $pr%.3f | $nr%.3f | $meanBudget%.2f | $warm%.2f |")
          println(s"[hetero] cap=$cap w=$win active per round: " +
            (1 to cap).map(r => s"r$r=${bought.getOrElse(r, 0L)}").mkString(" "))
        }
        Seq(IvfIndex.modelTable(tag), IvfIndex.assignTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
      if (tiers("naturalimi")) {
        val k1 = graft.operators.Imi.k1For(n)
        val tag = "deepnatimi"
        val idxDir = java.nio.file.Files.createTempDirectory("graft-deepnatimi").toString
        val tb = System.nanoTime()
        graft.operators.ImiIndex.build(emb, idxDir, tag, buckets = 32, k1 = k1)
        println(f"[natural] ImiIndex.build (k1=$k1 → ${k1 * k1} cells) " +
          f"${(System.nanoTime() - tb) / 1e9}%.1f s")
        drop()
        sweepNatural("imi", k1 * k1, Seq(rule, 2 * rule, 4 * rule)) { np =>
          graft.operators.ImiIndex.search(spark, tag, queries, nprobe = np)
        }
        Seq(graft.operators.ImiIndex.modelTable(tag), graft.operators.ImiIndex.assignTable(tag))
          .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
      }
    }
    if (tiers("imi")) {
      import graft.operators.{Imi, ImiIndex}
      val k1 = Imi.k1For(n)
      val productCells = k1 * k1
      val tag = "deepimi"
      val idxDir = java.nio.file.Files.createTempDirectory("graft-deepimi").toString
      val tb = System.nanoTime()
      ImiIndex.build(emb, idxDir, tag, buckets = 32, k1 = k1)
      println(f"[deep] ImiIndex.build (k1=$k1 → $productCells product cells) " +
        f"${(System.nanoTime() - tb) / 1e9}%.1f s")
      drop()
      for (nprobe <- Seq(rule, 2 * rule)) {
        sweep("imi", productCells, nprobe) { np =>
          ImiIndex.search(spark, tag, queries, nprobe = np)
        }
      }
      Seq(ImiIndex.modelTable(tag), ImiIndex.assignTable(tag))
        .foreach(t => graft.operators.BucketedMaintenance.dropWithFiles(spark, t))
    }
    spark.stop()
  }
}
