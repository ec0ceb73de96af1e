package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the candidate-scoring tier between the
  * int8 codes and the float vectors (Jégou, Douze & Schmid, TPAMI 2011
  * "Product quantization for nearest neighbor search"; the rotation is
  * the cheap seeded form of Ge et al., CVPR 2013 "Optimized Product
  * Quantization" — the same randomized-Hadamard machinery as
  * [[Imi.rotateP]]).
  *
  * The vector is split into `m` sub-vectors; each subspace gets its own
  * `k`-centroid Lloyd codebook (the EXACT training discipline of
  * [[Similarity.trainedCentroidArrays]] — residue seed, unrolled rounds,
  * empty-cluster keep — run per subspace over the rotated space, which is
  * what keeps the full DuckDB oracle total). A vector's code is its `m`
  * nearest-sub-centroid ids — `m` bytes. Search scores candidates
  * ASYMMETRICALLY (ADC): the query precomputes one `m × k` table of
  * partial dots against the sub-centroids, and a candidate's approximate
  * dot is `m` table lookups — no multiply touches the candidate at all.
  * Approximate cosine divides by the TRUE stored norm (rotation is
  * orthogonal, so dots and norms transfer to the rotated space).
  *
  * Scale shape (the reason this tier exists): at 100 TB of vectors the
  * candidate scan is the dominant I/O. Float vectors are 256 B each, the
  * int8 tier's codes 64 B; the default PQ code is **8 B** — another 8× off
  * the scanned bytes, at ~16 k FLOPs/query of table-build cost that is
  * independent of the candidate count. Codebooks are `m·k·dsub` doubles
  * (16 KB at the 8×256 default over dim 64) — a trivially broadcast
  * model; training reads the same bounded sample as the coarse quantizer.
  *
  * MEASURED deployment guidance (SCALING.md r11, exact truth at 2M/20M):
  * the tier is BAND- and CODE-SIZE-dependent. In the GATE band
  * (near-dup / ingest-gate matches at cos ≥ 0.86) ADC holds — m=8 is
  * 0.96 raw / 1.00 thinly re-ranked at 13× less candidate I/O than
  * float (3.9× below int8); m=16 is 1.00 raw. In the tight NATURAL
  * band (corpus top-k cosines spaced ~10⁻³) an 8-byte code's
  * reconstruction error dwarfs the spacing and ADC ordering collapses
  * (0.19 raw), but m=16 under a wide re-rank (widen 256) REACHES the
  * int8 tier's recall at 2.8× fewer candidate bytes. Rule: m=8 for
  * pure gate scans, m=16 as the general tier; the re-rank's second
  * scan is query-sized, so wide widens are cheap.
  */
object Pq {

  /** Build-time PQ mode: [[PqOff]] = no PQ tier, [[PqAuto]] = train the
    * [[Default]] spec when the corpus is at least [[AutoMinRows]] rows
    * (below that the tier saves nothing and the residue seed may not even
    * have `k` populated classes), explicit [[PqSpec]] = always train. */
  sealed trait PqMode
  case object PqOff extends PqMode
  case object PqAuto extends PqMode
  /** `residual = true` is IVFADC-proper (Jégou 2011 §IV): the code
    * quantizes `rot(x − c_cell)` instead of `rot(x)`. Residuals inside a
    * cell span a fraction of the corpus's variance, so the same `m` bytes
    * buy a much smaller reconstruction error — at IDENTICAL candidate-scan
    * bytes. Search adds the exact per-(query, cell) coarse term
    * `dot(q, c_cell)` (nprobe dots per query, candidate-count-independent):
    * `score = (dot(q, c) + ADC(rot q, code)) / (|q|·|x|)`. */
  final case class PqSpec(m: Int = DefaultM, k: Int = DefaultK,
                          rotSeed: Option[Long] = Some(Imi.RotSeed),
                          residual: Boolean = false) extends PqMode

  val DefaultM = 8
  val DefaultK = 256
  /** PqAuto threshold: below this the candidate scan the tier exists to
    * shrink is already trivial, and k=256 residue classes stop being
    * reliably populated. */
  val AutoMinRows: Long = 100000L

  /** PqAuto resolves to RESIDUAL codes: at identical code bytes the
    * residual tier dominated raw codes on every measured band at 2M
    * (SCALING.md r12 — gate raw 0.972 vs 0.960, natural w256 0.892 vs
    * 0.848 at m=8), for one extra sample-sized nearest-cell pass at
    * build and nprobe coarse dots per query at search. Oracle configs
    * pass explicit specs and are untouched. */
  private[operators] def resolve(mode: PqMode, n: Long): Option[PqSpec] = mode match {
    case PqOff => None
    case PqAuto => if (n >= AutoMinRows) Some(PqSpec(residual = true)) else None
    case s: PqSpec => Some(s)
  }

  /** Per-subspace Lloyd codebooks over the (optionally rotated) space:
    * `books(m)(cid)(i)` — exactly [[Similarity.trainedCentroidArrays]] on
    * each `dsub`-dim slice (residue seed; the oracle unrolls the same
    * chain per subspace via [[Similarity.centroidCtes]] with a dimension
    * offset, the [[Imi]] half-chain pattern). */
  def train(base: DataFrame, spec: PqSpec,
            iters: Int = Similarity.LloydIters,
            dim: Int = Similarity.Dim): Array[Array[Array[Double]]] = {
    require(dim % spec.m == 0, s"PQ: dim $dim not divisible by m=${spec.m}")
    require(spec.k >= 1 && spec.k <= 256,
      s"PQ: k=${spec.k} outside [1, 256] — codes are single bytes")
    val dsub = dim / spec.m
    // The training frame is read by every subspace's seed + Lloyd-round
    // jobs (m·(1+iters) of them) — materialize it once instead of
    // re-running the rotation/residual map per job. Sample-sized on the
    // deployment (auto) path, corpus-sized only for the explicit-cells
    // oracles, whose full-corpus Lloyd is oracle-scale by construction.
    val src = org.apache.spark.sql.graft.CheckpointShim
      .statsHonestLocalCheckpoint(
        spec.rotSeed.map(Imi.rotated(base, _)).getOrElse(base))
    try
      // The m subspace codebooks are INDEPENDENT Lloyd chains; r14 ran
      // them as m concurrent future chains (m·(1+iters) jobs), r15 folds
      // them into ONE batched chain (1+iters jobs — verdict item 4): the
      // seed is one exploded aggregate, each round one pass computing
      // every subspace's assignment. Per-subspace arithmetic unchanged —
      // see the trainedSubspaceCodebooks scaladoc.
      Similarity.trainedSubspaceCodebooks(src, spec.m, spec.k, iters, dsub,
        (0 until spec.m).map(_ * dsub))
    finally
      org.apache.spark.sql.graft.CheckpointShim.freeCheckpoint(src)
  }

  /** The residual a cell leaves unexplained: `(v_i − c_i)` in double,
    * narrowed to FLOAT — the exact element type the rotation kernel and
    * the DuckDB oracle's residual CTE both consume, so driver and oracle
    * quantize bit-identical inputs. */
  def residualOf(v: Array[Float], cent: Array[Double]): Array[Float] =
    Array.tabulate(v.length)(i => (v(i).toDouble - cent(i)).toFloat)

  /** Exact coarse term `dot(q, c_cell)` — ascending-dimension double
    * accumulation, the pinned oracle order (one per probed cell, never
    * per candidate). */
  def coarseDot(v: Array[Float], cent: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * cent(i); i += 1 }
    s
  }

  /** Residual relation of a (vec_id, embedding) frame against a coarse
    * model — what the residual tier's codebooks train on. Feeding this to
    * [[train]] reuses the whole raw-tier pipeline: train never needs to
    * know whether its input is vectors or residuals. */
  def residualFrame(base: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    base.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, residualOf(v, cents(Similarity.nearestCell(v, cents)._1))) }
      .toDF("vec_id", "embedding")
  }

  /** `m`-byte PQ code of one vector: nearest sub-centroid per subspace
    * ((dist2 ASC, cid ASC) tie-break — [[Similarity.nearestCell]]), over
    * the rotated vector when `signs` is present. Code bytes are UNSIGNED
    * cids (read back with `& 0xFF`). */
  def encodeVec(v: Array[Float], books: Array[Array[Array[Double]]],
                signs: Option[Array[Double]]): Array[Byte] = {
    val rv = signs.map(Imi.rotateP(v, _)).getOrElse(v)
    val m = books.length
    val dsub = rv.length / m
    Array.tabulate(m) { mi =>
      val sub = java.util.Arrays.copyOfRange(rv, mi * dsub, (mi + 1) * dsub)
      Similarity.nearestCell(sub, books(mi))._1.toByte
    }
  }

  /** Flattened ADC lookup table for one query: `tab(mi·k + j)` = dot of
    * the (rotated) query's subspace-`mi` slice with sub-centroid `j` —
    * ascending-dimension double accumulation, the pinned oracle order.
    * `m·k` doubles per query (16 KB at the 8×256 default), built once per
    * query and broadcast-joined to candidates. */
  def adcTable(v: Array[Float], books: Array[Array[Array[Double]]],
               signs: Option[Array[Double]]): Array[Double] = {
    val rv = signs.map(Imi.rotateP(v, _)).getOrElse(v)
    val m = books.length
    val k = books(0).length
    val dsub = rv.length / m
    val tab = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      var j = 0
      while (j < k) {
        val c = books(mi)(j)
        var s = 0.0
        var i = 0
        while (i < dsub) { s += rv(mi * dsub + i).toDouble * c(i); i += 1 }
        tab(mi * k + j) = s
        j += 1
      }
      mi += 1
    }
    tab
  }

  /** ADC dot: `Σ_m tab(m·k + code(m))` — ascending-m, the pinned oracle
    * order ([[graft.plans.VectorKernels.adc]] is the codegen twin). */
  def adcDot(tab: Array[Double], code: Array[Byte], k: Int): Double = {
    var s = 0.0
    var m = 0
    while (m < code.length) { s += tab(m * k + (code(m) & 0xFF)); m += 1 }
    s
  }

  // ---------------------------------------------------------------- SQL

  /** Per-subspace codebook chains + per-vector code assignment as a
    * `WITH`-body fragment: trains `pq<mi>_cent` via the shared
    * [[Similarity.centroidCtes]] (offset `mi·dsub` over `src`), assigns
    * each vector its nearest sub-centroid per subspace (`pq<mi>_fin`),
    * and ends with `codes(vec_id, code)` — `code` a 1-indexed list of
    * 0-based cids in subspace order, the SQL twin of [[encodeVec]]. */
  private def codebookCtes(m: Int, k: Int, iters: Int, src: String,
                           dim: Int): String = {
    val dsub = dim / m
    val chains = (0 until m).map { mi =>
      Similarity.centroidCtes(k, dsub, iters, s"pq${mi}_", mi * dsub, src)
    }.mkString(",\n")
    val fins = (0 until m).map { mi =>
      val off = mi * dsub
      val ix = if (off == 0) "i" else s"(i + $off)"
      s"""pq${mi}_dd AS (
  SELECT e.vec_id, c.cid,
    list_sum(list_transform(generate_series(1, $dsub),
      i -> (CAST(e.embedding[$ix] AS DOUBLE) - c.centroid[i]) *
           (CAST(e.embedding[$ix] AS DOUBLE) - c.centroid[i]))) AS dist2
  FROM $src e CROSS JOIN pq${mi}_cent c
), pq${mi}_fin AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
      row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS r
    FROM pq${mi}_dd) rr WHERE r = 1
)"""
    }.mkString(",\n")
    val codeList = (0 until m).map(mi => s"f$mi.cid").mkString("list_value(", ", ", ")")
    val joins = (1 until m).map(mi => s"JOIN pq${mi}_fin f$mi USING (vec_id)").mkString(" ")
    s"""$chains,
$fins,
codes AS (
  SELECT f0.vec_id, $codeList AS code
  FROM pq0_fin f0 $joins
)"""
  }

  /** Per-query flattened ADC table as `qtab(vec_id, tab)` — partial dots
    * of the query's subspace slices against every sub-centroid, flattened
    * in (m, cid) order (the SQL twin of [[adcTable]]). */
  private def qtabCtes(m: Int, k: Int, src: String, dim: Int,
                       nQueries: Int): String = {
    val dsub = dim / m
    val arms = (0 until m).map { mi =>
      val off = mi * dsub
      val ix = if (off == 0) "i" else s"(i + $off)"
      s"""  SELECT e.vec_id, $mi AS m, c.cid,
    list_sum(list_transform(generate_series(1, $dsub),
      i -> CAST(e.embedding[$ix] AS DOUBLE) * c.centroid[i])) AS pdot
  FROM $src e CROSS JOIN pq${mi}_cent c WHERE e.vec_id < $nQueries"""
    }.mkString("\n  UNION ALL\n")
    s"""qpd AS (
$arms
), qtab AS (
  SELECT vec_id, list(pdot ORDER BY m, cid) AS tab FROM qpd GROUP BY vec_id
)"""
  }

  /** The shared coarse chain of the q_ivf_* oracle family
    * ([[Similarity.ivfSearchSql]]'s `dist`/`rk`/`assign`/`probes`/`cand`
    * CTEs verbatim) — the coarse quantizer is over the ORIGINAL space;
    * only the PQ codebooks live in the rotated one. */
  private def coarseCtes(nCentroids: Int, nprobe: Int, nQueries: Int,
                         dim: Int, iters: Int): String = s"""
${Similarity.centroidCtes(nCentroids, dim, iters)}, dist AS (
  SELECT e.vec_id, c.cid,
    list_sum(list_transform(generate_series(1, $dim),
      i -> (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]) *
           (CAST(e.embedding[i] AS DOUBLE) - c.centroid[i]))) AS dist2
  FROM embeddings e CROSS JOIN cent c
), rk AS (
  SELECT vec_id, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cid ASC) AS r
  FROM dist
), assign AS (
  SELECT vec_id, cid FROM rk WHERE r = 1
), probes AS (
  SELECT vec_id AS query_id, cid FROM rk WHERE r <= $nprobe AND vec_id < $nQueries
), cand AS (
  SELECT p.query_id, a2.vec_id AS neighbor_id
  FROM probes p JOIN assign a2 ON a2.cid = p.cid AND a2.vec_id <> p.query_id
)""".trim

  /** True-norm CTE — the stored `nrm` column's expression ([[Similarity.normP]]
    * over the ORIGINAL floats; rotation is orthogonal so it serves the
    * rotated dots too). */
  private val NrmCte: String = """nrm AS (
  SELECT vec_id,
    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      AS nrm
  FROM embeddings
)"""

  /** ADC score CTE `sims(query_id, neighbor_id, cos)`: `m` ascending-order
    * table lookups over the candidate's code, divided by the true norms —
    * zero-norm guarded like the int8 oracle. */
  private def simsCte(m: Int, k: Int): String = s"""sims AS (
  SELECT c.query_id, c.neighbor_id,
    CASE WHEN qn.nrm = 0 OR bn.nrm = 0 THEN 0.0
      ELSE list_sum(list_transform(generate_series(1, $m),
        mm -> qt.tab[(mm - 1) * $k + cd.code[mm] + 1])) / (qn.nrm * bn.nrm) END AS cos
  FROM cand c
  JOIN qtab qt ON qt.vec_id = c.query_id
  JOIN codes cd ON cd.vec_id = c.neighbor_id
  JOIN nrm qn ON qn.vec_id = c.query_id
  JOIN nrm bn ON bn.vec_id = c.neighbor_id
)"""

  /** Residual-tier relations: `res` (the float residual of each vector
    * against its assigned coarse centroid — element-exact twin of
    * [[residualOf]]), its rotation `rotres` (codebook/code source), and
    * the rotated QUERY relation `qrot` (qtab source — queries rotate
    * whole, residuals are a stored-side concept). All MATERIALIZED: the
    * m codebook chains re-reference their source ~20× (the r11 rot
    * lesson — inlining re-rotates the corpus per reference). Returns
    * (cte fragment, codebook src, qtab src). */
  private def residualCtes(dim: Int, rotSeed: Option[Long],
                           nQueries: Int): (String, String, String) = {
    val res = s"""res AS MATERIALIZED (
  SELECT e.vec_id, list_transform(generate_series(1, $dim),
    i -> CAST(CAST(e.embedding[i] AS DOUBLE) - c.centroid[i] AS FLOAT)) AS embedding
  FROM embeddings e JOIN assign a ON a.vec_id = e.vec_id JOIN cent c ON c.cid = a.cid
)"""
    rotSeed match {
      case Some(seed) =>
        // rotCteSql emits MATERIALIZED itself (and the literal-matrix
        // list_dot_product form — see its scaladoc for the measured costs)
        val rr = Imi.rotCteSql(seed, dim, "res", "rotres")
        val qr = Imi.rotCteSql(seed, dim,
            s"(SELECT vec_id, embedding FROM embeddings WHERE vec_id < $nQueries)", "qrot")
        (s"$res,\n$rr,\n$qr", "rotres", "qrot")
      case None => (res, "res", "embeddings")
    }
  }

  /** Exact coarse term per (query, cell): `qcd(query_id, cid, qc)` — the
    * SQL twin of [[coarseDot]] (original space, both sides unrotated). */
  private def qcdCte(dim: Int, nQueries: Int): String = s"""qcd AS (
  SELECT e.vec_id AS query_id, c.cid,
    list_sum(list_transform(generate_series(1, $dim),
      i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i])) AS qc
  FROM embeddings e CROSS JOIN cent c WHERE e.vec_id < $nQueries
)"""

  /** Residual ADC score CTE: `qc(query, neighbor's cell) + m table
    * lookups`, over the true norms — the candidate's cell rides in from
    * `assign`. */
  private def simsResCte(m: Int, k: Int): String = s"""sims AS (
  SELECT c.query_id, c.neighbor_id,
    CASE WHEN qn.nrm = 0 OR bn.nrm = 0 THEN 0.0
      ELSE (qcd.qc + list_sum(list_transform(generate_series(1, $m),
        mm -> qt.tab[(mm - 1) * $k + cd.code[mm] + 1]))) / (qn.nrm * bn.nrm) END AS cos
  FROM cand c
  JOIN assign a2 ON a2.vec_id = c.neighbor_id
  JOIN qcd ON qcd.query_id = c.query_id AND qcd.cid = a2.cid
  JOIN qtab qt ON qt.vec_id = c.query_id
  JOIN codes cd ON cd.vec_id = c.neighbor_id
  JOIN nrm qn ON qn.vec_id = c.query_id
  JOIN nrm bn ON bn.vec_id = c.neighbor_id
)"""

  /** Full relational oracle for the RESIDUAL tier ([[IvfIndex.searchPq]]
    * over a `PqSpec(residual = true)` index): coarse chain, residual
    * relation + rotation, per-subspace codebooks trained on rotated
    * residuals, codes, rotated-query ADC tables, exact coarse terms,
    * residual ADC scoring, top-k. */
  def ivfSearchPqResSql(nCentroids: Int = 8, nprobe: Int = 2, k: Int = 5,
                        nQueries: Int = 50, m: Int = 4, kSub: Int = 8,
                        rotSeed: Option[Long] = Some(Imi.RotSeed),
                        dim: Int = Similarity.Dim,
                        iters: Int = Similarity.LloydIters): String = {
    val (frag, bookSrc, qSrc) = residualCtes(dim, rotSeed, nQueries)
    s"""WITH ${coarseCtes(nCentroids, nprobe, nQueries, dim, iters)},
$frag,
${codebookCtes(m, kSub, iters, bookSrc, dim)},
${qtabCtes(m, kSub, qSrc, dim, nQueries)},
${qcdCte(dim, nQueries)},
$NrmCte,
${simsResCte(m, kSub)}, ranked AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM sims
)
SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= $k ORDER BY query_id, rk
""".trim
  }

  /** Oracle for the residual tier's ADC-wide → exact-float re-rank
    * ([[IvfIndex.searchPqRerank]] over a residual index). */
  def ivfSearchPqResRerankSql(nCentroids: Int = 8, nprobe: Int = 2, k: Int = 5,
                              widen: Int = 4, nQueries: Int = 50, m: Int = 4,
                              kSub: Int = 8,
                              rotSeed: Option[Long] = Some(Imi.RotSeed),
                              dim: Int = Similarity.Dim,
                              iters: Int = Similarity.LloydIters): String = {
    val (frag, bookSrc, qSrc) = residualCtes(dim, rotSeed, nQueries)
    s"""WITH ${coarseCtes(nCentroids, nprobe, nQueries, dim, iters)},
$frag,
${codebookCtes(m, kSub, iters, bookSrc, dim)},
${qtabCtes(m, kSub, qSrc, dim, nQueries)},
${qcdCte(dim, nQueries)},
$NrmCte,
${simsResCte(m, kSub)}, wide AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rw
    FROM sims) t WHERE rw <= ${k * widen}
), simsf AS (
  SELECT w.query_id, w.neighbor_id, ${Similarity.CosineSqlExpr} AS cos
  FROM wide w
  JOIN embeddings a ON a.vec_id = w.query_id
  JOIN embeddings b ON b.vec_id = w.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM simsf
)
SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= $k ORDER BY query_id, rk
""".trim
  }

  private def withRot(rotSeed: Option[Long], body: String): (String, String) =
    rotSeed match {
      case Some(seed) =>
        // rotCteSql emits MATERIALIZED + the literal-matrix
        // list_dot_product form itself (its scaladoc carries the measured
        // history: inlined lambdas 134 s → materialized 25 s → matrix
        // literal ~1 s at sf0.01, identical results at every step)
        val rot = Imi.rotCteSql(seed)
        (s"WITH $rot,\n", "rot")
      case None => ("WITH ", "embeddings")
    }

  /** Full relational oracle for [[IvfIndex.searchPq]]: the q_ivf_* coarse
    * chain, the rotated per-subspace codebooks + codes + query tables,
    * ADC scoring, top-k on (cos DESC, neighbor_id ASC). */
  def ivfSearchPqSql(nCentroids: Int = 8, nprobe: Int = 2, k: Int = 5,
                     nQueries: Int = 50, m: Int = 4, kSub: Int = 8,
                     rotSeed: Option[Long] = Some(Imi.RotSeed),
                     dim: Int = Similarity.Dim,
                     iters: Int = Similarity.LloydIters): String = {
    val (head, src) = withRot(rotSeed, "")
    s"""$head${coarseCtes(nCentroids, nprobe, nQueries, dim, iters)},
${codebookCtes(m, kSub, iters, src, dim)},
${qtabCtes(m, kSub, src, dim, nQueries)},
$NrmCte,
${simsCte(m, kSub)}, ranked AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM sims
)
SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= $k ORDER BY query_id, rk
""".trim
  }

  /** Oracle for [[IvfIndex.searchPqRerank]]: the ADC chain down to `sims`,
    * a k·widen cut on the (cos DESC, neighbor_id ASC) ADC order, exact
    * float cosine over the survivors only, final float top-k — the
    * [[Similarity.ivfSearchRerankSql]] composition with ADC as the cheap
    * first pass. */
  def ivfSearchPqRerankSql(nCentroids: Int = 8, nprobe: Int = 2, k: Int = 5,
                           widen: Int = 4, nQueries: Int = 50, m: Int = 4,
                           kSub: Int = 8,
                           rotSeed: Option[Long] = Some(Imi.RotSeed),
                           dim: Int = Similarity.Dim,
                           iters: Int = Similarity.LloydIters): String = {
    val (head, src) = withRot(rotSeed, "")
    s"""$head${coarseCtes(nCentroids, nprobe, nQueries, dim, iters)},
${codebookCtes(m, kSub, iters, src, dim)},
${qtabCtes(m, kSub, src, dim, nQueries)},
$NrmCte,
${simsCte(m, kSub)}, wide AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
      row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rw
    FROM sims) t WHERE rw <= ${k * widen}
), simsf AS (
  SELECT w.query_id, w.neighbor_id, ${Similarity.CosineSqlExpr} AS cos
  FROM wide w
  JOIN embeddings a ON a.vec_id = w.query_id
  JOIN embeddings b ON b.vec_id = w.neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rk
  FROM simsf
)
SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, round(cos, 6) AS cos
FROM ranked WHERE rk <= $k ORDER BY query_id, rk
""".trim
  }
}
