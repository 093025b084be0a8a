package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Product-quantization ANN (Jégou/Douze/Schmid, TPAMI 2011 — public
 * method): the corpus stores `m` bytes per vector (codeword ids) instead
 * of `dim` floats, and each (query, corpus) pair scores in O(m) table
 * lookups via a per-query LUT — the memory AND compute lever for
 * billion-vector search. Where int8 quantization ([[Quantize]]) buys 4×,
 * PQ at d=64/m=8 buys 32× on the corpus bytes and 8× on the per-pair
 * work.
 *
 * Scale shape (the 100 TB story):
 *  - `train` touches the corpus `iters + 1` times but collects only
 *    m·ksub·dsub fixed-point cell sums (KBs) per iteration — the same
 *    bounded-driver discipline as [[Similarity.ivfBuild]]'s Lloyd loop.
 *  - `encode` is one map pass (native codegen'd [[graft.functions.PqEncode]]);
 *    the encoded corpus is what a user persists and re-searches.
 *  - `topK` broadcasts the (small) query side with one O(ksub·d) LUT per
 *    query; the corpus streams once and never re-touches float vectors.
 *
 * Determinism: codebooks train on a seeded `xxhash64` sample and refine
 * with FIXED-POINT per-cell means (x·2²⁴ truncated to long — exact
 * integer sums in any partitioning/fetch order, the ivfBuild
 * discipline), ties in `pq_encode` go to the lowest codeword id, and the
 * ADC sum runs in subspace order — so encoded codes, scores, and recall
 * goldens are bit-reproducible at any parallelism.
 */
object Pq {

  /** Trained codebooks: `flat((j·ksub + k)·dsub + t)` = element t of
    * codeword k of subspace j. Tiny (m·ksub·dsub doubles) — inside
    * operators it ships as a TorrentBroadcast handle ([[bArr]]), never a
    * plan literal: a multi-KB literal is re-hashed by every Catalyst
    * transform, gets duplicated into pushed-down scan `DataFilters` and
    * both sides of self-joins, and serializes into every task binary
    * (the round-8 2 MB `TaskSetManager` warning). */
  final case class PqCodebook(m: Int, ksub: Int, dsub: Int, flat: Array[Double]) {
    def dim: Int = m * dsub
    /** Per-codeword squared norms in LUT layout: nlut[j·ksub + k] =
      * ‖codeword‖² — `pq_adc_dot(nlut, codes)` is then the squared norm
      * of the reconstruction, computed once per CORPUS row. Lazy val
      * (not def): a stable array instance is what [[bArr]]'s
      * per-instance broadcast memoization keys on. */
    lazy val normLut: Array[Double] = {
      val out = new Array[Double](m * ksub)
      var j = 0
      while (j < m) {
        var k = 0
        while (k < ksub) {
          var s = 0.0
          var t = 0
          while (t < dsub) { val x = flat((j * ksub + k) * dsub + t); s += x * x; t += 1 }
          out(j * ksub + k) = s
          k += 1
        }
        j += 1
      }
      out
    }
    /** Codeword-dot table for SDC pair scoring, laid out
      * ((j·ksub + ka)·ksub + kb) ↦ ⟨cwⱼₖₐ, cwⱼₖᵦ⟩ — m·ksub² doubles
      * (KBs at any sane geometry), so `pq_sdc_dot(table, a, b)` scores a
      * pair of ENCODED vectors in O(m) lookups: exactly
      * dot(decode(a), decode(b)), float vectors never touched. Lazy val
      * for the same [[bArr]] memoization reason as [[normLut]]. */
    lazy val sdcTable: Array[Double] = {
      val out = new Array[Double](m * ksub * ksub)
      var j = 0
      while (j < m) {
        var ka = 0
        while (ka < ksub) {
          var kb = 0
          while (kb < ksub) {
            var s = 0.0
            var t = 0
            while (t < dsub) {
              s += flat((j * ksub + ka) * dsub + t) * flat((j * ksub + kb) * dsub + t)
              t += 1
            }
            out((j * ksub + ka) * ksub + kb) = s
            kb += 1
          }
          ka += 1
        }
        j += 1
      }
      out
    }
    /** Reconstruction of a code array (driver-side; tests/debug). */
    def decode(codes: Array[Byte]): Array[Double] = {
      val out = new Array[Double](dim)
      var j = 0
      while (j < m) {
        System.arraycopy(flat, (j * ksub + codes(j)) * dsub, out, j * dsub, dsub)
        j += 1
      }
      out
    }
  }

  private def reg(df: DataFrame): Unit = graft.Graft.register(df.sparkSession)
  private val FP = 1L << 24 // fixed-point grid shared with ivfBuild

  /** A driver-side array as a constant Column backed by a
    * TorrentBroadcast handle ([[graft.functions.BroadcastArrayData]]) —
    * the codebook/norm-LUT/SDC-table transport of every operator here
    * (and [[Similarity]]'s coarse centroids). As a `typedLit` the same
    * array would be re-hashed by every Catalyst transform, pushed into
    * parquet `DataFilters`, duplicated across self-join sides, and
    * serialized into each task binary; as a 1-row broadcast-JOINED
    * DataFrame it would still ride one task binary per broadcast build
    * (`LocalTableScan.doExecute` parallelizes its rows into the
    * exchange's collect job). The handle costs neither: ~100 bytes per
    * task, the array ships once per executor.
    *
    * Broadcasts are memoized per ARRAY INSTANCE (identity keys — Java
    * array equals/hashCode) and per SparkContext: repeat operator calls
    * over the same codebook reuse one broadcast instead of paying ~10s
    * of ms of torrent setup per call (the bench regression the literal
    * path never had), and a restarted context invalidates its entries
    * instead of resurrecting dead handles.
    * [[PqCodebook.normLut]]/[[PqCodebook.sdcTable]] are lazy vals
    * precisely so they present stable instances here.
    *
    * Lifecycle: the cache is an access-order LRU of
    * [[MaxCachedBroadcasts]] entries. Eviction only DROPS the map
    * reference — it must NOT `destroy()`, because [[bArr]] hands the
    * broadcast handle to LAZY plans: a caller can hold an unexecuted
    * DataFrame across 128+ later broadcasts (long training sessions),
    * and destroying the evictee would fail that plan with "Attempted to
    * use Broadcast after it was destroyed". Once the map and every plan
    * drop their references, Spark's ContextCleaner reclaims the blocks
    * through its weak-reference tracking of Broadcast objects — eviction
    * re-enables exactly that path. Deterministic, eager freeing is the
    * job of [[releaseArr]], which training loops call on each superseded
    * per-iteration codebook they know has finished executing. */
  private val MaxCachedBroadcasts = 128
  private type BcEntry = (org.apache.spark.SparkContext, org.apache.spark.broadcast.Broadcast[Array[Double]])
  private val bcCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Array[Double], BcEntry](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Array[Double], BcEntry]): Boolean =
        size() > MaxCachedBroadcasts
    })
  private[graft] def bArr(df: DataFrame, arr: Array[Double]): Column = {
    val sc = df.sparkSession.sparkContext
    val cached = bcCache.get(arr)
    val bc =
      if (cached != null && (cached._1 eq sc) && !sc.isStopped) cached._2
      else {
        val fresh = sc.broadcast(arr)
        bcCache.put(arr, (sc, fresh))
        fresh
      }
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BroadcastArrayData(bc))
  }

  /** Destroy the memoized broadcast for `arr`, if any — for arrays whose
    * every plan has finished executing (Lloyd-iteration codebooks after
    * their pass collects). A later [[bArr]] on the same instance simply
    * re-broadcasts. */
  private[graft] def releaseArr(arr: Array[Double]): Unit = {
    val cached = bcCache.remove(arr)
    if (cached != null && !cached._1.isStopped)
      try cached._2.destroy() catch { case _: Exception => () }
  }

  /** Column helper: ARRAY<TINYINT> of m codeword ids for `vec`. (The
    * codebook rides as a plan literal — fine for exploratory columns;
    * the operators ship it as a broadcast handle instead, see [[bArr]].) */
  def encode(vec: Column, cb: PqCodebook): Column =
    call_function("pq_encode", vec, typedLit(cb.flat.toSeq), lit(cb.m), lit(cb.ksub))

  /** Column helper: the per-query ADC lookup table (ARRAY<DOUBLE>, m·ksub). */
  def lut(vec: Column, cb: PqCodebook): Column =
    call_function("pq_lut", vec, typedLit(cb.flat.toSeq), lit(cb.m), lit(cb.ksub))

  private def encodeWith(vec: Column, cbCol: Column, cb: PqCodebook): Column =
    call_function("pq_encode", vec, cbCol, lit(cb.m), lit(cb.ksub))

  private def lutWith(vec: Column, cbCol: Column, cb: PqCodebook): Column =
    call_function("pq_lut", vec, cbCol, lit(cb.m), lit(cb.ksub))

  /** Column helper: Σⱼ lut[j·ksub + codes[j]] (the O(m) pair score). */
  def adcDot(lutCol: Column, codes: Column): Column =
    call_function("pq_adc_dot", lutCol, codes)

  /** Rows whose vector is complete and finite: a NULL/NaN/±Inf element
    * would poison a sampled codeword or truncate silently in the
    * fixed-point cell sums (NaN casts to 0, not an error). */
  private def finiteVec(vec: Column, dim: Int): Column =
    vec.isNotNull && size(vec) === dim &&
      !exists(vec, x => x.isNull || isnan(x.cast("double")) ||
        abs(x.cast("double")) === lit(Double.PositiveInfinity))

  /** Guarded approximate cosine: NULL (sorts last under the `cos desc`
    * rank) when the denominator is 0 OR NaN — a 0/0 or x/NaN would be
    * NaN, which Spark orders ABOVE every real double and would rank
    * degenerate rows first (NaN denominators arise from NaN query
    * vectors; `=!= 0.0` alone does not catch them because Spark
    * evaluates NaN comparisons as ordered-largest). */
  private def guardedCos(num: Column, qn: Column, cn: Column): Column = {
    val denom = qn * cn
    when(!isnan(denom) && denom =!= 0.0, num / denom)
      .otherwise(lit(null).cast("double"))
  }

  private def adcCos(lutCol: Column, codes: Column, qn: Column, cn: Column): Column =
    guardedCos(adcDot(lutCol, codes), qn, cn)

  /**
   * Train per-subspace codebooks: seeded-sample init (ksub corpus
   * vectors, cycled if the corpus is smaller), then `iters` Lloyd
   * rounds. Each round is ONE distributed pass — encode with the current
   * codebooks, explode (subspace, codeword, position) cells, sum
   * fixed-point coordinates map-side — and only m·ksub·dsub cell rows
   * reach the driver. Empty cells keep their previous codeword.
   *
   * Rows with a NULL/NaN/±Inf element are excluded from sampling AND
   * from the cell sums (they still encode fine afterwards — pq_encode
   * null-propagates). Fixed-point envelope (the ivfBuild bound): the
   * per-cell long sum needs |x|·2²⁴·rowsPerCell < 2⁶³ — at |x| ≤ 100
   * that is ~5×10¹² rows per (subspace, codeword) cell, far beyond any
   * real shard; beyond it, pre-scale the vectors.
   */
  def train(corpus: DataFrame, id: String, vec: String, dim: Int,
            m: Int = 8, ksub: Int = 16, iters: Int = 2): PqCodebook = {
    require(m > 0 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    require(ksub > 0 && ksub <= 128, s"ksub=$ksub must be in (0, 128]")
    reg(corpus)
    val dsub = dim / m
    val sample = corpus.select(col(vec).as("__v"), col(id).as("__id"), xxhash64(col(id)).as("__r"))
      .where(finiteVec(col("__v"), dim))
      // secondary key: a hash tie between two ids must not leave the
      // sampled set order to the shuffle
      .orderBy(col("__r"), col("__id")).limit(ksub)
      .collect()
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue()).toArray)
    require(sample.nonEmpty, "PQ training needs at least one valid vector")
    var flat = new Array[Double](m * ksub * dsub)
    for (k <- 0 until ksub; j <- 0 until m; t <- 0 until dsub)
      flat((j * ksub + k) * dsub + t) = sample(k % sample.length)(j * dsub + t)
    for (_ <- 1 to iters) {
      val cells = corpus.where(finiteVec(col(vec), dim))
        // encode in its OWN projection below the generate: a sibling
        // expression beside a generator lands in the Project ABOVE the
        // Generate and re-evaluates once per EXPLODED ELEMENT — dim× the
        // O(ksub·d) encode cost (the round-8 ScaleProbe regression);
        // split selects pin it below, computed once per row
        .select(col(vec).as("__v"),
          call_function("pq_encode", col(vec), bArr(corpus, flat), lit(m), lit(ksub)).as("__codes"))
        .select(col("__codes"),
          posexplode(transform(col("__v"), x => (x.cast("double") * FP).cast("long")))
            .as(Seq("__pos", "__x")))
        .where(col("__codes").isNotNull && col("__x").isNotNull)
        .withColumn("__j", (col("__pos") / lit(dsub)).cast("int"))
        .groupBy(col("__j"),
          element_at(col("__codes"), col("__j") + 1).cast("int").as("__k"),
          col("__pos"))
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      // this iteration's codebook broadcast is dead once the pass has
      // collected — destroy it now rather than letting one accumulate
      // per Lloyd round (flat is cloned below, so the instance is never
      // re-broadcast)
      releaseArr(flat)
      val next = flat.clone()
      cells.foreach { r =>
        val j = r.getInt(0); val k = r.getInt(1); val pos = r.getInt(2)
        next((j * ksub + k) * dsub + (pos - j * dsub)) =
          r.getLong(3).toDouble / FP / r.getLong(4)
      }
      flat = next
    }
    PqCodebook(m, ksub, dsub, flat)
  }

  /** Encode a corpus for storage/search: (id, codes) — m bytes/vector. */
  def encodeCorpus(corpus: DataFrame, id: String, vec: String, cb: PqCodebook): DataFrame = {
    reg(corpus)
    corpus.select(col(id), encodeWith(col(vec), bArr(corpus, cb.flat), cb).as("codes"))
  }

  /**
   * ADC top-k by approximate cosine: queries (float vectors, broadcast)
   * against an encoded corpus. Per pair: ONE `pq_adc_dot` over the
   * query's LUT; the corpus-side reconstruction norm comes from the
   * codebook's norm-LUT, computed once per corpus row before the join.
   * Returns (qId, cId, cos, rank) — the [[Similarity]] tie-break.
   */
  def topK(queries: DataFrame, corpus: DataFrame,
           qId: String, qVec: String, cId: String, cVec: String,
           k: Int, cb: PqCodebook, excludeSelf: Boolean = true): DataFrame = {
    reg(queries)
    topKEncoded(queries, encodeCorpus(corpus, cId, cVec, cb),
      qId, qVec, cId, "codes", k, cb, excludeSelf)
  }

  /** Top-k over an ALREADY-ENCODED corpus (codes column) — the
    * persist-once / search-many path a user runs at scale. */
  def topKEncoded(queries: DataFrame, corpusCodes: DataFrame,
                  qId: String, qVec: String, cId: String, codes: String,
                  k: Int, cb: PqCodebook, excludeSelf: Boolean = true): DataFrame = {
    reg(queries)
    val q = queries.select(col(qId).as("qId"),
      lutWith(col(qVec), bArr(queries, cb.flat), cb).as("__lut"),
      call_function("vector_norm", col(qVec)).as("__qn"))
    val c = corpusCodes.select(col(cId).as("cId"), col(codes).as("__codes"))
      .withColumn("__cn", sqrt(adcDot(bArr(corpusCodes, cb.normLut), col("__codes"))))
    val joined = c.crossJoin(broadcast(q))
    val scored = (if (excludeSelf) joined.filter(col("qId") =!= col("cId")) else joined)
      .withColumn("cos", adcCos(col("__lut"), col("__codes"), col("__qn"), col("__cn")))
    Similarity.rankTopK(scored, k)
  }

  /**
   * IVFADC corpus preparation: assign every vector to its IVF cell AND
   * PQ-encode it, in the SAME single corpus pass — (cId, cent, codes),
   * the m-bytes-plus-a-cell-id form a user persists once and searches
   * many times. Composes [[Similarity.ivfBuild]]'s coarse quantizer with
   * the PQ codes (flat PQ per cell).
   */
  def ivfPqEncode(index: Similarity.IvfIndex, cId: String, cVec: String,
                  cb: PqCodebook): DataFrame = {
    reg(index.assigned)
    index.assigned.select(col(cId).as("cId"), col("__cent").as("cent"),
      encodeWith(col(cVec), bArr(index.assigned, cb.flat), cb).as("codes"))
  }

  /**
   * IVFADC top-k — the billion-vector shape the PQ kernels exist for
   * (Jégou TPAMI 2011 §IV): the IVF coarse stage prunes the corpus to
   * the query's `nProbe` nearest cells, and ADC scores ONLY those
   * candidates in O(m) table lookups each. Candidate cost is
   * |q| · (nProbe/nCentroids) · |corpus| pairs × O(m) per pair — vs
   * O(d) per pair for IVF-flat at the same probe budget, and the corpus
   * shuffles m-byte codes, not d-float vectors. The probe stage is
   * [[Similarity.probeAssign]], bit-identical to IVF-flat's — including
   * its contract that DEGENERATE query rows (NULL vector, NULL element,
   * wrong dimension) are DROPPED, not emitted with NULL cos: the result
   * can have fewer distinct qIds than `queries` has rows.
   */
  def ivfPqTopK(index: Similarity.IvfIndex, queries: DataFrame,
                qId: String, qVec: String, cId: String, cVec: String,
                k: Int, cb: PqCodebook, nProbe: Int = 2,
                excludeSelf: Boolean = true): DataFrame =
    ivfPqTopKEncoded(index, ivfPqEncode(index, cId, cVec, cb), queries,
      qId, qVec, k, cb, nProbe, excludeSelf)

  /** IVFADC top-k over a corpus already prepared by [[ivfPqEncode]]
    * (columns cId, cent, codes) — the search-many path: no re-encode,
    * no float vectors touched on the corpus side at all. */
  def ivfPqTopKEncoded(index: Similarity.IvfIndex, corpusCodes: DataFrame,
                       queries: DataFrame, qId: String, qVec: String,
                       k: Int, cb: PqCodebook, nProbe: Int = 2,
                       excludeSelf: Boolean = true): DataFrame = {
    reg(queries)
    val q = Similarity.probeAssign(queries, qId, qVec, index, nProbe)
      .withColumn("__lut", lutWith(col("__qv"), bArr(queries, cb.flat), cb))
      .withColumn("__qn", call_function("vector_norm", col("__qv")))
      .select(col("qId"), col("__cent"), col("__lut"), col("__qn"))
    val c = corpusCodes.select(col("cId"), col("cent").as("__cent"), col("codes").as("__codes"))
      .withColumn("__cn", sqrt(adcDot(bArr(corpusCodes, cb.normLut), col("__codes"))))
    val joined = c.join(broadcast(q), "__cent")
    val scored = (if (excludeSelf) joined.filter(col("qId") =!= col("cId")) else joined)
      .withColumn("cos", adcCos(col("__lut"), col("__codes"), col("__qn"), col("__cn")))
    Similarity.rankTopK(scored, k)
  }

  // ------------------------------------------------------------------
  // Residual IVFADC (Jégou TPAMI 2011 §IV-A, the paper's actual IVFADC):
  // each vector is PQ-encoded as its RESIDUAL x − μ_cell. Residuals are
  // tight around the cell centroid, so the same bit budget captures far
  // more within-cell signal than flat PQ — the lever that makes small m
  // (8 bytes/vector) usable. Scoring reassembles exactly:
  //   dot(q, x̂)  = dot(q, μ) + Σⱼ lut_q[codeⱼ]
  //   ‖x̂‖²      = ‖μ‖² + 2·Σⱼ lut_μ[codeⱼ] + ‖r̂‖²
  // with lut_μ (the centroid's LUT against the residual codebook), ‖μ‖²
  // and μ itself precomputed per CELL on the driver — nCentroids rows,
  // broadcast — so the per-pair cost stays O(m) and the per-corpus-row
  // cost two ADC lookups + one small hash join.
  // ------------------------------------------------------------------

  /** IVF-assigned corpus with the per-row residual x − μ_cell appended
    * as `__res` (native [[graft.functions.VectorSub]] — one corpus
    * pass, no interpreted lambdas). */
  def ivfResiduals(index: Similarity.IvfIndex, vec: String): DataFrame = {
    reg(index.assigned)
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val cents = index.centroids.map { case (i, v) => (i, v.toSeq) }.toSeq
      .toDF("__cent", "__mu")
    index.assigned.join(broadcast(cents), "__cent")
      .withColumn("__res", call_function("vector_sub", col(vec), col("__mu")))
      .drop("__mu")
  }

  // ------------------------------------------------------------------
  // OPQ-lite rotation (Ge et al., "Optimized Product Quantization",
  // CVPR 2013 §4 — public method; the RANDOM-rotation variant, OPQ's
  // standard cheap baseline): PQ quantizes each dsub-dim subspace
  // independently, so correlated / variance-skewed dimensions waste the
  // bit budget. A seeded orthonormal rotation R decorrelates and
  // balances energy across subspaces; rotating both residuals (encode
  // side) and queries (LUT side) leaves every inner product and norm
  // identical in exact arithmetic — only the QUANTIZATION GRID changes,
  // which is the point. Cost: one native O(d²) matvec per corpus row at
  // encode time (the pq_lut kernel with m=1, ksub=dim: lut[k] = ⟨x,
  // R_k⟩ IS R·x) — a one-off next to the per-pair search work, and the
  // search-many path reads codes only, exactly as before.
  // ------------------------------------------------------------------

  /** Seeded orthonormal rotation, row-major `flat(r·dim + c)`. */
  final case class Rotation(dim: Int, flat: Array[Double])

  /** Deterministic random rotation: seeded Gaussian matrix,
    * Gram-Schmidt orthonormalized (driver-side, dim² doubles). */
  def rotation(dim: Int, seed: Long = 42L): Rotation = {
    val rng = new scala.util.Random(seed)
    val rows = Array.fill(dim)(Array.fill(dim)(rng.nextGaussian()))
    var r = 0
    while (r < dim) {
      var p = 0
      while (p < r) {
        var d = 0.0
        var t = 0
        while (t < dim) { d += rows(r)(t) * rows(p)(t); t += 1 }
        t = 0
        while (t < dim) { rows(r)(t) -= d * rows(p)(t); t += 1 }
        p += 1
      }
      var n2 = 0.0
      var t = 0
      while (t < dim) { n2 += rows(r)(t) * rows(r)(t); t += 1 }
      val inv = 1.0 / math.sqrt(n2)
      t = 0
      while (t < dim) { rows(r)(t) *= inv; t += 1 }
      r += 1
    }
    Rotation(dim, rows.flatten)
  }

  /**
   * Data-DEPENDENT OPQ rotation (Ge et al. CVPR 2013 §5's "eigenvalue
   * allocation" — the parametric initialization, optimal for Gaussian
   * data and the standard one-shot upgrade over a random rotation): PCA
   * of a seeded driver-side sample decorrelates the dimensions, then the
   * principal directions are dealt to the m subspaces so every
   * subspace's variance PRODUCT is balanced — greedy over eigenvalues in
   * descending order, each to the unfilled subspace with the smallest
   * log-variance product. Balanced information per subspace is exactly
   * what per-subspace k-means needs to spend its ksub codewords evenly.
   *
   * Deterministic end to end: the sample is the xxhash64-ordered prefix
   * (the [[train]] discipline — partition-independent), moments are
   * accumulated driver-side in that fixed order, and LAPACK's
   * eigendecomposition of a bit-identical matrix is bit-identical.
   * O(sampleN·d²) driver flops — ~17M at d=64/sampleN=4096, milliseconds.
   *
   * Train the codebook on the SAME rotated input this returns for
   * (e.g. residuals for residual IVFADC — [[pcaRotationResidual]]).
   */
  def pcaRotation(input: DataFrame, id: String, vec: String, dim: Int, m: Int,
                  sampleN: Int = 4096): Rotation =
    eigAllocRotation(collectSample(input, id, vec, dim, sampleN), dim, m)

  /** The seeded driver-side sample both data-dependent rotations train
    * on: xxhash64-ordered prefix (partition-independent — the [[train]]
    * discipline), finite vectors only. */
  private def collectSample(input: DataFrame, id: String, vec: String,
                            dim: Int, sampleN: Int): Array[Array[Double]] = {
    val rows = input
      .select(col(vec).as("__v"), col(id).as("__id"), xxhash64(col(id)).as("__r"))
      .where(finiteVec(col("__v"), dim))
      .orderBy(col("__r"), col("__id")).limit(sampleN)
      .collect()
      .map(_.getSeq[Any](0).map(_.asInstanceOf[Number].doubleValue()).toArray)
    require(rows.nonEmpty, "rotation training needs at least one valid vector")
    rows
  }

  private def eigAllocRotation(rows: Array[Array[Double]], dim: Int, m: Int): Rotation = {
    require(m > 0 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val n = rows.length
    val mean = new Array[Double](dim)
    rows.foreach { v =>
      var t = 0; while (t < dim) { mean(t) += v(t); t += 1 }
    }
    var t0 = 0
    while (t0 < dim) { mean(t0) /= n; t0 += 1 }
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    rows.foreach { v =>
      var i = 0
      while (i < dim) {
        val di = v(i) - mean(i)
        var j = 0
        while (j <= i) { cov(i, j) += di * (v(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    for (i <- 0 until dim; j <- 0 to i) {
      val x = cov(i, j) / n; cov(i, j) = x; cov(j, i) = x
    }
    val es = breeze.linalg.eigSym(cov)
    val desc = (0 until dim).sortBy(i => (-es.eigenvalues(i), i))
    val dsub = dim / m
    val bucketLog = new Array[Double](m)
    val buckets = Array.fill(m)(Vector.empty[Int])
    for (ei <- desc) {
      var best = -1
      var bestV = Double.MaxValue
      var b = 0
      while (b < m) {
        if (buckets(b).length < dsub && bucketLog(b) < bestV) {
          bestV = bucketLog(b); best = b
        }
        b += 1
      }
      // λ→0 directions carry no information; floor keeps the log finite
      bucketLog(best) += math.log(math.max(es.eigenvalues(ei), 1e-12))
      buckets(best) = buckets(best) :+ ei
    }
    val flat = new Array[Double](dim * dim)
    var r = 0
    for (b <- 0 until m; ei <- buckets(b)) {
      var t = 0
      while (t < dim) { flat(r * dim + t) = es.eigenvectors(t, ei); t += 1 }
      r += 1
    }
    Rotation(dim, flat)
  }

  /** [[pcaRotation]] over the IVF residuals — the input residual IVFADC
    * actually quantizes (rotating for the RAW distribution would
    * misallocate: coarse assignment already removes the between-cell
    * variance). */
  def pcaRotationResidual(index: Similarity.IvfIndex, id: String, vec: String,
                          dim: Int, m: Int, sampleN: Int = 4096): Rotation =
    pcaRotation(ivfResiduals(index, vec), id, "__res", dim, m, sampleN)

  /**
   * Non-parametric OPQ rotation (Ge et al. CVPR 2013 §4, Algorithm 1 —
   * the full alternating optimization, the published upgrade over both
   * the random baseline AND the parametric eigenvalue allocation):
   * starting from [[pcaRotation]]'s allocation, alternate
   *   (a) per-subspace Lloyd k-means over the ROTATED sample (the
   *       codebook step — distortion falls with R fixed), and
   *   (b) the orthogonal Procrustes update R = U·Vᵀ from the SVD of
   *       Z·Xᵀ, Z the reconstructed (quantized) rotated sample (the
   *       rotation step — distortion falls with codebooks fixed),
   * so per-iteration quantization MSE is monotone non-increasing on the
   * sample. All driver-side over the same seeded xxhash64-prefix sample
   * [[pcaRotation]] uses — O(opqIters·(n·ksub·dim + dim²·n + dim³))
   * flops (~1e8 at n=4096, d=64: well under a second), deterministic
   * end to end (strided k-means seeding in sample order, farthest-point
   * empty-cell reseed with index tiebreak, LAPACK on bit-identical
   * input). Train the production codebook on the returned rotation
   * (`trainResidual(..., rot = Some(r))`) exactly as with the other
   * rotations — the sample-trained codebooks here only steer R.
   */
  def opqRotation(input: DataFrame, id: String, vec: String, dim: Int, m: Int,
                  ksub: Int, sampleN: Int = 4096, opqIters: Int = 8,
                  kmeansIters: Int = 8): Rotation = {
    require(m > 0 && dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val x = collectSample(input, id, vec, dim, sampleN)
    val n = x.length
    val dsub = dim / m
    var rot = eigAllocRotation(x, dim, m)
    val rx = Array.ofDim[Double](n, dim) // R·x, refreshed per OPQ iteration
    val z = Array.ofDim[Double](n, dim)  // per-subspace reconstructions
    for (_ <- 1 to opqIters) {
      var i = 0
      while (i < n) {
        val out = rx(i); val in = x(i)
        var r = 0
        while (r < dim) {
          var s = 0.0; var t = 0
          while (t < dim) { s += rot.flat(r * dim + t) * in(t); t += 1 }
          out(r) = s; r += 1
        }
        i += 1
      }
      for (j <- 0 until m) {
        val off = j * dsub
        // strided deterministic seeding over the hash-ordered sample
        val cents = Array.tabulate(ksub) { k =>
          val src = rx(((k.toLong * (n - 1)) / math.max(1, ksub - 1)).toInt)
          java.util.Arrays.copyOfRange(src, off, off + dsub)
        }
        val assign = new Array[Int](n)
        for (_ <- 1 to kmeansIters) {
          var i2 = 0
          while (i2 < n) {
            var best = 0; var bestD = Double.MaxValue; var k = 0
            while (k < ksub) {
              var d = 0.0; var t = 0
              while (t < dsub) {
                val df = rx(i2)(off + t) - cents(k)(t); d += df * df; t += 1
              }
              if (d < bestD) { bestD = d; best = k }
              k += 1
            }
            assign(i2) = best; i2 += 1
          }
          val sums = Array.ofDim[Double](ksub, dsub)
          val cnts = new Array[Int](ksub)
          i2 = 0
          while (i2 < n) {
            val a = assign(i2); cnts(a) += 1
            var t = 0
            while (t < dsub) { sums(a)(t) += rx(i2)(off + t); t += 1 }
            i2 += 1
          }
          for (k <- 0 until ksub) {
            if (cnts(k) > 0) {
              var t = 0
              while (t < dsub) { cents(k)(t) = sums(k)(t) / cnts(k); t += 1 }
            } else {
              // deterministic farthest-point reseed (index tiebreak)
              var far = 0; var farD = -1.0; var i3 = 0
              while (i3 < n) {
                val c = cents(assign(i3))
                var d = 0.0; var t = 0
                while (t < dsub) {
                  val df = rx(i3)(off + t) - c(t); d += df * df; t += 1
                }
                if (d > farD) { farD = d; far = i3 }
                i3 += 1
              }
              var t = 0
              while (t < dsub) { cents(k)(t) = rx(far)(off + t); t += 1 }
              assign(far) = k
            }
          }
        }
        var i2 = 0
        while (i2 < n) {
          val c = cents(assign(i2))
          var t = 0
          while (t < dsub) { z(i2)(off + t) = c(t); t += 1 }
          i2 += 1
        }
      }
      // Procrustes: max tr(Rᵀ·M), M = Σ zᵢ·xᵢᵀ  ⇒  R = U·Vᵀ, M = U·S·Vᵀ
      val mMat = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
      var i4 = 0
      while (i4 < n) {
        val zi = z(i4); val xi = x(i4)
        var r = 0
        while (r < dim) {
          var t = 0
          while (t < dim) { mMat(r, t) += zi(r) * xi(t); t += 1 }
          r += 1
        }
        i4 += 1
      }
      val sv = breeze.linalg.svd(mMat)
      val ru = sv.U * sv.Vt
      val flat = new Array[Double](dim * dim)
      for (r <- 0 until dim; t <- 0 until dim) flat(r * dim + t) = ru(r, t)
      rot = Rotation(dim, flat)
    }
    rot
  }

  /** [[opqRotation]] over the IVF residuals (see
    * [[pcaRotationResidual]] for why residuals, not raw vectors). */
  def opqRotationResidual(index: Similarity.IvfIndex, id: String, vec: String,
                          dim: Int, m: Int, ksub: Int, sampleN: Int = 4096,
                          opqIters: Int = 8, kmeansIters: Int = 8): Rotation =
    opqRotation(ivfResiduals(index, vec), id, "__res", dim, m, ksub,
      sampleN, opqIters, kmeansIters)

  /** R·x as a native column (the pq_lut m=1 kernel against R's rows,
    * shipped as a broadcast handle via [[bArr]]). */
  private def rotateWith(vec: Column, rCol: Column, rot: Rotation): Column =
    call_function("pq_lut", vec, rCol, lit(1), lit(rot.dim))

  /** Driver-side R·x (cell-aux preparation). */
  private def rotateArr(rot: Rotation, v: Array[Double]): Array[Double] = {
    val out = new Array[Double](rot.dim)
    var r = 0
    while (r < rot.dim) {
      var s = 0.0
      var t = 0
      while (t < rot.dim) { s += rot.flat(r * rot.dim + t) * v(t); t += 1 }
      out(r) = s
      r += 1
    }
    out
  }

  /** IVF residuals with the rotation applied (when given): the
    * residual-codebook training/encode input. */
  private def residualInput(index: Similarity.IvfIndex, vec: String,
                            rot: Option[Rotation]): (DataFrame, String) = rot match {
    case None => (ivfResiduals(index, vec), "__res")
    case Some(r) =>
      val res = ivfResiduals(index, vec)
      (res.withColumn("__rres", rotateWith(col("__res"), bArr(res, r.flat), r)), "__rres")
  }

  /** Train a codebook on IVF residuals (the residual-IVFADC build);
    * `rot` trains in the rotated space (OPQ-lite). */
  def trainResidual(index: Similarity.IvfIndex, id: String, vec: String, dim: Int,
                    m: Int = 8, ksub: Int = 16, iters: Int = 2,
                    rot: Option[Rotation] = None): PqCodebook = {
    val (in, c) = residualInput(index, vec, rot)
    train(in, id, c, dim, m, ksub, iters)
  }

  /** Residual-IVFADC corpus preparation: (cId, cent, codes) where codes
    * encode x − μ_cell — same persist-once form as [[ivfPqEncode]]. */
  def ivfPqEncodeResidual(index: Similarity.IvfIndex, cId: String, cVec: String,
                          cb: PqCodebook, rot: Option[Rotation] = None): DataFrame = {
    val (in, c) = residualInput(index, cVec, rot)
    in.select(col(cId).as("cId"), col("__cent").as("cent"),
      encodeWith(col(c), bArr(in, cb.flat), cb).as("codes"))
  }

  /** Per-cell auxiliary table (driver-computed, nCentroids rows,
    * broadcast): centroid, its squared norm, and its LUT against the
    * residual codebook — everything scoring needs beyond the codes.
    * Under a rotation the codebook lives in ROTATED space, so the
    * centroid LUT is built from R·μ (‖μ‖² and dot(q, μ) are
    * rotation-invariant and stay in the original space). */
  private def cellAux(index: Similarity.IvfIndex, cb: PqCodebook,
                      rot: Option[Rotation]): Seq[(Int, Seq[Double], Double, Seq[Double])] =
    index.centroids.toSeq.map { case (cid, mu) =>
      var muN2 = 0.0
      var i = 0
      while (i < mu.length) { muN2 += mu(i) * mu(i); i += 1 }
      val muCb = rot.map(rotateArr(_, mu)).getOrElse(mu)
      val lutMu = new Array[Double](cb.m * cb.ksub)
      for (j <- 0 until cb.m; k <- 0 until cb.ksub) {
        var s = 0.0
        var t = 0
        while (t < cb.dsub) {
          s += muCb(j * cb.dsub + t) * cb.flat((j * cb.ksub + k) * cb.dsub + t)
          t += 1
        }
        lutMu(j * cb.ksub + k) = s
      }
      (cid, mu.toSeq, muN2, lutMu.toSeq)
    }

  /** Column helper: SDC pair score between two code columns — exactly
    * dot(reconstruction(a), reconstruction(b)), O(m) lookups. The 3-arg
    * form infers ksub = √(table.len/m) — it cannot distinguish a
    * wrong-geometry table whose length happens to make that a perfect
    * square; prefer the codebook overload, which pins m/ksub. */
  def sdcDot(tableLit: Column, a: Column, b: Column): Column =
    call_function("pq_sdc_dot", tableLit, a, b)

  /** SDC pair score with the geometry pinned from the codebook — a table
    * that doesn't match m·ksub² yields NULL, never silently wrong
    * scores. */
  def sdcDot(table: Column, a: Column, b: Column, cb: PqCodebook): Column =
    call_function("pq_sdc_dot", table, a, b, lit(cb.m), lit(cb.ksub))

  /**
   * Embedding near-duplicate pairs over an ENCODED corpus (SDC): pairs
   * within the same IVF cell whose approximate cosine — SDC dot over
   * reconstruction norms — reaches `threshold`. The 100 TB dedup shape:
   * candidate generation is cell-bucketed (Σ cell² pairs, never n²) and
   * pair scoring reads m-byte codes only; the float embeddings are
   * needed ONCE, at [[ivfPqEncode]] time. Same recall caveat as every
   * bucketed near-dup path here ([[Similarity.embeddingNearDupPairs]],
   * LSH): a pair split across cells is not a candidate — raise recall
   * with more Lloyd iterations or fewer, larger cells.
   * `corpusCodes` is [[ivfPqEncode]] output (cId, cent, codes); returns
   * (idA, idB, cos).
   */
  def sdcNearDupPairsEncoded(corpusCodes: DataFrame, cb: PqCodebook,
                             threshold: Double): DataFrame =
    sdcScoredPairs(corpusCodes, cb, "idA", col("idA") < col("cId"))
      .filter(col("cos") >= threshold)
      .select(col("idA"), col("cId").as("idB"), col("cos"))

  /** Shared SDC scaffold for the encoded-corpus pair operators: every
    * same-cell pair of `corpusCodes` ([[ivfPqEncode]] output), scored
    * by SDC cosine as (leftId, cId, cos, …). The m·ksub² table rides as
    * a TorrentBroadcast handle ([[bArr]]), not a plan literal: at
    * ksub=128 it is ~262k doubles (2 MB), and a literal that size makes
    * every Catalyst transform re-hash it (plan time dwarfed the actual
    * scoring, 2.5 s vs 0.3 s at sf0.1 — the round-8 fix) while even a
    * 1-row broadcast-joined DataFrame still serialized it into one task
    * binary per broadcast build (the round-9 fix). Per-row norm work is
    * duplicated across the two join sides (no shared subplan without a
    * cache); negligible — pair scoring at Σ cell² pairs dominates the
    * 2n per-row adcDots. */
  private def sdcScoredPairs(corpusCodes: DataFrame, cb: PqCodebook,
                             leftId: String,
                             pairFilter: Column): DataFrame = {
    reg(corpusCodes)
    // ONE broadcast each for the norm-LUT and the SDC table, shared by
    // both self-join sides and the pair scorer
    val nlut = bArr(corpusCodes, cb.normLut)
    val table = bArr(corpusCodes, cb.sdcTable)
    val a = corpusCodes.select(col("cId").as(leftId), col("cent").as("__cent"),
        col("codes").as("__ca"))
      .withColumn("__na", sqrt(adcDot(nlut, col("__ca"))))
    val b = corpusCodes.select(col("cId").as("cId"), col("cent").as("__cent"),
        col("codes").as("__cb"))
      .withColumn("__nb", sqrt(adcDot(nlut, col("__cb"))))
    a.join(b, "__cent")
      .filter(pairFilter)
      .withColumn("cos", guardedCos(
        sdcDot(table, col("__ca"), col("__cb"), cb), col("__na"), col("__nb")))
  }

  /**
   * k-NN graph over an ENCODED corpus: for every vector, its k nearest
   * same-cell neighbors by SDC cosine — the candidate-generation
   * backbone of clustering / SemDeDup-style pipelines, reading m-byte
   * codes only. Candidate cost is Σ cell² pairs (never n²); neighbors
   * in other cells are not candidates (the standard bucketed-recall
   * trade — more Lloyd iterations or fewer cells raise recall).
   * `corpusCodes` is [[ivfPqEncode]] output; returns (qId, cId, cos,
   * rank) with rank ≤ k per qId.
   */
  def knnGraphEncoded(corpusCodes: DataFrame, cb: PqCodebook, k: Int): DataFrame =
    Similarity.rankTopK(
      sdcScoredPairs(corpusCodes, cb, "qId", col("qId") =!= col("cId")), k)

  /**
   * Semantic deduplication over an ENCODED corpus (the SemDeDup shape,
   * Abbas et al. 2023 — public method — composed from library pieces):
   * SDC near-duplicate pairs within IVF cells → transitive
   * connected-component collapse → keep one survivor (the min id) per
   * component. The whole pipeline reads m-byte codes; float embeddings
   * are touched exactly once, at [[ivfPqEncode]] time — at 100 TB the
   * dedup pass runs over a corpus 18–32× smaller than the raw
   * embedding column. Returns the SURVIVING input rows — (cId, cent,
   * codes), so the deduped corpus chains straight into
   * [[knnGraphEncoded]]/[[ivfPqTopKEncoded]] without re-joining the
   * original (the Dedup.dedupNear convention).
   */
  def semanticDedupEncoded(corpusCodes: DataFrame, cb: PqCodebook,
                           threshold: Double): DataFrame = {
    val pairs = sdcNearDupPairsEncoded(corpusCodes, cb, threshold)
    val comps = Dedup.connectedComponents(pairs)
    val drops = comps.filter(col("id") =!= col("component"))
      .select(col("id").as("cId")).distinct()
    corpusCodes.join(drops, Seq("cId"), "left_anti")
  }

  /** Residual-IVFADC top-k (convenience: encodes the corpus inline). */
  def ivfPqTopKResidual(index: Similarity.IvfIndex, queries: DataFrame,
                        qId: String, qVec: String, cId: String, cVec: String,
                        k: Int, cb: PqCodebook, nProbe: Int = 2,
                        excludeSelf: Boolean = true,
                        rot: Option[Rotation] = None): DataFrame =
    ivfPqTopKResidualEncoded(index, ivfPqEncodeResidual(index, cId, cVec, cb, rot),
      queries, qId, qVec, k, cb, nProbe, excludeSelf, rot)

  /** Residual-IVFADC top-k over a corpus prepared by
    * [[ivfPqEncodeResidual]] — the search-many path. Pass the SAME
    * `rot` used at encode time: the query LUT is built from R·q against
    * the rotated-space codebook (dot(q, r̂) = dot(R·q, R·r̂)); the
    * coarse probe, dot(q, μ) and the norms stay in the original space. */
  def ivfPqTopKResidualEncoded(index: Similarity.IvfIndex, corpusCodes: DataFrame,
                               queries: DataFrame, qId: String, qVec: String,
                               k: Int, cb: PqCodebook, nProbe: Int = 2,
                               excludeSelf: Boolean = true,
                               rot: Option[Rotation] = None): DataFrame = {
    reg(queries)
    val spark = queries.sparkSession
    import spark.implicits._
    val aux = cellAux(index, cb, rot).toDF("__cent", "__mu", "__muN2", "__lutMu")
    val cbFlatQ = bArr(queries, cb.flat)
    val qVecForLut = rot match {
      case Some(r) => rotateWith(col("__qv"), bArr(queries, r.flat), r)
      case None => col("__qv")
    }
    val q = Similarity.probeAssign(queries, qId, qVec, index, nProbe)
      .join(broadcast(aux.select(col("__cent"), col("__mu"))), "__cent")
      .withColumn("__lut", lutWith(qVecForLut, cbFlatQ, cb))
      .withColumn("__qn", call_function("vector_norm", col("__qv")))
      .withColumn("__qmu", call_function("dot_product", col("__qv"), col("__mu")))
      .select(col("qId"), col("__cent"), col("__lut"), col("__qn"), col("__qmu"))
    val c = corpusCodes.select(col("cId"), col("cent").as("__cent"), col("codes").as("__codes"))
      .join(broadcast(aux.select(col("__cent"), col("__muN2"), col("__lutMu"))), "__cent")
      // ‖x̂‖² reassembled from three cancelling terms can round to a
      // tiny NEGATIVE for near-zero reconstructions — sqrt would give
      // NaN, which ranks FIRST; clamp at 0 so the degenerate row gets
      // cn = 0 → NULL cos → sorts last, like every other path
      .withColumn("__cn", sqrt(greatest(lit(0.0), col("__muN2")
        + lit(2.0) * adcDot(col("__lutMu"), col("__codes"))
        + adcDot(bArr(corpusCodes, cb.normLut), col("__codes")))))
    val joined = c.join(broadcast(q), "__cent")
    val scored = (if (excludeSelf) joined.filter(col("qId") =!= col("cId")) else joined)
      .withColumn("cos", guardedCos(
        col("__qmu") + adcDot(col("__lut"), col("__codes")), col("__qn"), col("__cn")))
    Similarity.rankTopK(scored, k)
  }
}
