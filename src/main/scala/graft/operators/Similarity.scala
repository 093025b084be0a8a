package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor / similarity search over an embedding
 * column (`ARRAY<FLOAT>`), pure Column math (zip_with + aggregate —
 * codegen'd, no UDFs):
 *
 *  - brute-force cosine top-k: broadcast the (smaller) query side
 *    against the corpus — exact baseline
 *  - LSH (random hyperplane signs) bucketing: the 100 TB path — the
 *    corpus is bucketed once, probes join only their bucket
 */
object Similarity {

  // Native codegen'd expressions ([[graft.functions.DotProduct]] etc.),
  // not aggregate(zip_with(...)): HOF lambdas are interpreted and the
  // pair-scoring loops here evaluate them |q|·|corpus| times.
  // The bare Column helpers can only see the thread's active session;
  // every DataFrame-taking operator below additionally registers on the
  // session that OWNS its input (a multi-session driver may build
  // columns for session A while B is active).
  private def reg(): Unit = graft.Graft.register(org.apache.spark.sql.SparkSession.active)
  private def reg(df: DataFrame): Unit = graft.Graft.register(df.sparkSession)

  def dot(a: Column, b: Column): Column = { reg(); call_function("dot_product", a, b) }

  def norm(a: Column): Column = { reg(); call_function("vector_norm", a) }

  def cosine(a: Column, b: Column): Column = { reg(); call_function("cosine_similarity", a, b) }

  /** Pairwise cosine from a precomputed norm per side: the per-pair work
    * is a single fused dot. Bit-identical to [[cosine]] for finite
    * vectors with nonzero norms (same element order, same `dot/(√·√)`
    * association); a zero or NaN DENOMINATOR (zero-norm vector, or a
    * NaN/±Inf element poisoning the norm) yields NULL instead — NaN
    * orders ABOVE every finite double under the `cos desc` rank, so one
    * garbage corpus vector would otherwise take rank 1 for EVERY query
    * and pass `cos >= threshold` near-dup filters. Same guard as the PQ
    * paths' guardedCos (Pq.scala), so float and PQ search agree on
    * degenerate rows: ranked last / filtered out, never first. */
  private def cosFromNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val denom = na * nb
    when(!isnan(denom) && denom =!= 0.0, dot(a, b) / denom)
      .otherwise(lit(null).cast("double"))
  }

  /** The shared ranking tail of every top-k search path: per-query
    * top-k under (cos desc NULLS LAST, cId asc) — ONE definition, so a
    * tie-break change can never drift between the exact and approximate
    * paths. Expects (qId, cId, cos).
    *
    * A bounded map-side aggregate ([[graft.agg.TopKByScore]]), not a
    * window `row_number`: the window shuffles and sorts EVERY scored
    * pair (O(|q|·|corpus|) rows — 8.5 s of the 12.7 s sf10 brute-force
    * knn), while the aggregate rejects most candidates with one double
    * compare against a k-heap root and ships one O(k) heap per
    * (query × task) through the shuffle. Identical output to the
    * window formulation, including NULL-cos candidates padding the
    * tail when a query has fewer than k non-null scores; both
    * formulations DROP null-cId rows (an id is a key — Spark's bare
    * `cId ASC` default of NULLS FIRST would otherwise let them consume
    * rank slots, which is never what a search caller wants). */
  private[operators] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    reg(scored)
    scored.groupBy(col("qId"))
      .agg(call_function("topk_by_score", col("cos"), col("cId"), lit(k)).as("__top"))
      .select(col("qId"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("qId"), col("__e").getField("cId").as("cId"),
        col("__e").getField("cos").as("cos"),
        (col("__pos") + lit(1)).as("rank"))
  }

  /** Public form of the shared ranking tail for ALREADY-SCORED pairs:
    * per-qId top-k of (qId, cId, cos) under (cos desc NULLS LAST,
    * cId asc) — for callers that score pairs their own way (a custom
    * metric, a rerank stage) but want the same bounded-aggregate tail
    * every built-in search path uses. */
  def topKScored(scored: DataFrame, k: Int): DataFrame = rankTopK(scored, k)

  /** The pre-round-12 window formulation of [[rankTopK]], kept for the
    * parity spec: same (cos desc, cId) order, rank = row_number. */
  private[operators] def rankTopKWindow(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("qId")).orderBy(col("cos").desc, col("cId"))
    scored.filter(col("cId").isNotNull) // shared contract: null ids are not rankable
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qId"), col("cId"), col("cos"), col("rank"))
  }

  /**
   * Exact top-k by cosine: for each row of `queries`, the k most similar
   * rows of `corpus`. The query side is broadcast (callers pass the
   * smaller side as `queries`); the corpus streams once.
   * Returns (qId, cId, cos, rank).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qVec: String, cId: String, cVec: String,
                     k: Int, excludeSelf: Boolean = true): DataFrame = {
    reg(queries)
    val q = queries.select(col(qId).as("qId"), col(qVec).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val c = corpus.select(col(cId).as("cId"), col(cVec).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val joined = c.crossJoin(broadcast(q))
    val scored = (if (excludeSelf) joined.filter(col("qId") =!= col("cId")) else joined)
      .withColumn("cos", cosFromNorms(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    rankTopK(scored, k)
  }

  /** Deterministic random hyperplanes (seeded), as a literal matrix. */
  private def planes(dim: Int, nPlanes: Int, seed: Long): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-bucket of a vector under `nPlanes` seeded hyperplanes.
    * 1..63 planes: the bucket is a sum of distinct long bits, so plane
    * 64's `1L << 64` would wrap onto plane 0's bit and carry-corrupt
    * the bucket (unrelated vectors colliding silently), and 0 planes
    * would crash an empty reduce — both rejected up front. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 8, seed: Long = 42L): Column = {
    require(nPlanes >= 1 && nPlanes <= 63,
      s"lshBucket needs 1..63 hyperplanes (distinct bits of one long), got $nPlanes")
    val ps = planes(dim, nPlanes, seed)
    ps.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /**
   * ANN top-k via hyperplane LSH: bucket both sides, join on bucket,
   * rank within candidates. Recall < 1 (probes see only their own
   * bucket); increase recall by lowering `nPlanes` or unioning several
   * seeds. Candidate cost is Σ bucket_q · bucket_c instead of |q|·|c|.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qId: String, qVec: String, cId: String, cVec: String,
              k: Int, dim: Int, nPlanes: Int = 8, seed: Long = 42L,
              excludeSelf: Boolean = true): DataFrame =
    lshTopKSeeds(queries, corpus, qId, qVec, cId, cVec, k, dim, nPlanes, Seq(seed),
      excludeSelf)

  /**
   * Multi-table LSH top-k: candidates are unioned across `seeds`
   * independent hyperplane sets (the standard recall lever — a true
   * neighbor is missed only if EVERY table splits the pair, so miss
   * probability decays geometrically in the table count). Each side is
   * bucketed once per seed (corpus cost × #seeds, the classic LSH
   * space/recall trade); duplicate candidates are deduplicated after
   * scoring, where the cosine is bit-identical across tables, so the
   * per-pair score is never window-ranked twice.
   */
  def lshTopKSeeds(queries: DataFrame, corpus: DataFrame,
                   qId: String, qVec: String, cId: String, cVec: String,
                   k: Int, dim: Int, nPlanes: Int = 8,
                   seeds: Seq[Long] = Seq(42L, 43L, 44L),
                   excludeSelf: Boolean = true): DataFrame = {
    require(seeds.nonEmpty, "lshTopKSeeds needs at least one seed")
    reg(queries)
    def tables(vec: Column): Column = array(seeds.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("s"), lshBucket(vec, dim, nPlanes, s).as("b")) }: _*)
    val q = queries.select(col(qId).as("qId"), col(qVec).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .select(col("qId"), col("__qv"), col("__qn"), explode(tables(col("__qv"))).as("__sb"))
    val c = corpus.select(col(cId).as("cId"), col(cVec).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .select(col("cId"), col("__cv"), col("__cn"), explode(tables(col("__cv"))).as("__sb"))
    val joined = c.join(q, "__sb")
    val scored = (if (excludeSelf) joined.filter(col("qId") =!= col("cId")) else joined)
      .withColumn("cos", cosFromNorms(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
      .select(col("qId"), col("cId"), col("cos"))
    // multiplicity ≤ #seeds and the cos is bit-identical across tables —
    // but with ONE table each pair already appears once, and the
    // delegating single-seed lshTopK must not pay a dedup shuffle
    rankTopK(if (seeds.size > 1) scored.distinct() else scored, k)
  }

  /**
   * IVF (inverted-file) index: centroids picked deterministically from a
   * seeded sample of the corpus, every vector assigned to its nearest
   * centroid (one broadcast pass — the 100 TB corpus is scanned once and
   * shuffled by centroid id only if the caller buckets storage).
   */
  final case class IvfIndex(centroids: Array[(Int, Array[Double])], assigned: DataFrame)

  def ivfBuild(corpus: DataFrame, id: String, vec: String, nCentroids: Int,
               seed: Long = 42L, kmeansIters: Int = 2): IvfIndex = {
    // default 2 Lloyd iterations: q45 pins the refinement buying recall
    // (41% → 57% at 3 iters on near-uniform data), and since the means
    // are fixed-point-deterministic there is no reproducibility cost —
    // a caller on defaults should get the refined quality
    reg(corpus)
    // deterministic seeded sample initializes the centroids; optional
    // Lloyd iterations refine them distributed-style: assign is a
    // broadcast map pass, the new means are a (centroid, dimension)
    // grouped sum — map-side partial aggregation, only
    // nCentroids × dim rows ever reach the driver.
    // The per-dimension sums are FIXED-POINT (x · 2^24 truncated to
    // long): integer addition is exact and order-independent, so the
    // refined centroids are bit-deterministic under ANY partitioning /
    // shuffle-fetch order — a float `avg` would make them (and every
    // pinned recall golden downstream) machine-dependent. The ≤2⁻²⁴
    // truncation per element is far below any clustering signal. Scale
    // bound: |x|·2²⁴·rowsPerCentroid must stay < 2⁶³ — at |x| ≤ 100
    // that is ~5×10¹² rows per centroid, far beyond any real shard.
    val FP = 1L << 24
    // rows with a NULL/NaN/±Inf element are excluded from sampling AND
    // the Lloyd sums (the Pq.train discipline, = finiteVec): a NULL
    // vector would NPE the sample decode, a NaN element casts to 0 in
    // the fixed-point transform and an Inf to Long.MaxValue — silently
    // poisoning a centroid that residual IVFADC then bakes into every
    // score
    // the seed folds in as an XOR over the id hash, diffused through the
    // 64-bit murmur finalizer so a small seed delta flips HIGH bits too
    // (a raw low-bit XOR would almost never change the sample ordering).
    // fmix64(0) == 0, so the DEFAULT seed (42) XORs with 0 —
    // bit-identical to the historical xxhash64(id) order, and the pinned
    // recall goldens (q45/q57/q58/q63/q65) cannot move. The id tiebreak
    // makes the sampled set deterministic even under duplicate ids or a
    // hash collision (the Pq.train discipline).
    def fmix64(z0: Long): Long = {
      var z = z0
      z ^= z >>> 33; z *= 0xff51afd7ed558ccdL
      z ^= z >>> 33; z *= 0xc4ceb9fe1a85ec53L
      z ^ (z >>> 33)
    }
    var cents = corpus.select(col(id), col(vec))
      .where(finiteVec(col(vec)))
      .withColumn("__r", xxhash64(col(id)).bitwiseXOR(lit(fmix64(seed ^ 42L))))
      .orderBy(col("__r"), col(id)).limit(nCentroids)
      .collect().zipWithIndex
      // any fixed-width numeric element type (float embeddings, int8-
      // quantized corpora, …) — same acceptance as the scoring kernels
      .map { case (r, i) =>
        i -> r.getSeq[Any](1).map(_.asInstanceOf[Number].doubleValue()).toArray }
    require(cents.nonEmpty,
      "ivfBuild: no finite corpus vectors to sample centroids from " +
        "(every row has a NULL vector or a NULL/NaN/Inf element)")
    // one centroid dimension, established by the sample: a mixed-length
    // corpus would misalign the flat codebook matrix (silent garbage
    // assignments) — fail loudly here, and size-guard the Lloyd sums so
    // a stray wrong-length row cannot feed __pos past the decode arrays
    val dimC = cents.head._2.length
    require(cents.forall(_._2.length == dimC),
      s"ivfBuild: sampled vectors have mixed lengths (expected $dimC)")
    for (_ <- 1 to kmeansIters) {
      // the iteration's centroid matrix is superseded as soon as this
      // pass has collected — release its TorrentBroadcast explicitly
      // (the bcCache memoizes per array instance; without the release,
      // each Lloyd round would leave a dead broadcast pinned in the
      // driver BlockManager for the life of the context)
      val iterFlat = if (cents.length <= 32768) cents.sortBy(_._1).flatMap(_._2) else null
      val means = assignCentroidFlat(
          corpus.where(finiteVec(col(vec)) && size(col(vec)) === lit(dimC))
            .select(col(vec).as("__v")), "__v", cents, iterFlat)
        // assignment in its OWN projection below the generate (inside
        // assignCentroid): a sibling expression beside a generator lands
        // in the Project ABOVE the Generate and re-evaluates once per
        // EXPLODED ELEMENT (dim× the assignment cost — the round-8
        // ScaleProbe regression); split selects pin it below, computed
        // once per row
        .select(col("__cent"),
          posexplode(transform(col("__v"), x => (x.cast("double") * FP).cast("long")))
            .as(Seq("__pos", "__x")))
        // a NULL vector / NULL element yields a NULL centroid (the same
        // null-in → null-out as the scoring kernels): skip it here, or
        // the driver decode below NPEs on the null group key
        .where(col("__cent").isNotNull)
        .groupBy("__cent", "__pos")
        .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect().groupBy(_.getInt(0))
      if (iterFlat != null) Pq.releaseArr(iterFlat)
      cents = cents.map { case (i, old) =>
        means.get(i) match {
          case Some(rows) =>
            val arr = old.clone()
            rows.foreach(r => arr(r.getInt(1)) = r.getLong(2).toDouble / FP / r.getLong(3))
            i -> arr
          case None => i -> old // empty cluster: keep the previous centroid
        }
      }
    }
    val assigned = assignCentroid(corpus, vec, cents)
    IvfIndex(cents, assigned)
  }

  /** Append `__cent` = nearest-centroid id (argmin of L2²). Up to 32768
    * centroids the argmin IS the native `pq_encode` kernel with m=1,
    * ksub=nCentroids — same element order, same left-to-right sum
    * association, same strict-< lowest-id tie-break, same
    * null-in→null-out — byte codes (`pq_encode`) to 128 cells,
    * SMALLINT codes (`pq_encode_s`) beyond (real corpora need cells ∝
    * corpus for the Σ cell² encoded-dedup family, so 128 was a scale
    * cap, not a constant). The centroid matrix ships as a
    * TorrentBroadcast handle ([[Pq.bArr]]), not a plan literal — a
    * literal gets duplicated into pushed-down scan filters and both
    * sides of the downstream self-joins and serialized into every task
    * binary (the round-8 2 MB task warning). Past 32768: the
    * interpreted HOF argmin (array_min + array_position — first match
    * wins on exact ties). Centroid ids equal their position in the flat
    * matrix, which ivfBuild maintains. */
  private def assignCentroid(df: DataFrame, vec: String,
                             cents: Array[(Int, Array[Double])]): DataFrame =
    assignCentroidFlat(df, vec, cents,
      if (cents.length <= 32768) cents.sortBy(_._1).flatMap(_._2) else null)

  /** [[assignCentroid]] with a caller-held flat centroid matrix (ignored
    * on the >32768 HOF branch), so Lloyd loops can release the
    * iteration's broadcast as soon as its pass has collected. */
  private def assignCentroidFlat(df: DataFrame, vec: String,
                                 cents: Array[(Int, Array[Double])],
                                 flat: Array[Double]): DataFrame =
    if (cents.length <= 32768) {
      val fn = if (cents.length <= 128) "pq_encode" else "pq_encode_s"
      df.withColumn("__cent", element_at(call_function(fn,
        col(vec), Pq.bArr(df, flat), lit(1), lit(cents.length)), 1).cast("int"))
    } else {
      val centLit = typedLit(cents.map { case (i, v) => (i, v.toSeq) }.toSeq)
      val vd = transform(col(vec), x => x.cast("double"))
      val d2s = transform(centLit, c =>
        aggregate(zip_with(vd, c.getField("_2"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, v) => acc + v))
      df.withColumn("__cent",
        (array_position(d2s, array_min(d2s)) - 1).cast("int"))
    }

  /** Complete-and-finite vector predicate shared by ivfBuild's Lloyd
    * sums and probeAssign's degenerate-query drop (the [[Pq]] train
    * discipline): NULL vector, NULL element, NaN or ±Inf element all
    * fail. */
  private def finiteVec(c: Column): Column =
    c.isNotNull && !exists(c, x => x.isNull || isnan(x.cast("double")) ||
      abs(x.cast("double")) === lit(Double.PositiveInfinity))

  /** The probe stage shared by IVF-flat and IVFADC search: each query row
    * exploded into its `nProbe` nearest centroid ids — (qId, __qv,
    * __cent). ONE definition so the coarse stage can never drift between
    * the float and PQ fine-scoring paths.
    *
    * The O(nCentroids·dim) inner work per query row is NATIVE: `pq_lut`
    * with m=1 yields dot(q, μₖ) for every centroid in one codegen'd
    * pass, and the probe ranking uses the equivalent key
    * ‖μₖ‖² − 2·dot(q, μₖ) (the per-row ‖q‖² constant cannot change the
    * ordering). Only an O(nCentroids) zip/sort/slice remains as HOFs —
    * load-bearing when the query side IS a corpus (ANN self-join
    * dedup), where the old per-row interpreted distance loop was an
    * interpreted corpus pass. */
  private[operators] def probeAssign(queries: DataFrame, qId: String, qVec: String,
                                     index: IvfIndex, nProbe: Int): DataFrame = {
    reg(queries)
    val spark = queries.sparkSession
    import spark.implicits._
    val dim = index.centroids.headOption.map(_._2.length).getOrElse(0)
    // degenerate queries (NULL vector, NULL element, NaN/±Inf element,
    // wrong dimension) are DROPPED — explicitly, so both branches below
    // agree: the native path's NULL lut (pq_lut NaN-guards) would drop
    // them via explode(NULL), while the HOF path would emit probes with
    // a NaN d2 (NaN orders LARGEST in array_sort, i.e. arbitrary probe
    // cells) or a NULL d2, and the two must not differ by a single row
    val base = queries.select(col(qId).as("qId"), col(qVec).as("__qv"))
      .where(size(col("__qv")) === dim && finiteVec(col("__qv")))
    val probed =
      if (index.centroids.length <= 32768) {
        // native kernel to pq_lut's SMALLINT bound; the centroid matrix
        // and per-centroid norms ride as 1-row broadcast DATA, not plan
        // literals (at 1024 cells × 64 dims a literal is 64k doubles in
        // every task binary). The (id, norm) structs need a real row
        // shape, so this stays a broadcast join rather than Pq.bArr;
        // at the 32768-cell bound the aux row is ~17 MB — if probe
        // tables ever grow past the task-size warning, split the norms
        // into a second bArr and rebuild the structs positionally
        val byId = index.centroids.sortBy(_._1)
        val aux = Seq((byId.flatMap(_._2).toSeq, byId.map { case (i, v) =>
          var s = 0.0; var t = 0
          while (t < v.length) { s += v(t) * v(t); t += 1 }
          (i, s)
        }.toSeq)).toDF("__pflat", "__pmun2")
        val lutc = call_function("pq_lut", col("__qv"), col("__pflat"),
          lit(1), lit(index.centroids.length))
        val probes = slice(transform(array_sort(zip_with(col("__pmun2"), lutc,
          (c, l) => struct((c.getField("_2") - l * 2).as("key"), c.getField("_1").as("cid")))),
          s => s.getField("cid")), 1, nProbe)
        base.crossJoin(broadcast(aux)).withColumn("__probes", probes)
      } else {
        // beyond pq_lut's 32768-codeword bound: the HOF formulation
        val centLit = typedLit(index.centroids.map { case (i, v) => (i, v.toSeq) }.toSeq)
        val probes = slice(transform(array_sort(transform(centLit, c =>
          struct(
            aggregate(zip_with(transform(col("__qv"), x => x.cast("double")), c.getField("_2"),
              (a, b) => (a - b) * (a - b)), lit(0.0), (acc, v) => acc + v).as("d2"),
            c.getField("_1").as("cid")))), s => s.getField("cid")), 1, nProbe)
        base.withColumn("__probes", probes)
      }
    probed.select(col("qId"), col("__qv"), explode(col("__probes")).as("__cent"))
  }

  /**
   * ANN top-k through the IVF index: queries probe only the `nProbe`
   * nearest centroids' postings lists — candidate cost is
   * |q| · (nProbe/nCentroids) · |corpus| instead of |q| · |corpus|.
   *
   * Degenerate query rows (NULL vector, NULL/NaN/±Inf element, wrong
   * dimension) are DROPPED by the probe stage, not emitted with a NULL cos — the
   * result can have fewer distinct qIds than `queries` has rows. (Same
   * for every IVF-probed path: [[Pq.ivfPqTopK]] and the residual
   * variants.) `excludeSelf` (default true) drops candidates with
   * cId == qId — pass false when queries and corpus are different
   * datasets that share an id space.
   */
  def ivfTopK(index: IvfIndex, queries: DataFrame, qId: String, qVec: String,
              cId: String, cVec: String, k: Int, nProbe: Int = 2,
              excludeSelf: Boolean = true): DataFrame = {
    reg(queries)
    val q = probeAssign(queries, qId, qVec, index, nProbe)
      .withColumn("__qn", norm(col("__qv")))
    val c = index.assigned.select(col(cId).as("cId"), col(cVec).as("__cv"), col("__cent"))
      .withColumn("__cn", norm(col("__cv")))
    val joined = c.join(broadcast(q), "__cent")
    val scored = (if (excludeSelf) joined.filter(col("qId") =!= col("cId")) else joined)
      .withColumn("cos", cosFromNorms(col("__qv"), col("__cv"), col("__qn"), col("__cn")))
    rankTopK(scored, k)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold among LSH-bucket
    * candidates (exact variant: pass nPlanes = 0 for a full self-join). */
  def embeddingNearDupPairs(df: DataFrame, id: String, vec: String, threshold: Double,
                            dim: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    reg(df)
    val base = df.select(col(id).as("idA"), col(vec).as("__va"))
      .withColumn("__na", norm(col("__va")))
    val other = df.select(col(id).as("idB"), col(vec).as("__vb"))
      .withColumn("__nb", norm(col("__vb")))
    val pairs =
      if (nPlanes <= 0) base.crossJoin(other)
      else {
        val a = base.withColumn("__bucket", lshBucket(col("__va"), dim, nPlanes, seed))
        val b = other.withColumn("__bucket", lshBucket(col("__vb"), dim, nPlanes, seed))
        a.join(b, "__bucket")
      }
    pairs.filter(col("idA") < col("idB"))
      .withColumn("cos", cosFromNorms(col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("idA"), col("idB"), col("cos"))
  }
}
