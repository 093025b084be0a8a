package graft.ml

import graft.Graft
import graft.ring.Triple
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/**
 * Factorized learning over joins (reference README.md:163-173, LMFAO /
 * F-IVM style): the cofactor triple of `left ⋈ right` computed from
 * per-join-key pre-aggregates combined with the ring product — |keys|
 * triple multiplications instead of |join| row lifts. The join itself is
 * between two *aggregated* relations (one row per key each side), so the
 * wide raw join is never materialized or shuffled.
 */
object Factorized {

  /**
   * Cofactor of the equi-join without materializing it. Resulting column
   * order: `[leftNum ++ rightNum, leftCat ++ rightCat]` (the ring
   * product's block layout, mul.cpp:262-289).
   */
  def cofactorOverJoin(left: DataFrame, right: DataFrame, key: String,
                       leftNum: Seq[String], leftCat: Seq[String],
                       rightNum: Seq[String], rightCat: Seq[String]): Triple = {
    val spark = left.sparkSession
    Graft.register(spark)
    def side(df: DataFrame, k: String, num: Seq[String], cat: Seq[String], alias: String) = {
      val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
      df.groupBy(col(k).as("__k")).agg(Graft.sumTriple(cols: _*).as(alias))
    }
    val a = side(left, key, leftNum, leftCat, "__A")
    val b = side(right, key, rightNum, rightCat, "__B")
    // both sides are one-triple-per-key aggregates feeding one more fused
    // aggregate — same SHUFFLE_HASH reasoning as the adaptive fallback:
    // sorting |keys| serialized triple buffers buys nothing. Size-guarded
    // (see hashJoinIfSafe): a non-spillable hash build over many keys'
    // triple buffers can exceed task memory just like a raw-row build.
    // buildKeysUnique: both sides are groupBy outputs, so the hot-key
    // probe scan is skipped — max multiplicity is 1 by construction.
    val row = hashJoinIfSafe(a, b, Seq("__k"), buildKeysUnique = true)
      .select(Graft.sumTripleOf(Graft.multiplyTriple(col("__A"), col("__B"))).as("t"))
      .head()
    // empty join → sum_triple yields NULL; the cofactor of zero rows is
    // the zero triple of the combined arity
    if (row.isNullAt(0))
      Triple.zero(leftNum.length + rightNum.length, leftCat.length + rightCat.length)
    else Graft.tripleFromRow(row.getStruct(0))
  }

  /**
   * Cardinality-adaptive variant: factorization wins when each side has
   * many rows per join key (the shuffle carries one triple per key
   * instead of the wide join); over a near-unique key it loses — one
   * buffer per ~1 row is more bytes and allocation than the join it
   * avoids. When the optimizer can't know (no column stats), decide at
   * runtime from one cheap `approx_count_distinct` probe per side and
   * fall back to the plain fused aggregate over the join below
   * `minRowsPerKey`. The probe is O(scan) with a constant-size sketch —
   * cheap next to either plan, but NOT free when re-run per call over a
   * static 600M-row table (~30% of the sf100 adaptive wall-clock), so
   * the measured ratio is MEMOIZED per (canonicalized plan, key): a
   * repeat call over the same logical input (bench reps, MICE column ×
   * iteration loops, retraining sessions) skips both probe scans. The
   * key profile of a given logical plan only changes if the underlying
   * files are rewritten in place — call [[clearProbeCache]] after such a
   * rewrite, or pass `minRowsPerKey = 0` to pin the factorized path
   * probe-free (`Double.MaxValue` pins the fallback likewise).
   *
   * With no categorical columns the factorized regime runs as
   * [[cofactorOverJoinNumeric]] (same triple, plain codegen'd SUMs, no
   * ring objects). Below the threshold the row-level join fallback is
   * kept deliberately: on the fact ⋈ unique-dim shape the moments
   * decomposition measured SLOWER at every scale (sf10 local[32] 5.9 s
   * vs 3.4 s hinted-SHJ row join; sf100 local[32] 79 s vs 58.7 s row
   * SMJ — two 150M-group hash aggregations cost more than the fact-side
   * sort they avoid), so low-multiplicity inputs never route there.
   */
  def cofactorOverJoinAdaptive(left: DataFrame, right: DataFrame, key: String,
                               leftNum: Seq[String], leftCat: Seq[String],
                               rightNum: Seq[String], rightCat: Seq[String],
                               minRowsPerKey: Double = 4.0): Triple = {
    def probe(df: DataFrame): (Long, Double) = probeRowsPerKey(df, Seq(key))
    // probe the RIGHT side first: in the common fact ⋈ dim shape the
    // dimension side is per-key-unique and fails the threshold, and &&
    // short-circuits — the (usually much larger) fact side is then
    // never probe-scanned at all (measured ~2.5 s of the 40 s sf100
    // adaptive wall-clock; the probe reads one column, so it was never
    // the dominant term)
    val catsEmpty = leftCat.isEmpty && rightCat.isEmpty
    adviseBucketizeOnRepeat(left, right, key)
    // the documented probe-free pin: no scans at all, straight to the
    // factorized regime (numeric flavor when no categorical columns)
    if (minRowsPerKey <= 0.0)
      return if (catsEmpty) cofactorOverJoinNumeric(left, right, key, leftNum, rightNum)
             else cofactorOverJoin(left, right, key, leftNum, leftCat, rightNum, rightCat)
    // the documented FALLBACK pin (Double.MaxValue / +Inf): no probe
    // scans either — symmetric with the star path's pin handling
    if (minRowsPerKey == Double.MaxValue || minRowsPerKey.isPosInfinity) {
      val joined = hashJoinIfSafe(left, right, Seq(key))
      return if (catsEmpty) Graft.cofactorNumeric(joined, leftNum ++ rightNum)
             else Graft.cofactor(joined, leftNum ++ rightNum, leftCat ++ rightCat)
    }
    val (rightRows, rightRpk) = probe(right)
    if (rightRpk >= minRowsPerKey && probe(left)._2 >= minRowsPerKey) {
      // the factorized regime; with no categorical columns the numeric
      // moments decomposition computes the identical triple without ring
      // objects (plain SUMs, map-side combine) — strictly the better plan
      if (catsEmpty) cofactorOverJoinNumeric(left, right, key, leftNum, rightNum)
      else cofactorOverJoin(left, right, key, leftNum, leftCat, rightNum, rightCat)
    } else {
      // plain fused aggregate over the join, shaped to the factorized
      // block layout [leftNum ++ rightNum, leftCat ++ rightCat].
      // SHUFFLE_HASH when safe: the downstream is a single fused
      // aggregate, so the sort-merge join's two O(n log n) sorts buy
      // nothing — a hash build on whichever side the planner estimates
      // smaller skips them (sf10: 3.4 → measured below-3 s on the
      // 60M ⋈ 15M bench shape). Broadcast still wins automatically when
      // a side fits the threshold (hints don't suppress it). The hint is
      // size-guarded by hashJoinIfSafe because SHJ's build cannot spill;
      // the right side's probed EXACT row count (always available here —
      // the right probe runs first) replaces the optimizer's compressed
      // file-size estimate for it, and the left count rides along when
      // its probe ran (it may have short-circuited away)
      val joined = hashJoinIfSafe(left, right, Seq(key),
        // left was probed iff the right side passed the threshold (the
        // && above short-circuits otherwise); probe() is memoized so the
        // re-read costs nothing
        leftRows = if (rightRpk >= minRowsPerKey) Some(probe(left)._1) else None,
        rightRows = Some(rightRows))
      // no categorical columns → the triple is just plain SUMs, which
      // fuse into the join's whole-stage pipeline instead of closing it
      // at an ObjectHashAggregate boundary (Graft.cofactorNumeric)
      if (catsEmpty) Graft.cofactorNumeric(joined, leftNum ++ rightNum)
      else Graft.cofactor(joined, leftNum ++ rightNum, leftCat ++ rightCat)
    }
  }

  /**
   * Numeric-only factorized cofactor over the equi-join, expressed as
   * plain codegen'd SUM columns end to end — no ring objects anywhere.
   * The degree-2 moments of `left ⋈ right` decompose per join key k
   * (the continuous block of the ring product, mul.cpp:262-289):
   * with per-key left moments (n_k, S_i = Σx_i, P_ij = Σx_i·x_j) and
   * right moments (m_k, T_a, Q_ab), the join's contributions are
   *   count      Σ_k n_k·m_k
   *   Σ x_i      Σ_k m_k·S_i(k)        Σ y_a      Σ_k n_k·T_a(k)
   *   Σ x_i·x_j  Σ_k m_k·P_ij(k)      Σ y_a·y_b  Σ_k n_k·Q_ab(k)
   *   Σ x_i·y_a  Σ_k S_i(k)·T_a(k)
   * so the plan is: two grouped partial aggregates (map-side combine
   * collapses each side to ONE skinny row per key BEFORE its shuffle),
   * an equi-join of the aggregated sides that REUSES both children's
   * hash partitioning (no third exchange — VerifyDrive §18), and one
   * global codegen'd SUM over the per-key products. Versus
   * [[cofactorOverJoin]]'s object-triple path this stays inside
   * whole-stage codegen and Tungsten rows throughout — the object path
   * only earns its keep when categorical maps force it.
   *
   * Scope honestly measured: this wins in the MULTIPLICATIVE regime —
   * both sides many rows per key, where each grouped partial collapses
   * its side and the join is |keys|-sized. On the fact ⋈ unique-dim
   * shape it LOSES to the row-level join at every measured scale
   * (sf10 local[32]: 5.9 s vs 3.4 s hinted SHJ; sf100 local[32]: 79 s
   * vs 58.7 s SMJ — the two near-|rows|-group hash aggregations cost
   * more than the fact-side sort they avoid), which is why
   * [[cofactorOverJoinAdaptive]] routes only the factorized regime
   * here, never the low-multiplicity fallback.
   * Null semantics match [[graft.Graft.cofactorNumeric]] over the
   * materialized join: a joined row is dropped iff any numeric column
   * on either side is NULL, which decomposes into per-side filters.
   */
  def cofactorOverJoinNumeric(left: DataFrame, right: DataFrame, key: String,
                              leftNum: Seq[String], rightNum: Seq[String]): Triple = {
    val kL = leftNum.length; val kR = rightNum.length; val k = kL + kR
    def moments(df: DataFrame, num: Seq[String], p: String) = {
      val cs = num.map(c => col(c).cast("double"))
      val clean = if (num.isEmpty) df else df.where(cs.map(_.isNotNull).reduce(_ && _))
      val aggs = count(lit(1)).as(s"${p}n") +:
        (num.indices.map(i => sum(cs(i)).as(s"${p}s$i")) ++
          (for { i <- num.indices; j <- num.indices if j >= i }
            yield sum(cs(i) * cs(j)).as(s"${p}p${i}_$j")))
      clean.groupBy(col(key).as("__k")).agg(aggs.head, aggs.tail: _*)
    }
    val joined = moments(left, leftNum, "a").join(moments(right, rightNum, "b"), "__k")
    val an = col("an"); val bn = col("bn")
    val sums: Seq[Column] =
      leftNum.indices.map(i => sum(bn * col(s"as$i"))) ++
        rightNum.indices.map(a => sum(an * col(s"bs$a")))
    val prods: Seq[Column] = for { i <- 0 until k; j <- i until k } yield {
      if (j < kL) sum(bn * col(s"ap${i}_$j"))
      else if (i >= kL) sum(an * col(s"bp${i - kL}_${j - kL}"))
      else sum(col(s"as$i") * col(s"bs${j - kL}"))
    }
    val all = sum(an * bn) +: (sums ++ prods)
    val row = joined.agg(all.head, all.tail: _*).head()
    if (row.isNullAt(0)) Triple.zero(k, 0)
    else {
      def d(idx: Int): Double = if (row.isNullAt(idx)) 0.0 else row.getDouble(idx)
      Triple(row.getLong(0), Array.tabulate(k)(i => d(1 + i)),
        Array.tabulate(k * (k + 1) / 2)(i => d(1 + k + i)),
        Array.empty, Array.empty, Array.empty)
    }
  }

  /**
   * Equi-join with a SHUFFLE_HASH hint on the smaller side — but ONLY
   * when that side's projected IN-MEMORY hash build per shuffle
   * partition fits comfortably inside one task's execution memory.
   * Unlike sort-merge join, SHJ's hash build cannot spill: forcing it
   * unconditionally aborts the job with "Can't acquire … bytes memory
   * to build hash relation" the moment a build partition outgrows the
   * task's share of the execution pool (observed: 150M build rows over
   * 32 shuffle partitions at local[8]).
   *
   * Per-side build projection, best evidence first:
   *   - exact row count (the adaptive path's cardinality probe already
   *     paid for it): rows × (8B header + 8B per field + 24B
   *     LongToUnsafeRowMap page/index overhead) — the UnsafeRow layout
   *     plus the map's per-entry cost, measured within ~20% on the
   *     numeric shapes this module joins;
   *   - otherwise the optimizer's `stats.sizeInBytes`, multiplied by a
   *     measured 15× expansion: that estimate scales COMPRESSED parquet
   *     file bytes by the pruned-column ratio (~3 B/row on encoded
   *     numeric columns at sf100) while the hash build holds decoded
   *     UnsafeRows + index (~45 B/row) — trusting it raw re-creates
   *     exactly the OOM the guard exists to prevent.
   * The projection is divided by `spark.sql.shuffle.partitions` and
   * compared against `spark.graft.shj.maxBuildPartitionBytes` (default
   * 64 MB — conservative versus the ~1/(2·cores) share of the unified
   * pool a task is guaranteed, on a 1000-executor cluster as on
   * local[32]). Under the cap the hint names the smaller side as the
   * build side explicitly; broadcast still wins when a side is under
   * the broadcast threshold. Over the cap the join is NOT surrendered
   * to sort-merge immediately. First a bucketed shortcut: when both
   * sides scan tables bucketed with the same bucket count and each
   * bucket's projected build fits the cap, the hinted join is planned
   * WITHOUT any repartition and kept iff the planner inserts no
   * exchange — tables bucketized once on their join key
   * ([[graft.sources.Tables.writeBucketed]]) then join shuffle-free on
   * every subsequent run. Otherwise the per-partition build shrinks
   * with the partition count, so both sides are repartitioned by the
   * join key to ceil(build/cap) partitions (capped at 4096) —
   * co-partitioned, hint intact, every hash build cap-bounded no
   * matter the total size.
   * That bound models uniform key hashing, so the tier additionally
   * probes the build side's max key multiplicity (memoized): a hot key
   * whose build rows alone exceed the cap routes to [[saltedHashJoin]]
   * — build rows of hot keys split over salt buckets, probe rows
   * replicated — keeping every hash build cap-bounded under arbitrary
   * skew. Only degenerate cases (>4096 partitions from a broken
   * estimate, >64 hot keys, salt factor >256, multi-column keys) fall
   * back to the plain spill-capable sort-merge join.
   */
  /** Projected PEAK in-memory hash-relation size for `df` as an SHJ
    * build side: UnsafeRow payload (8 B header + 8 B per field) + ~24 B
    * map page/index overhead per row, DOUBLED for the map's
    * capacity-growth transient (the old and new index arrays coexist
    * during a grow — measured: a 150M-row build over 32 partitions
    * aborts asking for a 268 MB grant even inside a 19 GB pool).
    * Without an exact row count, the optimizer's `stats.sizeInBytes` ×
    * a measured 15× expansion (compressed pruned file bytes ≈ 3 B/row
    * vs ~45 B/row steady in-memory; see [[hashJoinIfSafe]]). */
  private def buildBytes(df: DataFrame, rows: Option[Long]): BigInt = rows match {
    case Some(n) => BigInt(n) * (8L + 8L * df.schema.size + 24L) * 2L
    case None => df.queryExecution.optimizedPlan.stats.sizeInBytes * 15L * 2L
  }

  /** Bucket count of `df`'s underlying file scan, when the plan reads
    * exactly ONE bucketed relation (projections/filters on top are
    * fine; a multi-scan plan returns None — a first-scan guess could
    * pre-qualify the wrong thing). Only PRE-qualifies the bucketed
    * co-located tier in [[hashJoinIfSafe]]; the planner's no-exchange
    * outcome is the authoritative gate. */
  private def bucketSpecOf(df: DataFrame): Option[Int] = {
    val rels = df.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l.relation
    }
    rels match {
      case Seq(h: org.apache.spark.sql.execution.datasources.HadoopFsRelation) =>
        h.bucketSpec.map(_.numBuckets)
      case _ => None
    }
  }

  private[graft] def hashJoinIfSafe(left: DataFrame, right: DataFrame,
                                    usingColumns: Seq[String],
                                    leftRows: Option[Long] = None,
                                    rightRows: Option[Long] = None,
                                    buildKeysUnique: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    val cap = spark.conf
      .get("spark.graft.shj.maxBuildPartitionBytes", (64L << 20).toString).toLong
    val confParts = math.max(1, spark.sessionState.conf.numShufflePartitions).toLong
    // the size guard divides by the partition count the build will
    // ACTUALLY run at: with AQE partition coalescing on (the default),
    // post-shuffle partitions can merge down to the cluster parallelism
    // (parallelismFirst), so dividing by a large configured count would
    // admit a build that coalescing then concentrates past the cap —
    // the non-spillable abort this guard exists to prevent. Explicit
    // repartition(n, cols) below is NOT coalesced (user-specified
    // numPartitions is respected), so only this tier needs the floor.
    val coalesceOn = spark.conf.get("spark.sql.adaptive.enabled", "true").toBoolean &&
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true").toBoolean
    val effParts =
      if (coalesceOn)
        math.min(confParts, math.max(1, spark.sparkContext.defaultParallelism).toLong)
      else confParts
    val l = buildBytes(left, leftRows)
    val r = buildBytes(right, rightRows)
    val build = l.min(r)
    if (cap > 0 && build / effParts <= cap) {
      if (l <= r) left.hint("shuffle_hash").join(right, usingColumns)
      else left.join(right.hint("shuffle_hash"), usingColumns)
    } else if (cap > 0 && build / cap + 1 <= 4096) {
      // partition-to-fit: the build does not fit a task at the session's
      // partition count, but the per-partition build SHRINKS with the
      // partition count — repartition BOTH sides by the join key to
      // ceil(build/cap) partitions (co-partitioned, so the join adds no
      // further exchange) and the hash build is cap-bounded regardless
      // of total size. This is the shape a large cluster runs anyway
      // (thousands of shuffle partitions); on local[32] it turns the
      // sf100 150M-row build from an abort into 256 bounded builds.
      //
      // SKEW: hash partitioning bounds a partition's build only under
      // roughly-uniform keys — one hot key's rows all land in one build
      // no matter the partition count, and AQE's skew splitter does NOT
      // engage here (it refuses to split user-specified repartitions,
      // and splitting a hash BUILD would be wrong anyway). So the tier
      // first probes the build side's max key multiplicity (one
      // map-side-combined count, memoized like the cardinality probes).
      // A key whose build rows alone exceed the cap vetoes plain SHJ:
      // the join runs SALTED instead — build rows of hot keys spread
      // over ceil(hotBytes/cap) salt buckets (each build stays
      // cap-bounded), probe rows of those keys replicated across the
      // buckets (each probe-build pair still meets exactly once; the
      // probe side STREAMS, so replication costs shuffle bytes, not
      // memory). Degenerate skew (R > 256 or > 64 distinct hot keys or
      // a multi-column key) surrenders to the spill-capable SMJ below.
      val parts = (build / cap + 1).toInt
      val cols = usingColumns.map(col)
      val (bDf, pDf, bFirst) = if (l <= r) (left, right, true) else (right, left, false)
      val perRow = (8L + 8L * bDf.schema.size + 24L) * 2L
      // a build side whose keys are unique BY CONSTRUCTION (a per-key
      // aggregate — the factorized side-agg shape) has max multiplicity
      // 1; skip the probe scan entirely. Otherwise the shuffle-free
      // hot-key detector answers "any key over the cap?" in one
      // map-only pass (maxCnt below is only ever COMPARED to capRows,
      // so "no hot keys" can report 1 without changing any decision);
      // the full grouped-count scan remains the fallback for key
      // shapes the detector refuses.
      val capRows = cap / perRow + 1
      val maxCnt =
        if (buildKeysUnique) 1L
        else hotKeyCounts(bDf, usingColumns, capRows) match {
          case Some(h) => if (h.isEmpty) 1L else h.head.getLong(h.head.length - 1)
          case None => maxKeyCount(bDf, usingColumns)
        }
      // BUCKETED co-located tier, tried before any repartition: when both
      // sides scan tables bucketed with the SAME bucket count and each
      // bucket's build fits the cap, the scan itself already IS the hash
      // partitioning — the repartition below would REINTRODUCE the two
      // exchanges that bucketing paid for at write time. The bucket-spec
      // check only pre-qualifies (equal counts, per-bucket build ≤ cap,
      // no hot key over the cap); the authoritative gate is Spark's own
      // planner: plan the hinted join WITHOUT repartition and accept it
      // iff EnsureRequirements inserted no exchange (this delegates the
      // bucket-column-vs-join-key match, alias tracing, and the
      // bucketing-enabled conf to the engine instead of re-deriving
      // them). This is the 100 TB repeated-join pattern: bucketize fact
      // tables once (Tables.writeBucketed), and every subsequent
      // factorized/MICE run on that key joins shuffle-free.
      val bucketed: Option[DataFrame] =
        (bucketSpecOf(left), bucketSpecOf(right)) match {
          // counts need NOT match: with
          // spark.sql.bucketing.coalesceBucketsInJoin.enabled the engine
          // coalesces the larger-bucket side onto the smaller (integer
          // ratio ≤ maxBucketRatio, stream side only for SHJ) — whether
          // a given mismatch is eligible is again the planner's call,
          // answered by the same no-exchange gate. The cap check uses
          // the SMALLER count: post-coalesce that is the real bucket
          // granularity of every hash build.
          case (Some(ln), Some(rn)) if build / math.min(ln, rn) <= cap &&
              BigInt(maxCnt) * perRow <= cap =>
            val j = if (bFirst) left.hint("shuffle_hash").join(right, usingColumns)
                    else left.join(right.hint("shuffle_hash"), usingColumns)
            // reject only SHUFFLE exchanges: a BroadcastExchange means
            // the planner chose a broadcast join, which is already
            // shuffle-free — discarding it for a forced repartition of
            // both sides would be strictly worse. With AQE on (Spark 4
            // default) the executed plan is an AdaptiveSparkPlanExec
            // LEAF whose real plan hangs off executedPlan, not children
            // — a plain exists() never sees the exchange and would
            // accept a join that actually shuffles (e.g. bucket columns
            // != join key), so strip the wrapper first.
            if (hasShuffleExchange(j.queryExecution.executedPlan)) None else Some(j)
          case _ => None
        }
      if (bucketed.isDefined) bucketed.get
      else if (BigInt(maxCnt) * perRow <= cap) {
        val lp = left.repartition(parts, cols: _*)
        val rp = right.repartition(parts, cols: _*)
        if (bFirst) lp.hint("shuffle_hash").join(rp, usingColumns)
        else lp.join(rp.hint("shuffle_hash"), usingColumns)
      } else if (usingColumns.length == 1) {
        saltedHashJoin(bDf, pDf, usingColumns.head, cap, perRow, parts, bFirst)
          .getOrElse(left.join(right, usingColumns))
      } else left.join(right, usingColumns)
    } else left.join(right, usingColumns)
  }

  /** Fixed-capacity Misra-Gries heavy-hitter summary over long keys
    * (Misra & Gries, Science of Computer Programming 1982): linear-probe
    * open-addressing long arrays — no boxing, cache-resident, O(1)
    * amortized add. When the summary is full, an arriving NEW key
    * triggers one decrement-all sweep (zeros evicted, survivors
    * compacted) and is itself dropped — the classic variant, so every
    * key's counter ≥ trueLocalCount − sweeps. Built per partition inside
    * [[hotKeyCounts]]'s pass 1; never serialized. */
  private[graft] final class MgSummary(cap: Int) {
    private val nSlots = Integer.highestOneBit(math.max(16, cap)) * 4 // ≥2× cap: load ≤ 0.5
    private val mask = nSlots - 1
    private val keys = new Array[Long](nSlots)
    private val cnts = new Array[Long](nSlots) // 0 = empty slot
    private val scratchK = new Array[Long](cap) // sweep compaction, allocated once
    private val scratchC = new Array[Long](cap)
    private var size = 0
    private var sweeps = 0L

    private def slotOf(k: Long): Int = {
      var i = (scala.util.hashing.byteswap64(k) & mask).toInt
      while (cnts(i) != 0 && keys(i) != k) i = (i + 1) & mask
      i
    }

    def add(k: Long): Unit = {
      val i = slotOf(k)
      if (cnts(i) != 0) cnts(i) += 1
      else if (size < cap) { keys(i) = k; cnts(i) = 1; size += 1 }
      else sweep() // the new key is absorbed by the global decrement
    }

    private def sweep(): Unit = {
      sweeps += 1
      // evicted zeros would break linear-probe chains, so decrement
      // into scratch and re-insert the survivors into cleared arrays
      var i = 0; var n = 0
      while (i < nSlots) {
        if (cnts(i) > 1) { scratchK(n) = keys(i); scratchC(n) = cnts(i) - 1; n += 1 }
        cnts(i) = 0
        i += 1
      }
      size = n
      i = 0
      while (i < n) {
        val j = slotOf(scratchK(i)) // all slots free: lands on an empty one
        keys(j) = scratchK(i); cnts(j) = scratchC(i)
        i += 1
      }
    }

    /** Keys whose true local count COULD reach `thr` (counter + sweeps
      * ≥ thr — sound because counter ≥ true − sweeps), or null when the
      * summary cannot certify: sweeps ≥ thr means a hot key may have
      * been decremented out entirely, and > maxOut qualifying keys
      * means the exact pass would cost like the grouped scan. */
    def candidateArray(thr: Long, maxOut: Int): Array[Long] = {
      if (sweeps >= thr) return null
      val out = Array.newBuilder[Long]
      var emitted = 0
      var i = 0
      while (i < nSlots) {
        if (cnts(i) != 0 && cnts(i) + sweeps >= thr) {
          emitted += 1
          if (emitted > maxOut) return null
          out += keys(i)
        }
        i += 1
      }
      out.result()
    }
  }

  /** True when the physical plan contains a shuffle exchange, looking
    * THROUGH AdaptiveSparkPlanExec — under AQE the adaptive node is a
    * LeafExecNode whose real plan hangs off `executedPlan` (before the
    * first stage runs, that is the EnsureRequirements-inserted initial
    * plan, exactly what the bucketed tier's no-exchange gate must
    * inspect). Plain `plan.exists` never traverses into it. */
  private[graft] def hasShuffleExchange(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      hasShuffleExchange(a.executedPlan)
    case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
    case other => other.children.exists(hasShuffleExchange)
  }

  /** The 65 largest build-side key groups as (key cols…, count) rows,
    * count descending: one map-side-combined grouped count + TakeOrdered,
    * memoized with the same snapshot-fingerprint discipline as the
    * cardinality probes. Feeds BOTH the SHJ hot-key veto (head = max
    * multiplicity) and [[saltedHashJoin]]'s hot-key set, so skew
    * detection and salting pay for one scan between them. 65 because the
    * salted tier surrenders past 64 hot keys — a 65th qualifying entry
    * already proves degeneracy. */
  private def topKeyCounts(df: DataFrame, keyCols: Seq[String]): Array[Row] = {
    val ck = (df.queryExecution.analyzed.canonicalized,
      "topk:" + keyCols.mkString("\u0001"), snapshotFingerprint(df))
    val cached = topKeyCache.get(ck)
    if (cached != null) cached
    else {
      // aliased count: a user key column literally named "count" would
      // make the bare groupBy(...).count() output ambiguous to order by.
      // NULL keys are excluded to match hotKeyCounts (both feed inner
      // equi-join build decisions, where NULL build keys never match a
      // probe row) — without the filter a NULL-dominated build side
      // would veto the SHJ only when the detector refused, making the
      // routing depend on which probe happened to answer.
      val rows = df.filter(keyCols.map(c => col(c).isNotNull).reduce(_ && _))
        .groupBy(keyCols.map(col): _*)
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("__graft_cnt"))
        .orderBy(col("__graft_cnt").desc).limit(65).collect()
      topKeyCache.put(ck, rows)
      rows
    }
  }

  /** Max rows under a single join-key value (the build-side hot-key
    * probe); derived from [[topKeyCounts]]'s memoized scan. */
  private def maxKeyCount(df: DataFrame, keyCols: Seq[String]): Long = {
    val top = topKeyCounts(df, keyCols)
    if (top.isEmpty) 0L else top.head.getLong(top.head.length - 1)
  }

  /** Sentinel memo value for a POST-SCAN detector refusal — an empty
    * array is a valid "no hot keys" result, so refusals need their own
    * identity (compared with `eq`). */
  private val DetectorRefused: Array[Row] = Array[Row](null)

  /** EXACT counts of the join keys whose row count reaches `capRows`
    * (count-descending, ≤65 rows of (key, count)), without the full
    * grouped-count shuffle [[topKeyCounts]] pays — at sf100 that scan
    * is ~15 s over 150M near-unique keys, ~30% of a cold adaptive
    * call, all spent proving the usual answer "no hot keys".
    *
    * Pass 1 is shuffle-FREE: per-partition open-coded counting over the
    * scan's own InternalRows. A key with C total rows has ≥ ⌈C/P⌉ rows
    * in at least one of its ≤P partitions, so every key with
    * C ≥ capRows exceeds the local threshold capRows/P somewhere —
    * emitting per-partition keys at ≥ capRows/P can miss no hot key
    * (false candidates are fine). Pass 2 exact-counts ONLY the
    * candidates (usually none → no second scan at all).
    *
    * Returns None — caller takes the grouped-scan route — for
    * multi-column or non-integral keys, or when the detector output
    * degenerates (tiny capRows → everything is a candidate). Memoized
    * with the same (plan, key, fingerprint) discipline as the probes;
    * capRows is folded into the key since the cap is configurable. */
  private[graft] def hotKeyCounts(df: DataFrame, keyCols: Seq[String],
                                  capRows: Long): Option[Array[Row]] = {
    if (keyCols.length != 1 || capRows <= 0) return None
    val key = keyCols.head
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val integral = df.schema.find(f => resolver(f.name, key)).exists(_.dataType match {
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    })
    if (!integral) return None
    val ck = (df.queryExecution.analyzed.canonicalized,
      s"hot:$key:$capRows", snapshotFingerprint(df))
    val cached = topKeyCache.get(ck)
    if (cached != null)
      return if (cached eq DetectorRefused) None else Some(cached)
    val proj = df.select(col(key).cast("long").as("__graft_k"))
    val rdd = proj.queryExecution.toRdd
    val p = math.max(1, rdd.getNumPartitions)
    val thrLocal = math.max(1L, capRows / p)
    val perPart = rdd.mapPartitions { it =>
      // fixed-capacity Misra-Gries heavy-hitter summary, not a full
      // per-partition count map: over a near-unique key column the full
      // map holds ~|partition| entries and its hashing/boxing costs as
      // much as the grouped-count scan this detector replaces (measured
      // sf100: 8.4 s vs 11.9 s — no win). MG keeps ≤8192 counters in
      // two cache-resident long arrays: a key with true local count c
      // survives with counter ≥ c − D (D = global decrement sweeps ≤
      // rows/8192), so counter + D ≥ thrLocal can miss NO locally-hot
      // key; false candidates are exact-counted away in pass 2. A
      // partition where D reaches thrLocal (or a sea of qualifying
      // keys) cannot certify anything and reports None — the caller
      // then takes the grouped-scan route.
      val m = new MgSummary(8192)
      it.foreach { r =>
        if (!r.isNullAt(0)) m.add(r.getLong(0)) // null keys never reach an equi-join build
      }
      Iterator.single(m.candidateArray(thrLocal, maxOut = 1024))
    }.collect()
    // post-scan refusals are MEMOIZED (sentinel entry): the salted tier
    // re-asks right after the cap veto, and re-paying the full pass-1
    // scan just to refuse again would double-scan exactly the large
    // skewed inputs this path exists for
    def refuse(): Option[Array[Row]] = { topKeyCache.put(ck, DetectorRefused); None }
    if (perPart.exists(_ == null)) return refuse()
    val candidates = perPart.flatMap(a => a: Array[Long]).distinct
    // degenerate detector (capRows ≲ P, or a sea of locally-hot keys):
    // the exact pass would cost like the grouped scan — surrender to it
    if (candidates.length > 1024) return refuse()
    val exact: Array[Row] =
      if (candidates.isEmpty) Array.empty
      else df.filter(col(key).isin(candidates.map(Long.box).toSeq: _*))
        .groupBy(col(key)).agg(count(lit(1)).as("__graft_cnt"))
        .filter(col("__graft_cnt") >= capRows)
        .orderBy(col("__graft_cnt").desc).limit(65).collect()
    topKeyCache.put(ck, exact)
    Some(exact)
  }

  /** Skew-salted shuffled-hash join for a single-column equi-join whose
    * BUILD side has hot keys too large for one cap-bounded hash build.
    * Hot keys (per-key build bytes > cap) get their build rows salted
    * over R buckets and their probe rows replicated to all R; everything
    * else keeps salt 0. Join on (key, salt) — co-partitioned to
    * `parts`, hint on the build side. Returns None when the skew is
    * degenerate (too many hot keys / too large R) and the caller should
    * take the spill-capable SMJ. */
  private def saltedHashJoin(bDf: DataFrame, pDf: DataFrame, key: String,
                             cap: Long, perRow: Long, parts: Int,
                             buildIsLeft: Boolean): Option[DataFrame] = {
    // the salt columns are internal: an input that already carries them
    // (e.g. an upstream salting stage's output) would be silently
    // overwritten and then dropped — surrender to the spill-capable SMJ
    if (Seq(bDf, pDf).exists(d => d.columns.contains("__salt") || d.columns.contains("__salts")))
      return None
    // hot set from the same memoized detector scan the SHJ veto used
    // (count ≥ cap/perRow + 1 ⇔ count·perRow > cap, exactly); the
    // grouped top-65 scan is the fallback for detector-refused key
    // shapes. Count-descending order makes the qualifying set a
    // prefix, so a full 65-entry result proves >64 hot keys
    val hot: Array[Row] = hotKeyCounts(bDf, Seq(key), cap / perRow + 1)
      .getOrElse(topKeyCounts(bDf, Seq(key))
        .filter(r => BigInt(r.getLong(1)) * perRow > cap))
    if (hot.length > 64) return None
    // an empty hot set means this call's detector answer diverged from
    // the one that vetoed plain SHJ (possible across a cache eviction or
    // snapshot change with the data rewritten in between) — there is
    // nothing to salt, so surrender to the spill-capable SMJ rather than
    // crash on max() of an empty set
    if (hot.isEmpty) return None
    val maxCnt = hot.map(_.getLong(1)).max
    val rFactor = (BigInt(maxCnt) * perRow / cap + 1).toInt
    if (rFactor > 256) return None
    val hotKeys = hot.map(_.get(0))
    val isHot = col(key).isin(hotKeys: _*)
    // build: content-derived salt — xxhash64 over the full row, mod R.
    // Retry-DETERMINISTIC: a recomputed map task assigns every row the
    // same salt as the original attempt, so a shuffle fetch failure
    // retries per-task instead of forcing the whole-stage rerun Spark
    // imposes on indeterminate stages (monotonically_increasing_id
    // would re-deal salts on recompute and silently drop/duplicate
    // pairs if Spark did NOT rerun the stage). Byte-identical duplicate
    // rows concentrate in one bucket — interchangeable rows, so the
    // join result is unchanged; only the spread degrades, bounded by
    // the duplicate multiplicity.
    val bS = bDf.withColumn("__salt",
      when(isHot, pmod(xxhash64(bDf.columns.map(col): _*), lit(rFactor.toLong)).cast("int"))
        .otherwise(lit(0)))
    // probe: hot-key rows fan out to every salt bucket
    val pS = pDf
      .withColumn("__salts", when(isHot, sequence(lit(0), lit(rFactor - 1))).otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salts"))).drop("__salts")
    val keys = Seq(key, "__salt")
    val kc = keys.map(col)
    val bp = bS.repartition(parts, kc: _*).hint("shuffle_hash")
    val pp = pS.repartition(parts, kc: _*)
    val joined = if (buildIsLeft) bp.join(pp, keys) else pp.join(bp, keys)
    Some(joined.drop("__salt"))
  }

  /** Memoized probe results — (exact row count, rows-per-key) — for
    * [[cofactorOverJoinAdaptive]] and the SHJ size guard,
    * keyed by (canonicalized analyzed plan, key column). Canonicalized
    * plans normalize expression ids, so two reads of the same files with
    * the same projection hit the same entry regardless of session or
    * DataFrame identity. Access-order LRU — the cap is a leak bound (a
    * retraining service probing thousands of distinct inputs), not a
    * working-set size. */
  private val probeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
      (Long, Double)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
            (Long, Double)]): Boolean = size() > 256
    })

  /** Same discipline for [[topKeyCounts]]'s top-65 (key, count) rows —
    * a separate map only because the value shape differs; each entry is
    * ≤65 rows, so the 256-entry bound also bounds memory. */
  private val topKeyCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
      Array[Row]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
            Array[Row]]): Boolean = size() > 256
    })

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Repeat-call counter behind [[adviseBucketizeOnRepeat]]; the
    * 256-entry LRU is the usual leak bound. */
  private val repeatJoinCounts = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), Integer](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String), Integer]): Boolean =
        size() > 256
    })

  /** One-line advisory for the 100 TB repeated-join pattern. The
    * raw-parquet adaptive join sits AT the platform's bare-join floor
    * (FactProfile sf100: bare hinted-SHJ/SMJ 23–25 s vs 22.8 s for the
    * whole operator — the decision overhead is ~6%); that floor is the
    * cost of shuffling both raw sides and cannot be coded away. The
    * same operator over bucketed tables runs ~5× faster (sf100 4.4 s,
    * zero exchanges), paying one bucketed write that amortizes over
    * every subsequent run. So on the SECOND adaptive call over the
    * same un-bucketed logical inputs and key — the retraining / MICE
    * column-loop / scheduled-job pattern, exactly where bucketize-once
    * amortizes — log the recommendation once. */
  private def adviseBucketizeOnRepeat(left: DataFrame, right: DataFrame, key: String): Unit = {
    if (bucketSpecOf(left).nonEmpty && bucketSpecOf(right).nonEmpty) return
    val ck = (left.queryExecution.analyzed.canonicalized,
      right.queryExecution.analyzed.canonicalized, key)
    val n = Option(repeatJoinCounts.get(ck)).fold(1)(_.intValue + 1)
    repeatJoinCounts.put(ck, n)
    if (n == 2)
      log.warn(s"cofactorOverJoinAdaptive: repeat run over the same UN-BUCKETED inputs on key '$key'" +
        " — this plan re-shuffles both sides on every call and sits at the bare-join floor at scale." +
        " Bucketize both tables once on the join key (graft.sources.Tables.writeBucketed /" +
        " attachOrWriteBucketed) and subsequent runs take the zero-exchange co-located tier" +
        " (~5x measured at sf100; see BENCH_CONTEXT 'raw adaptive floor').")
  }

  /** Per-key shape from [[probeGroupedShape]]: `width` is the exact max
    * packable UTF-8 byte width for a string key (Int.MaxValue when the
    * key is all-NULL or a value embeds a NUL byte; -1 for numeric
    * keys), `lo`/`hi` the exact value range for a numeric key (0/-1,
    * i.e. an empty range, when the key is all-NULL; 0/0 placeholders
    * for string keys) — the range decides how many bytes a numeric
    * sub-key needs inside the packed multi-key label. */
  final case class KeyShape(width: Int, lo: Long, hi: Long)

  /** [[probeGroupedShape]]'s memo — (rows, combined key cardinality,
    * per-key shape, per-cat-column cardinality, null-row upper bound).
    * Values are a few dozen bytes; the 256-entry bound is the same leak
    * bound as the other caches. */
  private val shapeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
      (Long, Long, Seq[KeyShape], Seq[Long], Long)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
            (Long, Long, Seq[KeyShape], Seq[Long], Long)]): Boolean = size() > 256
    })

  /** Grouped-route shape probe (`Graft.cofactorGrouped`'s gate), ONE
    * fixed-memory scan computing everything the byte-based group cap
    * needs: row count, approx distinct group keys, the exact max
    * PACKABLE key byte width (string keys only; -1 otherwise — decides
    * [[graft.agg.ColumnarCofactor.CatShortString]] eligibility without
    * risking its mid-job fail-loud throw; Int.MaxValue when the key is
    * all-NULL or any value embeds a NUL byte, the one shape base-256
    * packing cannot keep injective), and approx distinct count per
    * categorical column (bounds each per-group cat map). Memoized with
    * the same (plan, tag, file fingerprint) discipline as the other
    * probes. */
  private[graft] def probeGroupedShape(df: DataFrame, keys: Seq[String], cats: Seq[String],
                                       keyIsString: Seq[Boolean],
                                       nullCols: Seq[String] = Seq()): (Long, Long, Seq[KeyShape], Seq[Long], Long) = {
    val ck = (df.queryExecution.analyzed.canonicalized,
      "gshape:" + (keys ++ cats).mkString("\u0001") + ":" + keyIsString.mkString(",") +
        ":" + nullCols.mkString("\u0001"),
      snapshotFingerprint(df))
    val cached = shapeCache.get(ck)
    if (cached != null) cached
    else {
      // combined cardinality over ALL keys (one group per distinct
      // tuple); per-key shape: exact max packable byte width + embedded
      // NUL probe for strings, exact value range for numerics (decides
      // the byte budget of each sub-key inside a packed multi-key label)
      val keyCardCol =
        if (keys.size == 1) approx_count_distinct(col(keys.head))
        else approx_count_distinct(struct(keys.map(col): _*))
      val aggs = Seq(count(lit(1)).as("__graft_n"), keyCardCol.as("__graft_k")) ++
        keys.zip(keyIsString).flatMap { case (k, isStr) =>
          if (isStr)
            Seq(max(octet_length(col(k))),
              // locate is 0 when absent, so max > 0 = some value embeds
              // a NUL byte — the one shape base-256 packing cannot keep
              // injective ('A' vs "<NUL>A"); reported as unpackable
              max(locate(0.toChar.toString, col(k))))
          else Seq(min(col(k)).cast("long"), max(col(k)).cast("long"))
        } ++
        cats.map(c => approx_count_distinct(col(c))) ++
        // count(col) < count(*) iff the column holds a NULL: callers
        // with keep-every-row semantics (the SQL grouped-kernel
        // strategy, where a NULL group and null-skipped rows must match
        // the default aggregate exactly) size the side-channel from this
        nullCols.map(c => count(col(c)))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val rows = r.getLong(0)
      val shapes = keys.indices.map { i =>
        val base = 2 + 2 * i
        if (keyIsString(i)) {
          val w = if (r.isNullAt(base) || r.getInt(base + 1) > 0) Int.MaxValue
                  else r.getInt(base)
          KeyShape(w, 0L, 0L)
        } else if (r.isNullAt(base)) KeyShape(-1, 0L, -1L) // all-NULL: empty range
        else KeyShape(-1, r.getLong(base), r.getLong(base + 1))
      }.toVector
      val catBase = 2 + 2 * keys.size
      val nullBase = catBase + cats.size
      // upper bound on rows carrying any NULL (a row with several NULL
      // columns is counted once per column — still a sound bound for
      // the side-channel fraction gate)
      val nullUB = nullCols.indices.map(i => rows - r.getLong(nullBase + i)).sum
      val v = (rows, r.getLong(1), shapes,
        cats.indices.map(i => r.getLong(catBase + i)).toVector, nullUB)
      shapeCache.put(ck, v)
      v
    }
  }

  /** Cheap file-snapshot fingerprint folded into the probe-memo key:
    * canonicalized plans compare by rootPaths, so a table rewritten or
    * appended IN PLACE would otherwise silently replay a stale row
    * count — which [[hashJoinIfSafe]] then trusts for the non-spillable
    * SHJ build guard, re-admitting exactly the abort the guard exists
    * to prevent. Folding (file count, total bytes) per file-source leaf
    * invalidates the memo on any rewrite that changes bytes on disk
    * without scanning anything (driver-side listing metadata only). A
    * same-size same-count in-place rewrite can still alias — that needs
    * the documented [[clearProbeCache]]. */
  private[graft] def snapshotFingerprint(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    df.queryExecution.analyzed.collectLeaves().foldLeft(17L) {
      case (h, LogicalRelation(fs: HadoopFsRelation, _, _, _, _)) =>
        ((h * 31 + fs.location.inputFiles.length) * 31) + fs.sizeInBytes
      case (h, other) => h * 31 + other.getClass.getName.hashCode
    }
  }

  /** Drop memoized key-profile probes. Appends/rewrites that change
    * file count or total bytes invalidate automatically (see
    * [[snapshotFingerprint]]); call this after a byte-identical-size
    * in-place rewrite, the one case the fingerprint can alias. */
  /** Keyless null probe for the FLAT moments SQL route: (total rows,
    * null-bearing-row upper bound = sum of per-column null counts) over
    * `cols`. ONE fixed-memory scan, memoized with the same
    * (plan, cols, file-snapshot) discipline as [[probeGroupedShape]]. */
  private val nullProbeCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
      (Long, Long)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
            (Long, Long)]): Boolean = size() > 256
    })
  private[graft] def probeNullCount(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val ck = (df.queryExecution.analyzed.canonicalized,
      "nullprobe:" + cols.mkString("\u0001"), snapshotFingerprint(df))
    val cached = nullProbeCache.get(ck)
    if (cached != null) cached
    else {
      val aggs = count(lit(1)) +: cols.map(c => count(col(c)))
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val rows = r.getLong(0)
      val nullUB = cols.indices.map(i => rows - r.getLong(1 + i)).sum
      val v = (rows, nullUB)
      nullProbeCache.put(ck, v)
      v
    }
  }

  def clearProbeCache(): Unit =
    { probeCache.clear(); topKeyCache.clear(); shapeCache.clear(); nullProbeCache.clear()
      graft.mice.MiceJoin.clearUniqueKeyCache() }

  private[graft] def probeCacheSize: Int = probeCache.size()

  /** Routing the last multi-dim [[cofactorOverStar]] call on this
    * thread chose — (aggregated dim keys, row-folded dim keys). The
    * chain is driver-side, so there is no single query plan to assert
    * a route on; oracle rows (q69) and specs certify the ADAPTIVE
    * probe's decision through this instead. Thread-local: parallel
    * suites and concurrent sessions don't race. */
  private val lastStarRoutingTL =
    new ThreadLocal[(Seq[String], Seq[String])] {
      override def initialValue(): (Seq[String], Seq[String]) = (Seq(), Seq())
    }
  def lastStarRouting(): (Seq[String], Seq[String]) = lastStarRoutingTL.get()

  /** One dimension table of a star join: `df` must carry the join key
    * under the SAME name `key` as the fact table (rename before
    * constructing), projected to (key, num…, cat…). Feature names must
    * be disjoint from the fact's and from every other dim's. */
  final case class StarDim(df: DataFrame, key: String,
                           num: Seq[String] = Seq(), cat: Seq[String] = Seq())

  /**
   * Cofactor of the multi-dimension STAR join
   * `fact ⋈_{k1} dim1 ⋈_{k2} dim2 ⋈ …` without materializing it — the
   * reference paper's Flight/Retailer workload shape
   * (factorized_imputation_flight.h:6-8, factorized_imputation_retailer.h:6-8:
   * one fact table joining several dimension tables on distinct keys),
   * computed by CHAINED ring products:
   *
   *   triple(F ⋈ D1 ⋈ … ⋈ Dn)
   *     = Σ over fact key-combos  [ triple_F(k1…kn) × triple_D1(k1) × … ]
   *
   * Plan shape: each dim collapses to ONE triple per key (dim-sized
   * grouped aggregate), the fact collapses to one triple per DISTINCT
   * key COMBINATION, and the joins chain over those pre-aggregates —
   * the wide star join never exists. Each join is size-guarded
   * [[hashJoinIfSafe]]; an aggregated dim under the broadcast threshold
   * broadcasts automatically, so the fact-side aggregate typically
   * never re-shuffles after its own grouping. Layout follows the ring
   * product's block rule applied left to right:
   * `[factNum ++ dim1.num ++ … , factCat ++ dim1.cat ++ …]`.
   *
   * Inner-join semantics throughout (a fact row whose key misses a dim
   * drops), and the ring lift's null rule per side (a row with a NULL
   * numeric feature contributes nothing), exactly as the fused
   * aggregate over the materialized star join would behave —
   * `MlSpec`/`VerifyDrive` pin the parity on real tables.
   *
   * Adaptivity ([[cofactorOverJoinAdaptive]]'s probe, generalized to
   * MIXED routing): each dim is judged separately from one memoized
   * `approx_count_distinct` probe. A MULTIPLICATIVE dim (rows-per-key ≥
   * `minRowsPerKey`) must be aggregated — materializing it fans the
   * join out by its multiplicity, |fact|·Π multiplicities rows at the
   * extreme. A NEAR-UNIQUE dim is folded into the fact row-level
   * instead (size-guarded join): aggregating it would both pay one
   * ring buffer per ~1 row (the measured pessimization) and drag its
   * key into the fact grouping's composite, pushing that grouping
   * toward one group per fact row. The chain then groups the fact by
   * ONLY the aggregated dims' keys — inner joins commute, so the
   * triple is identical in every routing (the block order is permuted
   * back to the declared layout when the split reorders dims). With no
   * multiplicative dim at all the materialized star join with the
   * fused (codegen'd-numeric when possible) cofactor is strictly
   * cheaper. `minRowsPerKey = 0` pins every dim aggregated (the fully
   * factorized chain, probe-free); `Double.MaxValue` pins the
   * materialized fallback.
   */
  def cofactorOverStar(fact: DataFrame, factNum: Seq[String], factCat: Seq[String],
                       dims: Seq[StarDim], minRowsPerKey: Double = 4.0): Triple = {
    val spark = fact.sparkSession
    Graft.register(spark)
    val numAll = factNum ++ dims.flatMap(_.num)
    val catAll = factCat ++ dims.flatMap(_.cat)
    if (dims.isEmpty)
      return if (catAll.isEmpty) Graft.cofactorNumeric(fact, numAll)
             else Graft.cofactor(fact, numAll, catAll)
    // validate BEFORE the 1-dim delegation: a duplicate feature name
    // would otherwise only crash on the probe-chosen fallback route
    // (ambiguous column over the joined frame) — data-dependent failure
    require(numAll.distinct.length == numAll.length &&
      catAll.distinct.length == catAll.length,
      "star feature names must be pairwise distinct across fact and dims")
    if (dims.length == 1)
      return cofactorOverJoinAdaptive(fact, dims.head.df, dims.head.key,
        factNum, factCat, dims.head.num, dims.head.cat, minRowsPerKey)
    val keys = dims.map(_.key)
    require(keys.distinct.length == keys.length,
      s"star dims must join on distinct fact keys, got $keys")

    def rowsPerKey(df: DataFrame, keyCols: Seq[String]): (Long, Double) =
      probeRowsPerKey(df, keyCols)
    // MIXED routing: each dim is judged separately. A multiplicative dim
    // must be AGGREGATED (materializing it fans the join out by its
    // multiplicity); a near-unique dim should be FOLDED into the fact
    // row-level (aggregating it is the measured per-~1-row-buffer
    // pessimization, and worse, its key would join the fact's grouping
    // composite — pushing the fact grouping toward one group per row).
    // The chain then groups the fact by ONLY the aggregated dims' keys.
    // minRowsPerKey = 0 pins EVERY dim aggregated (the fully-factorized
    // chain, deterministic for oracle rows); Double.MaxValue pins the
    // fully-materialized fallback.
    val (aggDims, rowDims) =
      if (minRowsPerKey <= 0.0) (dims, Seq.empty[StarDim])
      else if (minRowsPerKey == Double.MaxValue) (Seq.empty[StarDim], dims)
      else dims.partition(d => rowsPerKey(d.df, Seq(d.key))._2 >= minRowsPerKey)
    lastStarRoutingTL.set((aggDims.map(_.key), rowDims.map(_.key)))

    if (aggDims.nonEmpty) {
      // fold near-unique dims into the fact first (their features become
      // fact features; inner joins commute, so the triple is identical),
      // then chain over the aggregated dims with the fact grouped by
      // ONLY their keys — the mixed-star plan
      val fact2 = rowDims.foldLeft(fact)((acc, d) => hashJoinIfSafe(acc, d.df, Seq(d.key)))
      val fNum = factNum ++ rowDims.flatMap(_.num)
      val fCat = factCat ++ rowDims.flatMap(_.cat)
      val groupKeys = aggDims.map(_.key)
      val factCols = fNum.map(c => col(c).cast("double")) ++
        fCat.map(c => col(c).cast("int"))
      var cur = fact2.groupBy(groupKeys.map(col): _*)
        .agg(Graft.sumTriple(factCols: _*).as("__T"))
      for (d <- aggDims) {
        val dimCols = d.num.map(c => col(c).cast("double")) ++
          d.cat.map(c => col(c).cast("int"))
        val dagg = d.df.groupBy(col(d.key)).agg(Graft.sumTriple(dimCols: _*).as("__D"))
        // (dagg is unique-keyed, but `cur` — grouped by ALL agg-dim keys —
        // is not unique on d.key alone and may be chosen as the build
        // side, so the buildKeysUnique shortcut does not apply here)
        cur = hashJoinIfSafe(cur, dagg, Seq(d.key))
          .withColumn("__T", Graft.multiplyTriple(col("__T"), col("__D")))
          .drop("__D")
      }
      val row = cur.select(Graft.sumTripleOf(col("__T")).as("t")).head()
      val t = if (row.isNullAt(0))
        Triple.zero(numAll.length, catAll.length)
      else Graft.tripleFromRow(row.getStruct(0))
      // the fold changed the block order to [factNum ++ rowDimNums ++
      // aggDimNums, …] — permute back to the declared [factNum ++
      // dims-in-order] layout when the routing split reordered dims
      val declaredNum = numAll
      val builtNum = fNum ++ aggDims.flatMap(_.num)
      val declaredCat = catAll
      val builtCat = fCat ++ aggDims.flatMap(_.cat)
      if (builtNum == declaredNum && builtCat == declaredCat) t
      else Triple.permute(t,
        declaredNum.map(builtNum.indexOf).toArray,
        declaredCat.map(builtCat.indexOf).toArray)
    } else {
      // every side near-unique: materialize the star row-level (each
      // join size-guarded; dims under the broadcast threshold broadcast)
      // and fuse one cofactor over it — codegen'd SUMs when no cats
      val joined = dims.foldLeft(fact)((acc, d) => hashJoinIfSafe(acc, d.df, Seq(d.key)))
      if (catAll.isEmpty) Graft.cofactorNumeric(joined, numAll)
      else Graft.cofactor(joined, numAll, catAll)
    }
  }

  /** Memoized (rows, rows-per-key) probe shared by the adaptive
    * single-join and star paths; composite keys probe
    * `approx_count_distinct(struct(keys))`. */
  private[graft] def probeRowsPerKey(df: DataFrame, keyCols: Seq[String]): (Long, Double) = {
    val ck = (df.queryExecution.analyzed.canonicalized,
      "rpk:" + keyCols.mkString("\u0001"), snapshotFingerprint(df))
    val cached = probeCache.get(ck)
    if (cached != null) cached
    else {
      val kc = if (keyCols.length == 1) col(keyCols.head)
               else struct(keyCols.map(col): _*)
      val r = df.agg(count(lit(1)).as("n"), approx_count_distinct(kc).as("k")).head()
      val v = (r.getLong(0), r.getLong(0).toDouble / math.max(1L, r.getLong(1)).toDouble)
      probeCache.put(ck, v)
      v
    }
  }

  /** Train linear regression over the (never materialized) star join.
    * `label` indexes `factNum ++ dims.flatMap(_.num)`. */
  def linRegOverStar(fact: DataFrame, factNum: Seq[String], factCat: Seq[String],
                     dims: Seq[StarDim], label: Int, lambda: Double = 0.0,
                     normalize: Boolean = false): LinReg.Model = {
    val t = cofactorOverStar(fact, factNum, factCat, dims)
    LinReg.train(t, label, lambda, normalize)
  }

  /** Train linear regression over the (never materialized) join. */
  def linRegOverJoin(left: DataFrame, right: DataFrame, key: String,
                     leftNum: Seq[String], leftCat: Seq[String],
                     rightNum: Seq[String], rightCat: Seq[String],
                     label: Int, lambda: Double = 0.0): LinReg.Model = {
    val t = cofactorOverJoin(left, right, key, leftNum, leftCat, rightNum, rightCat)
    LinReg.train(t, label, lambda)
  }

  /** Train LDA over the join; `label` indexes the combined categorical
    * list `leftCat ++ rightCat`. */
  def ldaOverJoin(left: DataFrame, right: DataFrame, key: String,
                  leftNum: Seq[String], leftCat: Seq[String],
                  rightNum: Seq[String], rightCat: Seq[String],
                  label: Int, shrinkage: Double = 0.0): Lda.Model = {
    val t = cofactorOverJoin(left, right, key, leftNum, leftCat, rightNum, rightCat)
    Lda.train(t, label, shrinkage)
  }
}
