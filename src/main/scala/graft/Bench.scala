package graft

import graft.ml.LinReg
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Headline benchmark (driver-run per round): cofactor aggregation
  * throughput is the primary engine metric (BASELINE.md), plus the
  * factorized join, model train+impute scan, and a MICE round. Results
  * are one JSON line; work is forced with the noop sink so timings
  * include the full plan but no driver materialization.
  *
  * INSTRUMENT ISOLATION (round-15 rebuild): three consecutive rounds of
  * end-of-round artifacts needed manual forensics — contention and
  * working-set interference between tiers inside one long-lived JVM
  * kept inflating rows that were clean in isolation (r12 drift, r13
  * asof +801%, r14 the bucketed row +345% — certified cold-page-cache,
  * tools/FactBucketedCheck). The bench now runs each tier (main / sf1 /
  * sf10 / sf100) in a FRESH forked JVM, so no tier's checkpoint blocks,
  * storage pools, or JIT state can leak into another, and any row that
  * lands >tolerance over the committed baseline is automatically
  * re-timed in an isolated JVM before the artifact is written
  * (`recertified` in the JSON) — ALL flagged rows, batched one fork
  * per tier, so no row is ever left unverified by a cap. Modes,
  * selected by env:
  *   - parent (default): forks one child per existing tier, merges
  *     fragments, drift-scans, recertifies, writes the one-line JSON.
  *   - SPARK_GRAFT_BENCH_TIER=<main|sf1|sf10|sf100>: child — run ONE
  *     tier in this JVM, write a TSV fragment to SPARK_GRAFT_BENCH_FRAG.
  *   - SPARK_GRAFT_BENCH_ONLY=<row>[,<row>…]: child, restricted to the
  *     listed rows (the recertify probe; tier setup still runs, timing
  *     is fresh).
  *   - SPARK_GRAFT_BENCH_FORK=0: legacy single-JVM run of all tiers
  *     (the fallback when forking is unavailable). */
object Bench {

  // ------------------------------------------------------------ env config
  private def sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
  private def sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/testdata-sf1")
  private def sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/root/repo/testdata-sf10")
  private def sf100Dir = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/root/repo/testdata-sf100")
  private def tierExists(dir: String): Boolean =
    new java.io.File(dir + "/lineitem.parquet").exists()

  private val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
  // FULL mode restores the long-horizon rows (multi-round MICE chains,
  // the bare-join adaptive floor) that round 17 proved cannot fit the
  // driver's per-round time budget alongside everything else — they
  // are measured out-of-band (BENCH_CONTEXT.md) instead of in the
  // driver artifact. rc=124 with no parseable JSON is worse than a
  // smaller suite that lands.
  private val benchFull = sys.env.get("SPARK_GRAFT_BENCH_FULL").contains("1")
  // Global wall-clock budget (seconds): recertify forks and extra
  // convergence passes are trimmed once exceeded, so the round's
  // artifact always lands inside the driver's timeout. 2000 s leaves
  // headroom under the driver cap for the ALWAYS-ON suite; a FULL run
  // measured 2617 s at r18 — under the old shared default it always
  // crossed the budget mid-suite and silently degraded recertify to
  // worst-2 per tier (r19 advice), so FULL mode gets its own 3600 s
  // default and finishes its recertify passes (FULL runs are builder-
  // side, not under the driver's timeout).
  private val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET").map(_.toLong)
    .getOrElse(if (benchFull) 3600L else 2000L)
  // worst-K drifted rows recertified per tier (ONE batched fork per
  // tier, so K only adds row passes, not JVM/setup cost)
  private val recertK = sys.env.getOrElse("SPARK_GRAFT_BENCH_RECERT_K", "4").toInt
  private val startedAt = System.nanoTime()
  private def elapsedSec: Long = (System.nanoTime() - startedAt) / 1000000000L
  private val maxReps = math.max(reps, sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXREPS", "5").toInt)
  // 2 warmups: the first pays JIT/codegen, the second absorbs
  // ContextCleaner churn from the first (mice's localCheckpoints made
  // the first TIMED pass a 4-5× outlier with a single warmup)
  private val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "2").toInt
  private val tolerance = sys.env.getOrElse("SPARK_GRAFT_BENCH_TOL", "0.20").toDouble
  private val absFloor = sys.env.getOrElse("SPARK_GRAFT_BENCH_ABS", "0.30").toDouble

  private def makeSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // serialized checkpoint blocks (Graft.checkpoint) LZ4-compress on
      // heap and disk with this on — the sf100 MICE working set shrinks
      // several-fold, keeping two 600M-row generations inside scratch
      .config("spark.rdd.compress", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // ObjectHashAggregate (the TypedImperativeAggregate exec) falls back
      // to sort-based aggregation after 128 distinct keys by default —
      // deadly for grouped cofactors over 100k+ keys (every subsequent row
      // round-trips a serialized buffer through the external sorter).
      // Cofactor buffers are small; keep them in the hash map.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Graft.register(spark)
    // the SQL-surface kernel routes (grouped/flat cofactor + moments):
    // the bench measures what a production session runs — rows that
    // need the ROW aggregate on purpose construct non-qualifying shapes
    // or call the aggregate API directly
    Graft.enableSqlKernels(spark)
    spark
  }

  private def noop(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** noop(df) with the physical route ASSERTED — a gate/probe
    * regression that silently demotes a strategy-routed row to the
    * default plan fails the bench rather than recording a slower
    * number (the same route-REQUIRED discipline as the grouped
    * kernel rows). The executedPlan is cached on the QueryExecution,
    * so the inspection does not re-plan. */
  private def noopRouted(df: org.apache.spark.sql.DataFrame, marker: String): Unit = {
    require(df.queryExecution.executedPlan.toString.contains(marker),
      s"row must plan through $marker in the bench session")
    noop(df)
  }

  // ------------------------------------------------------- shared queries
  // the same moments as cofactor_full / q01_pricing through the
  // columnar-batch kernel (ColumnarCofactor): no ColumnarToRow, no
  // aggregate exchange — the vs-DuckDB scan-aggregate pair rides on
  // these rows
  private def columnarCofactorFull(spark: SparkSession, dir: String): Unit = {
    import graft.agg.ColumnarCofactor._
    val t = cofactor(Tables.load(spark, dir, "lineitem"),
      Seq(NumCol("l_quantity"), NumCol("l_extendedprice"), NumCol("l_discount"), NumCol("l_tax")),
      Seq(CatCol("l_linenumber"), CatYear("l_shipdate")))
    require(t.isDefined, "columnar harvest must engage on the bare lineitem scan")
  }
  private def columnarPricing(spark: SparkSession, dir: String): Unit = {
    import graft.agg.ColumnarCofactor._
    val t = cofactor(Tables.load(spark, dir, "lineitem"),
      Seq(NumCol("l_quantity"), NumCol("l_extendedprice"),
        NumDerived(Seq("l_extendedprice", "l_discount"), "disc_price",
          (in, out, n) => {
            val e = in(0); val d = in(1)
            var r = 0
            while (r < n) { out(r) = e(r) * (1.0 - d(r)); r += 1 }
          })),
      Seq(CatPackedStrings(Seq("l_returnflag", "l_linestatus"))))
    require(t.isDefined, "columnar harvest must engage on the bare lineitem scan")
  }
  // the grouped cofactor through the PUBLIC grouped API: the group
  // key rides as the columnar kernel's per-class label. Route
  // REQUIRED columnar — a silent fallback would time the wrong design
  private def columnarCofactorGrouped(spark: SparkSession, dir: String): Unit = {
    val g = Graft.cofactorGrouped(Tables.load(spark, dir, "lineitem"),
      "l_linenumber",
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), Seq())
    require(Graft.lastGroupedRoute() == "columnar",
      "grouped harvest must engage on the bare lineitem scan")
    noop(g)
  }
  // the multi-key curation cut (GROUP BY flag, status → CatPackedKeys
  // Long label) on the same scan+treeReduce route — route required, so
  // a gate/probe regression that silently demotes to the row aggregate
  // fails the bench rather than recording a slower number
  private def columnarCofactorGroupedMulti(spark: SparkSession, dir: String): Unit = {
    val g = Graft.cofactorGroupedMulti(Tables.load(spark, dir, "lineitem"),
      Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), Seq())
    require(Graft.lastGroupedRoute() == "columnar",
      "multi-key grouped harvest must engage on the bare lineitem scan")
    noop(g)
  }
  // the DICTIONARY label route (round-17): o_orderpriority is 15 bytes,
  // past the Long label's 8, so the kernel rides a broadcast value↔index
  // dictionary — route required, one distinct scan + one harvest scan;
  // DuckDB twin `cofactor_grouped_dict_equivalent`
  private def columnarCofactorGroupedDict(spark: SparkSession, dir: String): Unit = {
    val g = Graft.cofactorGrouped(Tables.load(spark, dir, "orders"),
      "o_orderpriority", Seq("o_totalprice", "o_custkey"), Seq())
    require(Graft.lastGroupedRoute() == "columnar-dict",
      "wide string key must ride the dictionary kernel route")
    noop(g)
  }
  // q6-shaped filtered cofactor through the compiled-mask harvest —
  // certifies per-round that a simple filter stays on the columnar path
  private def columnarCofactorFiltered(spark: SparkSession, dir: String): Unit = {
    import graft.agg.ColumnarCofactor._
    val f = Tables.load(spark, dir, "lineitem").filter(
      col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
      col("l_quantity") < 30)
    val t = cofactor(f,
      Seq(NumCol("l_quantity"), NumCol("l_extendedprice"), NumCol("l_discount"), NumCol("l_tax")),
      Seq(CatCol("l_linenumber"), CatYear("l_shipdate")))
    require(t.isDefined, "columnar harvest must engage on the filtered lineitem scan")
  }

  private def minhashNeardup(spark: SparkSession, dir: String): Unit = {
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val mangled = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(10000000L)).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
    noop(graft.operators.Dedup.dedupNear(
      docs.unionByName(mangled), "doc_id", "text", threshold = 0.8))
  }
  private def knnInt8(spark: SparkSession, dir: String): Unit = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
    noop(graft.operators.Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 20), emb, "vec_id", "q8", "vec_id", "q8", k = 3))
  }
  /** Incremental-ingest dedup bench body (q100's shape at tier scale):
    * a derived new batch — verbatim / truncated / reversed thirds of
    * doc_id % 7 ∈ {0,1,2} — flags against the corpus through the
    * asymmetric exact-hash + banded-LSH passes (new×corpus only, never
    * corpus×corpus). `corpusMod` keeps doc_id % corpusMod ∈ {0,1} of
    * the tier's documents on BOTH sides — the sizing knob that keeps
    * one row from swamping a tier (round-18 verdict: the full 215k new
    * × 500k corpus row is an honest 25.9 s two-walk floor, 69% of the
    * official sf10 tier; it runs in FULL mode, the always-on row keeps
    * the same design visible at ~40% of each side). No DuckDB twin:
    * the honest single-node equivalent is the exhaustive jaccard
    * recompute the q100 oracle runs at sf0.01 — quadratic by design. */
  private def dedupIncrementalRow(spark: SparkSession, dir: String,
                                  corpusMod: Option[Int]): Unit = {
    val all = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
    val corpus = corpusMod.fold(all)(m => all.filter(col("doc_id") % m < 2))
    val newBatch = corpus.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
      .unionByName(corpus.filter(col("doc_id") % 7 === 1)
        .select((col("doc_id") + lit(900000000L)).as("doc_id"),
          regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text")))
      .unionByName(corpus.filter(col("doc_id") % 7 === 2)
        .select((col("doc_id") + lit(900000000L)).as("doc_id"),
          concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
    noop(graft.operators.Dedup.dedupAgainstCorpus(newBatch, corpus,
      "doc_id", "text", threshold = 0.8))
  }

  private def factorizedAdaptiveRaw(spark: SparkSession, dir: String): Unit = {
    graft.ml.Factorized.cofactorOverJoinAdaptive(
      Tables.load(spark, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_quantity")),
      Tables.load(spark, dir, "orders").select(col("o_orderkey").as("k"), col("o_totalprice")),
      "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
    ()
  }

  // bucketize-once setup for the factorized_bucketed rows (untimed:
  // the one-time write is the amortized cost the pattern exists to
  // pay once per CORPUS, not per run; a fresh session re-attaches the
  // existing files with a metadata-only CREATE TABLE). A setup
  // failure skips only the bucketed rows, BENCH-failure contract.
  private def bucketedPair(spark: SparkSession, dir: String, tag: String, buckets: Int):
      Option[(org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)] =
    try {
      val li = Tables.attachOrWriteBucketed(spark, s"$dir/lineitem.parquet",
        s"li_bkt_$tag", "l_orderkey", Seq("l_orderkey", "l_quantity"),
        s"$dir-bucketed/lineitem", buckets)
      val ord = Tables.attachOrWriteBucketed(spark, s"$dir/orders.parquet",
        s"ord_bkt_$tag", "o_orderkey", Seq("o_orderkey", "o_totalprice"),
        s"$dir-bucketed/orders", buckets)
      Some((li.select(col("l_orderkey").as("k"), col("l_quantity")),
            ord.select(col("o_orderkey").as("k"), col("o_totalprice"))))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] bucketize($tag) failed — bucketed rows skipped: $e")
        None
    }
  private def factorizedBucketed(pair: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Unit = {
    graft.ml.Factorized.cofactorOverJoinAdaptive(
      pair._1, pair._2, "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
    ()
  }

  // Chained-MICE rounds over the bucketed star (the reference's Flight
  // workload shape, train_flight.h:5-13): per-column training cofactor
  // + row-level impute-update, with the bucketize-once layout carrying
  // both the per-key aggregates and the update join — the "bucketize
  // amortizes within one training job" claim, timed end-to-end. The
  // imputed column is derived deterministically (~14% missing on
  // k % 7 == 0) so every pass imputes the same stratum. `iterations`
  // scales the chain: the layout-preserving checkpoint's payoff is
  // superlinear in rounds (each round re-uses the preserved
  // clustering), so the 3-round row's marginal cost per round is the
  // co-location claim's direct evidence. Phase decomposition prints to
  // stderr like mice_1round's.
  private def miceStarRound(pair: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame),
                            iterations: Int = 1): Unit = {
    val (liB, ordB) = pair
    val fact = liB.withColumn("x_missing",
      when(pmod(col("k"), lit(7)) === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity") * 0.5))
    val tm = new graft.mice.Mice.Timings
    val done = graft.mice.MiceJoin.imputeChainedOverJoin(
      fact, ordB, "k",
      graft.mice.MiceJoin.ChainConfig(
        factNum = Seq("l_quantity", "x_missing"), factCat = Seq(),
        dimNum = Seq("o_totalprice"), imputeCont = Seq("x_missing"),
        iterations = iterations), tm)
    noop(done)
    System.err.println(s"[bench] mice_star($iterations) phases: $tm")
    // free the pass's FINAL 60M-row checkpoint (the chain drops its
    // intermediates deterministically) so it cannot contend with the
    // next pass — one-RDD unpersist, microseconds, unlike the earlier
    // clearCache + blocking full unpersist which measured storage
    // teardown INTO the timed row
    graft.Graft.dropCheckpoint(done)
  }
  // MULTI-column chain — the reference's real workload iterates ALL
  // nullable columns (imputation_base.cpp:19,89), so the branch-based
  // generation's fragmentation cost must be measured where it can
  // hurt: two OVERLAPPING missing strata (k%7==0 and k%11==3 intersect
  // every 77th key) × `iterations` rounds = 2·iterations steps over the
  // 600M-row fact, branch count bounded by the k+1 pruning claim
  // (k = 2 columns ⇒ ≤ 3 live branches) with the >12 coalesce valve as
  // backstop. Phase decomposition prints like the single-column row's.
  private def miceStarMulti(pair: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame),
                            iterations: Int = 3): Unit = {
    val (liB, ordB) = pair
    val fact = liB
      .withColumn("x_missing",
        when(pmod(col("k"), lit(7)) === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity") * 0.5))
      .withColumn("y_missing",
        when(pmod(col("k"), lit(11)) === 3, lit(null).cast("double"))
          .otherwise(col("l_quantity") * 1.5 + lit(2.0)))
    val tm = new graft.mice.Mice.Timings
    val done = graft.mice.MiceJoin.imputeChainedOverJoin(
      fact, ordB, "k",
      graft.mice.MiceJoin.ChainConfig(
        factNum = Seq("l_quantity", "x_missing", "y_missing"), factCat = Seq(),
        dimNum = Seq("o_totalprice"), imputeCont = Seq("x_missing", "y_missing"),
        iterations = iterations), tm)
    noop(done)
    System.err.println(s"[bench] mice_star_multi($iterations) phases: $tm")
    graft.Graft.dropCheckpoint(done)
  }

  // -------------------------------------------------------------- tiers
  private final case class Tier(name: String,
                                rows: Seq[(String, () => Unit)],
                                repsOverride: Option[Int] = None,
                                warmupOverride: Option[Int] = None,
                                maxRepsOverride: Option[Int] = None,
                                statMin: Boolean = false)

  private def mainTier(spark: SparkSession): Tier = {
    def li = Tables.load(spark, sfDir, "lineitem")
    // JVM/codegen warmup (not timed)
    li.count()

    // PQ setup (untimed): codebook, IVF index, and the ENCODED corpus
    // are build-once artifacts amortized over every subsequent search —
    // at scale they live in parquet, not in a per-query recompute. The
    // timed entries are the recurring paths: the one-off encode pass
    // (pq_encode) and the search-many paths over the persisted codes
    // (pq_topk / ivfadc_topk / sdc_neardup). Geometry m=16/ksub=128 is
    // q57's pinned operating point (18× corpus-byte compression at
    // IVF-flat-level recall). A setup failure must condemn ONLY the PQ
    // entries (the per-query failure contract), not abort the whole
    // bench before any JSON is written.
    case class PqSetup(embB: org.apache.spark.sql.DataFrame,
                       cb: graft.operators.Pq.PqCodebook,
                       idx: graft.operators.Similarity.IvfIndex,
                       codes: org.apache.spark.sql.DataFrame,
                       ivfadcCodes: org.apache.spark.sql.DataFrame)
    val pqSetup: Either[Throwable, PqSetup] = try {
      val embB = Tables.load(spark, sfDir, "embeddings")
      val cb = graft.operators.Pq.train(embB, "vec_id", "embedding",
        dim = 64, m = 16, ksub = 128, iters = 2)
      val idx = graft.operators.Similarity.ivfBuild(embB, "vec_id", "embedding",
        nCentroids = 16, kmeansIters = 2)
      val codes = graft.operators.Pq.encodeCorpus(embB, "vec_id", "embedding", cb).cache()
      codes.count()
      val ivfadcCodes = graft.operators.Pq.ivfPqEncode(idx, "vec_id", "embedding", cb).cache()
      ivfadcCodes.count()
      Right(PqSetup(embB, cb, idx, codes, ivfadcCodes))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] PQ setup failed — PQ entries will report failed: $e")
        Left(e)
    }
    def withPq(f: PqSetup => Unit): () => Unit =
      () => pqSetup.fold(e => throw e, f)

    // the SQL-surface kernel strategies are installed session-wide
    // (makeSession), so q01_pricing / cofactor_full / cofactor_grouped
    // now measure the KERNEL-ROUTED plans a production session runs
    // (round-18 verdict item 3). The `_row` rows pop the strategies for
    // one call, keeping the default row-aggregate route visible per
    // round — the pair is the routing-delta measurement.
    def withoutKernelStrategies(f: => Unit): Unit = {
      // popping experimental.* cannot reach rules injected via
      // spark.sql.extensions=graft.plans.GraftExtensions — on such a
      // session the `_row` twins would silently still run the rewrite
      // and the routing-delta pair would lie (r20 advice item)
      require(!spark.conf.getOption("spark.sql.extensions").exists(
          _.contains("graft.plans.GraftExtensions")),
        "the _row twins require an enableSqlKernels session, not GraftExtensions")
      val saved = spark.experimental.extraStrategies
      val savedOpts = spark.experimental.extraOptimizations
      spark.experimental.extraStrategies = Seq.empty
      // the declarative cofactor rewrite is part of the same routing
      // surface — the `_row` twins measure the true default plan
      spark.experimental.extraOptimizations = Seq.empty
      try f finally {
        spark.experimental.extraStrategies = saved
        spark.experimental.extraOptimizations = savedOpts
      }
    }

    Tier("main", Seq(
      "q01_pricing" -> (() => noopRouted(
        SparkEntry.queries("q01_agg_pricing")(spark, sfDir), "GroupedMomentsKernel")),
      "q01_pricing_row" -> (() => withoutKernelStrategies(
        noop(SparkEntry.queries("q01_agg_pricing")(spark, sfDir)))),
      "q01_columnar" -> (() => columnarPricing(spark, sfDir)),
      "cofactor_filtered" -> (() => columnarCofactorFiltered(spark, sfDir)),
      "cofactor_full" -> { () =>
        noopRouted(li.withColumn("shipyear", year(col("l_shipdate")))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber"), col("shipyear")).as("t")), "FlatCofactorKernel")
      },
      "cofactor_full_row" -> (() => withoutKernelStrategies {
        noop(li.withColumn("shipyear", year(col("l_shipdate")))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber"), col("shipyear")).as("t")))
      }),
      "cofactor_columnar" -> (() => columnarCofactorFull(spark, sfDir)),
      "cofactor_grouped" -> { () =>
        noopRouted(li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber")).as("t")), "GroupedCofactorKernel")
      },
      "cofactor_grouped_row" -> (() => withoutKernelStrategies {
        noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber")).as("t")))
      }),
      "cofactor_grouped_columnar" -> (() => columnarCofactorGrouped(spark, sfDir)),
      "cofactor_grouped_multikey" -> (() => columnarCofactorGroupedMulti(spark, sfDir)),
      "cofactor_grouped_dict" -> (() => columnarCofactorGroupedDict(spark, sfDir)),
      // the explicit factorized identity — grouped cofactors FEEDING a
      // join. The kernel strategies must REFUSE this shape (round-19's
      // +140% regression: driver-materializing exec + single-partition
      // join input); the negative assertion fails loud if a gate change
      // ever re-admits it, and the `_row` twin keeps the routing delta
      // measured per round (r19 verdict: the missing pair is exactly
      // how the regression shipped).
      "factorized_join" -> { () =>
        val q = SparkEntry.queries("q09_factorized_join")(spark, sfDir)
        require(!q.queryExecution.executedPlan.toString.contains("GroupedCofactorKernel"),
          "a grouped cofactor feeding a join must NOT plan through the kernel exec")
        noop(q)
      },
      "factorized_join_row" -> (() => withoutKernelStrategies(
        noop(SparkEntry.queries("q09_factorized_join")(spark, sfDir)))),
      // what the engine actually picks for this key profile: the
      // cardinality probe sees ~4 rows/key and falls back to the plain
      // fused aggregate over the join (q09 above is the explicit
      // factorized identity — the adaptive path is the production call)
      "factorized_adaptive" -> (() => factorizedAdaptiveRaw(spark, sfDir)),
      "linreg_train_impute" -> { () =>
        val t = Graft.cofactor(li, Seq("l_extendedprice", "l_quantity", "l_discount"), Seq("l_linenumber"))
        val m = LinReg.train(t, label = 0)
        noop(li.select(col("l_orderkey"),
          LinReg.predict(m, Seq(col("l_quantity"), col("l_discount")), Seq(col("l_linenumber"))).as("pred")))
      },
      "text_stats" -> (() => noop(SparkEntry.queries("q10_token_stats")(spark, sfDir))),
      "sessionize" -> (() => noop(SparkEntry.queries("q33_sessionize")(spark, sfDir))),
      // the round-3 join operators, against DuckDB's native ASOF JOIN /
      // inequality join in bench_duckdb.py
      "asof_join" -> (() => noop(SparkEntry.queries("q44_asof_join")(spark, sfDir))),
      "range_join" -> (() => noop(SparkEntry.queries("q46_range_join")(spark, sfDir))),
      // the OPERATOR, not the q14 correctness harness (whose all-pairs
      // ground-truth brute force is test-only and quadratic by design)
      "minhash_neardup" -> (() => minhashNeardup(spark, sfDir)),
      "knn_bruteforce" -> (() => noop(SparkEntry.queries("q16_knn_bruteforce")(spark, sfDir))),
      // the same brute-force kernel over the int8-quantized corpus (4×
      // smaller vectors: 64 B vs 256 B per embedding) — the 100 TB
      // memory/bandwidth lever, timed end-to-end including quantization
      "knn_int8" -> (() => knnInt8(spark, sfDir)),
      // PQ family, against knn_bruteforce/knn_int8 above (same 20
      // queries, same corpus): pq_encode is the one-off corpus pass
      // whose output is 18× smaller than the float vectors; pq_topk
      // searches the persisted codes in O(m)=16 lookups per pair
      // instead of O(d)=64 multiplies; ivfadc_topk additionally prunes
      // candidates to nProbe/16 of the corpus — the full
      // billion-vector composition, search side only (the encode /
      // assignment passes are the build-once artifacts above)
      "pq_encode" -> withPq(p =>
        noop(graft.operators.Pq.encodeCorpus(p.embB, "vec_id", "embedding", p.cb))),
      "pq_topk" -> withPq(p =>
        noop(graft.operators.Pq.topKEncoded(
          p.embB.filter(col("vec_id") < 20), p.codes,
          "vec_id", "embedding", "vec_id", "codes", k = 3, p.cb))),
      "ivfadc_topk" -> withPq(p =>
        noop(graft.operators.Pq.ivfPqTopKEncoded(
          p.idx, p.ivfadcCodes, p.embB.filter(col("vec_id") < 20),
          "vec_id", "embedding", k = 3, p.cb, nProbe = 4))),
      // encoded-corpus near-dup: every within-cell pair SDC-scored over
      // m-byte codes — the dedup-throughput shape (candidate scoring
      // dominates; on this near-uniform corpus the ≥0.9 filter keeps
      // almost nothing, so the timing is pure pair-scoring cost)
      "sdc_neardup" -> withPq(p =>
        noop(graft.operators.Pq.sdcNearDupPairsEncoded(p.ivfadcCodes, p.cb, 0.9))),
      "mice_1round" -> { () =>
        val base = li.select(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_linenumber"))
          .withColumn("l_discount",
            when(rand(7) < 0.15, lit(null)).otherwise(col("l_discount")))
        val cfg = graft.mice.Mice.Config(
          contCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
          catCols = Seq("l_linenumber"),
          imputeCont = Seq("l_discount"), imputeCat = Seq(), iterations = 1)
        val tm = new graft.mice.Mice.Timings
        val done = graft.mice.Mice.partitioned(base, cfg, tm)
        noop(done)
        // free this pass's FINAL checkpoint synchronously, same as the
        // mice_star rows: the chain releases its INTERMEDIATE
        // checkpoints deterministically (cba0d1d), but the result's own
        // blocks otherwise linger into the next pass via the async
        // cleaner — the remaining inter-pass jitter source behind the
        // round-13 `mice_1round` unstable flag
        graft.Graft.dropCheckpoint(done)
        // phase decomposition comparable to the reference's timers (stderr,
        // not part of the one-line JSON contract)
        System.err.println(s"[bench] mice phases: $tm")
      }
    ))
  }

  // sf1 tier (~10× the default bench data: 6M-row lineitem, 50k docs,
  // 32k vectors — tools/gen_sf1.py): the DuckDB-comparable headline
  // families at a scale factor where per-action scheduling overhead
  // (~0.3 s) stops dominating and THROUGHPUT decides the number — the
  // scale the 2×-of-baseline target is actually about.
  private def sf1Tier(spark: SparkSession): Tier = {
    def li1 = Tables.load(spark, sf1Dir, "lineitem")
    li1.count() // warm the 10× scan before any timed pass

    // Streaming-throughput setup (untimed — round-18 verdict item 4:
    // the streaming family is oracle-certified through q116/q123 but
    // had ZERO perf visibility). Inputs are rewritten once as one
    // parquet file per MICRO-BATCH (maxFilesPerTrigger=1, the parity
    // harness's discipline); the timed rows below run a FRESH query
    // (own checkpoint) per pass over the same files, so each pass pays
    // the full micro-batch cadence. Expected range: dominated by
    // per-micro-batch scheduling (~0.1–0.2 s × batches) plus the
    // per-batch aggregate/state work — that fixed cadence IS the
    // honest cost of the one-file-per-trigger discipline, and a
    // regression here means the per-batch plan grew a new stage. A
    // setup failure condemns only the streaming rows.
    case class StreamSetup(cofIn: String, cofSchema: org.apache.spark.sql.types.StructType,
                           embIn: String, embSchema: org.apache.spark.sql.types.StructType,
                           cb: graft.operators.Pq.PqCodebook,
                           cents: Array[(Int, Array[Double])])
    lazy val streamSetup: Either[Throwable, StreamSetup] = try {
      val tmpRoot = new java.io.File(System.getProperty("java.io.tmpdir"))
      val base = new java.io.File(tmpRoot,
        s"graft_bench_stream_${spark.sparkContext.applicationId}")
      // per-appId paths leak where a fixed path self-overwrote: remove
      // this JVM's dir on clean exit, sweep >1-day-old siblings as the
      // SIGKILL backstop (no run lasts a day — a concurrent run's
      // files are never touched)
      def rmTree(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
        f.delete()
      }
      Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(base)))
      val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
      Option(tmpRoot.listFiles()).toSeq.flatten.foreach { f =>
        if (f.getName.startsWith("graft_bench_stream_") && f != base
            && f.lastModified() < dayAgo) rmTree(f)
      }
      val cofSrc = li1.select(col("l_quantity"), col("l_extendedprice"), col("l_linenumber"))
      val cofIn = new java.io.File(base, "cof_in")
      // 8 micro-batches: enough to prove cross-batch state merge at a
      // measurable per-batch payload (~750k rows each at sf1); 32
      // batches measured 0.73 s/batch of pure checkpoint+schedule
      // overhead — cadence cost, not operator cost
      cofSrc.repartition(8).write.mode("overwrite").parquet(cofIn.getAbsolutePath)
      val emb = Tables.load(spark, sf1Dir, "embeddings")
      val cb = graft.operators.Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 16, ksub = 128, iters = 2)
      val idx = graft.operators.Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCentroids = 64, kmeansIters = 2)
      val embSrc = emb.select(col("vec_id"), col("embedding"),
        timestamp_seconds(lit(1700000000L) + col("vec_id")).as("ts"))
      val embIn = new java.io.File(base, "emb_in")
      // ORDERED ascending-id chunks, one file per micro-batch: greedy
      // streaming dedup is arrival-order-defined, so pinning the order
      // (like the q123 parity harness) makes the row's kept-set — and
      // therefore its work — identical across runs (r19 verdict noted
      // the repartition(8) files arrived in nondeterministic order)
      val ids = emb.agg(min(col("vec_id")), max(col("vec_id"))).collect().head
      val (loId, hiId) = (ids.getLong(0), ids.getLong(1) + 1)
      graft.streaming.StreamingParity.writeOrderedChunks(spark, embIn, "bench_emb",
        (0 until 8).map { i =>
          val lo = loId + (hiId - loId) * i / 8
          val hi = loId + (hiId - loId) * (i + 1) / 8
          embSrc.filter(col("vec_id") >= lo && col("vec_id") < hi)
        })
      Right(StreamSetup(cofIn.getAbsolutePath, cofSrc.schema,
        embIn.getAbsolutePath, embSrc.schema, cb, idx.centroids))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] streaming setup failed — streaming rows report failed: $e")
        Left(e)
    }
    def withStream(f: StreamSetup => Unit): () => Unit =
      () => streamSetup.fold(e => throw e, f)
    def freshChk(tag: String): java.io.File =
      java.nio.file.Files.createTempDirectory(s"graft_bench_chk_$tag").toFile
    def rmRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmRec)
      f.delete()
    }

    Tier("sf1", Seq(
      "sf1_q01_pricing" -> (() => noopRouted(
        SparkEntry.queries("q01_agg_pricing")(spark, sf1Dir), "GroupedMomentsKernel")),
      "sf1_cofactor_full" -> { () =>
        noopRouted(li1.withColumn("shipyear", year(col("l_shipdate")))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber"), col("shipyear")).as("t")), "FlatCofactorKernel")
      },
      "sf1_cofactor_columnar" -> (() => columnarCofactorFull(spark, sf1Dir)),
      "sf1_factorized_adaptive" -> (() => factorizedAdaptiveRaw(spark, sf1Dir)),
      "sf1_window_running" -> (() => noop(SparkEntry.queries("q19_window_running")(spark, sf1Dir))),
      "sf1_text_stats" -> (() => noop(SparkEntry.queries("q10_token_stats")(spark, sf1Dir))),
      "sf1_asof_join" -> (() => noop(SparkEntry.queries("q44_asof_join")(spark, sf1Dir))),
      "sf1_range_join" -> (() => noop(SparkEntry.queries("q46_range_join")(spark, sf1Dir))),
      "sf1_minhash_neardup" -> (() => minhashNeardup(spark, sf1Dir)),
      "sf1_knn_bruteforce" -> (() => noop(SparkEntry.queries("q16_knn_bruteforce")(spark, sf1Dir))),
      "sf1_knn_int8" -> (() => knnInt8(spark, sf1Dir)),
      // 6M rows through 32 real file-source micro-batches into the
      // incremental ring sink — mergeable-state maintenance throughput
      "sf1_streaming_cofactor" -> withStream { s =>
        val inc = new graft.streaming.StreamingCofactor.Incremental(
          Seq("l_quantity", "l_extendedprice"), Seq("l_linenumber"))
        val chk = freshChk("scof")
        val q = spark.readStream.schema(s.cofSchema)
          .option("maxFilesPerTrigger", 1).parquet(s.cofIn)
          .writeStream.foreachBatch(inc.sink _)
          .option("checkpointLocation", chk.getAbsolutePath)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.processAllAvailable() finally q.stop()
        rmRec(chk)
        require(inc.current.n > 0, "streaming cofactor bench saw no rows")
      },
      // 32k embeddings through 16 micro-batches of the stateful
      // encode → per-cell SDC suppression pipeline (64 IVF cells, the
      // near-uniform corpus keeps most rows, so the timing is encode +
      // state-probe cost, the always-on-ingest shape)
      "sf1_streaming_semdedup" -> withStream { s =>
        var kept = 0L
        val chk = freshChk("sdd")
        // 8 state-store partitions for this query: each micro-batch
        // commits one store per shuffle partition, and 32 stores × 8
        // batches of per-store WAL/commit overhead dwarfed the actual
        // 4k-rows-per-batch state work (the 64 live cells don't fill
        // 8 partitions, let alone 32)
        val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try {
          val q = graft.streaming.StreamingSemanticDedup.dedup(
            spark.readStream.schema(s.embSchema)
              .option("maxFilesPerTrigger", 1).parquet(s.embIn),
            "vec_id", "embedding", "ts", s.cents, s.cb, threshold = 0.9,
            watermark = "1 minute", horizonMs = 1000L * 3600 * 24)
            .toDF()
            .writeStream
            .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) => { kept += b.count(); () })
            .option("checkpointLocation", chk.getAbsolutePath)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          try q.processAllAvailable() finally q.stop()
        } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        rmRec(chk)
        require(kept > 0, "streaming semantic dedup bench kept no rows")
      }),
      // one warmup (like sf10): the tier is multi-second IO-bound scans
      // plus the streaming rows' fixed micro-batch cadence — a second
      // JIT warmup bought nothing but wall-clock once the streaming
      // rows joined the tier
      warmupOverride = Some(1), maxRepsOverride = Some(4))
  }

  // sf10 tier (60M-row lineitem, 500k docs, 320k vectors — gen_sf1.py
  // with rep=100): the families whose ≤2×-of-DuckDB claim the round-9+
  // BENCH_CONTEXT rests on, INCLUDING (round 15) the byte-level text
  // family — lang_id / quality_score / minhash_prepare were measured
  // wins (81→1.6 s, 23.6→2.9 s, prepare −44%) that lived only in probe
  // output, invisible to the drift gate.
  private def sf10Tier(spark: SparkSession): Tier = {
    // shared by the bpe_encode row across reps: train once in the
    // first rep (training has its own timed row)
    lazy val bpeModel256 = graft.operators.Bpe.train(
      Tables.load(spark, sf10Dir, "documents"), "text", 256, minCount = 2L)
    Tier("sf10", Seq(
      // asof FIRST in the tier: round 13's driver run measured this row
      // at 11.3 s (+801%, self-flagged unstable) sitting immediately
      // after the 60M-row mice_star working set; the same query was
      // 0.42 s at sf0.1 and 0.56 s at sf1 in the same run and no as-of
      // code had changed. Light rows first, heavy working-set rows last.
      "sf10_asof_join" -> (() => noop(SparkEntry.queries("q44_asof_join")(spark, sf10Dir))),
      "sf10_text_stats" -> (() => noop(SparkEntry.queries("q10_token_stats")(spark, sf10Dir))),
      // the fused byte-level kernels (round-14/15 work): the q13/q12
      // oracle queries over the 550k-doc tier — a regression in
      // LangId/StopwordRatio/TokenStats byte walks breaks these rows
      "sf10_lang_id" -> (() => noop(SparkEntry.queries("q13_langid_counts")(spark, sf10Dir))),
      "sf10_quality_score" -> (() => noop(SparkEntry.queries("q12_quality_score")(spark, sf10Dir))),
      // token-budget chunking of the 550k-doc tier (64-token windows,
      // 8-token overlap — the context-window prep pass)
      "sf10_chunk_text" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        noop(docs.select(col("doc_id"),
            posexplode(graft.functions.TextFunctions.chunkText(col("text"), 64, 8)))
          .select(col("doc_id"), col("pos"), length(col("col")).as("n_chars")))
      },
      // BM25 corpus mining over the 550k-doc tier (3-term query): one
      // stats scan + explode-filtered tf pass — the decontamination
      // probe's keyword stage, DuckDB twin `bm25` in tools/bench_duckdb
      "sf10_bm25" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        noop(graft.operators.TextRank.bm25(docs, "doc_id", "text",
          Seq("hash", "join", "vector")))
      },
      // vocabulary mining: top-100 corpus tokens (explode → map-side
      // partial count → TakeOrdered heap; DuckDB twin `top_terms`)
      "sf10_top_terms" -> { () =>
        noop(graft.operators.TextRank.topTerms(
          Tables.load(spark, sf10Dir, "documents"), "text", 100))
      },
      // blocklist filtering with a 2000-term set: O(1)-per-token hashed
      // membership, one byte walk — DuckDB twin `blocklist` joins the
      // unnested tokens against the same generated list
      "sf10_blocklist" -> { () =>
        val terms = (0 until 2000).map(i => s"term${i}x${i % 7}") ++
          Seq("hash", "join", "slow", "customer")
        val docs = Tables.load(spark, sf10Dir, "documents")
        noop(docs.select(col("doc_id"),
          graft.functions.TextFunctions.blocklistStats(col("text"), terms).as("b")))
      },
      // duplicated 3-gram mining over the 550k-doc tier (boilerplate
      // survey): one fused distinct-grams byte walk per doc feeding the
      // spill-safe hash aggregate — DuckDB twin `dup_ngrams`
      "sf10_dup_ngrams" -> { () =>
        noop(graft.operators.TextRank.duplicatedNgrams(
          Tables.load(spark, sf10Dir, "documents"), "text", n = 3, minDocs = 2L, k = 100))
      },
      // exact-substring dedup END TO END (Lee et al. shape): mine every
      // duplicated 3-gram (minDocs=8 keeps the set broadcastable on
      // this deliberately-repetitive synthetic corpus), broadcast, one
      // removal byte walk per doc — DuckDB twin `dup_span_removal`
      "sf10_dup_span_removal" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents").select(col("doc_id"), col("text"))
        noop(graft.operators.TextRank.removeDuplicatedSpans(docs, "text",
          n = 3, minDocs = 8L, maxGrams = 4 << 20))
      },
      // the LSH prepare phase alone (one tokenize+shingle byte walk →
      // signatures + bands + shingle set): the dominant per-row cost of
      // minhash dedup, isolated from the candidate join so prepare
      // regressions are attributable
      "sf10_minhash_prepare" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        noop(docs.select(col("doc_id"),
          graft.operators.Dedup.minhashPrepare(col("text")).as("p")))
      },
      // bigram-LM quality END TO END (train the add-1 model on the
      // 550k-doc corpus — unigram map pass + bigram explode-agg — then
      // one scoring byte walk per doc; DuckDB twin `lm_score` retrains
      // in SQL and scores via the bigram join)
      "sf10_lm_score" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        val (scored, lm) = graft.operators.LmQuality.scoreCorpus(docs, "text")
        try noop(scored.select(col("doc_id"), col("lm_score")))
        finally lm.release()
      },
      // C4 line filter over the 4-token-chunk derived corpus (q97's
      // shape at 550k docs): derive lines, count corpus-wide, strip
      // freq≥2 lines, rebuild — the join form, unbounded duplicated
      // set; DuckDB twin `dedup_lines`
      "sf10_dedup_lines" -> { () =>
        val corpus = Tables.load(spark, sf10Dir, "documents")
          .select(col("doc_id"),
            array_join(graft.functions.TextFunctions.chunkText(col("text"), 4, 0), "\n").as("text"))
        noop(graft.operators.Dedup.dedupLines(corpus, "doc_id", "text", 2L))
      },
      // the r21 hot-line skew guard on a corpus with a DOMINANT
      // boilerplate line (one footer in all 500k docs): the digest
      // pre-pass routes the hot line around the counting window via a
      // broadcast-joined exact aggregate — guarded 5.3 s vs unguarded
      // 6.9 s median (and a 15.6 s straggler outlier) on this corpus,
      // byte-identical output (R21HotLinesAb; DedupLinesSpec pins the
      // value parity). The benign-corpus row above keeps the guard off:
      // its pre-pass costs a second skinny scan+split that a corpus
      // without a hot line pays for nothing.
      "sf10_dedup_lines_hot" -> { () =>
        val corpus = Tables.load(spark, sf10Dir, "documents")
          .select(col("doc_id"),
            concat(
              array_join(graft.functions.TextFunctions.chunkText(col("text"), 4, 0), "\n"),
              lit("\nGRAFT COOKIE BANNER FOOTER - ACCEPT ALL COOKIES TO CONTINUE")).as("text"))
        noop(graft.operators.Dedup.dedupLines(corpus, "doc_id", "text", 2L,
          hotLineThreshold = 10000L))
      },
      // Gopher word-rule stats + keep decision, one byte walk per doc;
      // DuckDB twin `gopher_rules` recomputes compositionally
      "sf10_gopher_rules" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        noop(docs.select(col("doc_id"),
            graft.functions.TextFunctions.gopherStats(col("text")).as("g"))
          .select(col("doc_id"), col("g"),
            graft.functions.TextFunctions.gopherKeepFromStats(col("g"),
              minWords = 10, minStopHits = 1).as("keep")))
      },
      // deterministic mixture composition (2.5/1.0/0.25 epochs over
      // three sources + the global-shuffle key): pure projection —
      // explode, literal-map lookups, pinned hash; DuckDB twin
      // `corpus_mix` re-derives via HUGEINT
      "sf10_corpus_mix" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents").select(col("doc_id"), col("source"))
        val mixed = graft.operators.CorpusMix.compose(docs, "source", "doc_id",
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
        noop(mixed.select(col("doc_id"), col("epoch"),
          graft.operators.CorpusMix.mixKey(col("doc_id"), col("epoch")).as("k")))
      },
      // exact top-10% cut by doc length: 4 radix histogram passes over
      // the order-preserving double bit key + the threshold filter —
      // the no-sort global-quantile path (q104's shape at 550k docs).
      // No DuckDB twin: its honest equivalent is the window sort the
      // operator exists to avoid.
      "sf10_quantile_cut" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        noop(graft.operators.Quantiles.keepTopFraction(
          docs, col("n_chars").cast("double"), 0.1).select(col("doc_id")))
      },
      // BPE training at corpus scale: one word-count shuffle over 550k
      // docs, then the exact 256-merge driver loop on the collected
      // dict (incremental pair counts). No DuckDB twin — the oracle's
      // 8-round SQL replay is quadratic in rounds by construction.
      "sf10_bpe_train" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        val m = graft.operators.Bpe.train(docs, "text", 256, minCount = 2L)
        // the synthetic vocab EXHAUSTS at ~89 merges (every dict word
        // becomes one symbol) — that is the loop's honest full cost
        require(m.merges.length >= 64, s"bpe_train: only ${m.merges.length} merges")
      },
      // BPE encoding with the cached 256-merge model: one scan, the
      // broadcast rank table probed per word, no shuffle (aggregated
      // to a token count so the bench measures the kernel, not a dump)
      "sf10_bpe_encode" -> { () =>
        val docs = Tables.load(spark, sf10Dir, "documents")
        noop(graft.operators.Bpe.encode(docs, "text", bpeModel256,
            out = "tokens")
          .select(col("doc_id"), size(col("tokens")).as("n_tokens")))
      },
      // incremental-ingest dedup at ~40% of each side (86k new × 220k
      // corpus) — see dedupIncrementalRow; the full 215k × 500k row
      // (25.9 s quiet-box floor) runs only in FULL mode below
      "sf10_dedup_incremental_220k" -> (() =>
        dedupIncrementalRow(spark, sf10Dir, corpusMod = Some(5)))) ++
      (if (benchFull)
        Seq("sf10_dedup_incremental" -> (() =>
          dedupIncrementalRow(spark, sf10Dir, corpusMod = None)))
      else Seq.empty) ++
      Seq(
      // the factorized family at sf10, both physical designs: the
      // probe-routed adaptive over raw parquet (two exchanges) vs the
      // same operator over bucketized tables (zero exchanges) — the
      // pair quantifies what bucketize-once buys the repeated-join
      // pattern at this scale
      "sf10_factorized_adaptive" -> (() => factorizedAdaptiveRaw(spark, sf10Dir)),
      "sf10_knn_bruteforce" -> (() => noop(SparkEntry.queries("q16_knn_bruteforce")(spark, sf10Dir))),
      "sf10_knn_int8" -> (() => knnInt8(spark, sf10Dir))) ++
      bucketedPair(spark, sf10Dir, "sf10", 32).map(p => Seq(
        "sf10_factorized_bucketed" -> (() => factorizedBucketed(p)),
        "sf10_mice_star_round" -> (() => miceStarRound(p)))).toSeq.flatten,
      // one warmup: the tier's rows are multi-second scans where
      // steady-state is IO-bound, not JIT-bound — the second warmup
      // bought nothing but wall-clock against the driver's budget
      warmupOverride = Some(1), maxRepsOverride = Some(4)
    )
  }

  // sf100 tier (600M-row lineitem, relational tables only — the
  // gen_sf1.py machinery at rep=1000, see tools/Sf100Probe): the
  // scan-aggregate ENDPOINT the vs-DuckDB story rests on. Passes are
  // tens of seconds and the 15 GB tier is the one most exposed to IO
  // contention, so the tier reports MIN-of-reps with a
  // floor-convergence gate: passes keep running (3..6) until the two
  // fastest agree within tolerance — one pair of quiet passes
  // certifies the uncontended number no matter how inflated the
  // contended passes are.
  private def sf100Tier(spark: SparkSession): Tier = {
    def li100 = Tables.load(spark, sf100Dir, "lineitem")
    li100.count() // warm the scan cache path (file listing, footers)
    // shared by the sf100 bpe_encode row (training is its own row)
    lazy val bpeModel256Sf100 = graft.operators.Bpe.train(
      Tables.load(spark, sf100Dir, "documents"), "text", 256, minCount = 2L)

    // Endpoint-scale vector corpus: 3.2M × 64d (10× the sf10 corpus —
    // the vector family's claims are 100 TB-framed but its largest
    // measured corpus was 320k vectors). Two-level near-dup structure
    // (tools/BigAnn: 256 coarse cells × 200k 16-member fine groups),
    // generated ONCE into the tier dir (~850 MB parquet) and reused.
    // Setup is LAZY — codebook train, IVF build, and the corpus encode
    // run inside the first vector row's warmup pass (discarded), so a
    // single-row probe of a relational row never pays them. A failure
    // condemns only the vector rows (per-query failure contract).
    case class BigVecSetup(emb: org.apache.spark.sql.DataFrame,
                           cb: graft.operators.Pq.PqCodebook,
                           idx: graft.operators.Similarity.IvfIndex,
                           codes: org.apache.spark.sql.DataFrame)
    lazy val bigVec: Either[Throwable, BigVecSetup] = try {
      val emb = graft.tools.BigAnn.ensureCorpus(spark, sf100Dir)
      val cb = graft.operators.Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 16, ksub = 128, iters = 2)
      val idx = graft.operators.Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCentroids = 64, kmeansIters = 2)
      val codes = graft.operators.Pq.ivfPqEncode(idx, "vec_id", "embedding", cb).cache()
      codes.count()
      Right(BigVecSetup(emb, cb, idx, codes))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] big-vector setup failed — vector rows report failed: $e")
        Left(e)
    }
    def withBigVec(f: BigVecSetup => Unit): () => Unit =
      () => bigVec.fold(e => throw e, f)

    Tier("sf100", Seq(
      "sf100_q01_pricing" -> (() => noopRouted(
        SparkEntry.queries("q01_agg_pricing")(spark, sf100Dir), "GroupedMomentsKernel")),
      "sf100_q01_columnar" -> (() => columnarPricing(spark, sf100Dir)),
      "sf100_cofactor_columnar" -> (() => columnarCofactorFull(spark, sf100Dir)),
      "sf100_cofactor_grouped_columnar" -> (() => columnarCofactorGrouped(spark, sf100Dir)),
      "sf100_cofactor_grouped_multikey" -> (() => columnarCofactorGroupedMulti(spark, sf100Dir)),
      "sf100_cofactor_grouped_dict" -> (() => columnarCofactorGroupedDict(spark, sf100Dir)),
      "sf100_cofactor_filtered" -> (() => columnarCofactorFiltered(spark, sf100Dir)),
      "sf100_cofactor_full" -> { () =>
        noopRouted(li100.withColumn("shipyear", year(col("l_shipdate")))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber"), col("shipyear")).as("t")), "FlatCofactorKernel")
      }) ++
      // the bare-join adaptive floor re-shuffles BOTH 600M/150M-row
      // sides on every pass by construction (the operator's own runtime
      // warning names it) — round 17 measured it UNSTABLE at 86% spread
      // and 27-163 s/pass, the single worst consumer of the driver's
      // budget. It stays measurable (FULL mode + sf10's raw row keeps
      // the floor visible every round); the default sf100 rows time the
      // operator over bucketed inputs, where the probe's zero-exchange
      // routing is the design claim.
      (if (benchFull)
        Seq("sf100_factorized_adaptive_raw" -> (() => factorizedAdaptiveRaw(spark, sf100Dir)))
      else Seq.empty) ++
      Seq(
      // the text family at the endpoint scale (5M docs ≈ 1.5 GB,
      // tools/gen_sf100_docs.py — 10× the 550k-doc sf10 ceiling the
      // text wins were previously measured at, the same grounding move
      // round 16 made for ANN): the fused byte kernels, the LM
      // train+score pipeline, and the line filter's three-shuffle join
      // form all at 10× corpus. DuckDB twins in tools/bench_duckdb.py.
      "sf100_text_stats" -> (() => noop(SparkEntry.queries("q10_token_stats")(spark, sf100Dir))),
      "sf100_lang_id" -> (() => noop(SparkEntry.queries("q13_langid_counts")(spark, sf100Dir))),
      "sf100_gopher_rules" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents")
        noop(docs.select(col("doc_id"),
            graft.functions.TextFunctions.gopherStats(col("text")).as("g"))
          .select(col("doc_id"), col("g"),
            graft.functions.TextFunctions.gopherKeepFromStats(col("g"),
              minWords = 10, minStopHits = 1).as("keep")))
      },
      "sf100_lm_score" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents")
        val (scored, lm) = graft.operators.LmQuality.scoreCorpus(docs, "text")
        try noop(scored.select(col("doc_id"), col("lm_score")))
        finally lm.release()
      },
      "sf100_dedup_lines" -> { () =>
        val corpus = Tables.load(spark, sf100Dir, "documents")
          .select(col("doc_id"),
            array_join(graft.functions.TextFunctions.chunkText(col("text"), 4, 0), "\n").as("text"))
        noop(graft.operators.Dedup.dedupLines(corpus, "doc_id", "text", 2L))
      },
      "sf100_corpus_mix" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents").select(col("doc_id"), col("source"))
        val mixed = graft.operators.CorpusMix.compose(docs, "source", "doc_id",
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
        noop(mixed.select(col("doc_id"), col("epoch"),
          graft.operators.CorpusMix.mixKey(col("doc_id"), col("epoch")).as("k")))
      },
      // exact top-10% cut at 5M docs: 4 radix histogram passes + the
      // literal-threshold filter — the no-sort selection's endpoint
      // measurement (DuckDB twin `quantile_cut`)
      "sf100_quantile_cut" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents")
        noop(graft.operators.Quantiles.keepTopFraction(
          docs, col("n_chars").cast("double"), 0.1).select(col("doc_id")))
      },
      // per-source caps at 5M docs: bounded k-heaps + survivor semi-join
      // (DuckDB twin `source_cap` runs the window formulation)
      "sf100_source_cap" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents")
        noop(graft.operators.CorpusMix.capPerSource(docs, "source", "doc_id", 10000)
          .select(col("doc_id")))
      },
      // per-source token-mass cut at 5M docs: 20 sources resolved in
      // the SAME mass-summing radix passes (group×digit histograms +
      // literal prefix maps) — the shared-pass claim at scale
      "sf100_group_mass_cut" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents")
        noop(graft.operators.Quantiles.keepTopMassFractionByGroup(
            docs, col("source"), col("n_chars").cast("double"),
            col("n_chars"), 0.25)
          .select(col("doc_id")))
      },
      // BPE at the endpoint corpus: one word-count shuffle over 5M docs
      // + the 256-merge driver loop; encode re-trains lazily once and
      // measures the broadcast-probe scan
      "sf100_bpe_train" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents")
        val m = graft.operators.Bpe.train(docs, "text", 256, minCount = 2L)
        require(m.merges.length >= 64, s"sf100 bpe_train: only ${m.merges.length} merges")
      },
      "sf100_bpe_encode" -> { () =>
        val docs = Tables.load(spark, sf100Dir, "documents")
        noop(graft.operators.Bpe.encode(docs, "text", bpeModel256Sf100)
          .select(col("doc_id"), size(col("tokens")).as("n_tokens")))
      },
      // the vector family at the endpoint scale (3.2M × 64d, 20
      // queries, k=10): brute force is the honest O(N·d) floor;
      // IVFADC searches the same corpus over 16-byte codes with an
      // 8/64-cell coarse prune — the "coarse prune + O(m) ADC"
      // scaling claim measured at 10× the previous largest corpus
      // (recall@10 vs brute force pinned by tools/BigAnnProbe,
      // recorded in BENCH_CONTEXT.md)
      "sf100_knn_bruteforce" -> withBigVec(s =>
        noop(graft.operators.Similarity.bruteForceTopK(
          s.emb.filter(col("vec_id") < 20), s.emb,
          "vec_id", "embedding", "vec_id", "embedding", k = 10))),
      "sf100_ivfadc_topk" -> withBigVec(s =>
        noop(graft.operators.Pq.ivfPqTopKEncoded(
          s.idx, s.codes, s.emb.filter(col("vec_id") < 20),
          "vec_id", "embedding", k = 10, s.cb, nProbe = 8)))) ++
      // the exchange-free design at the endpoint scale: the same
      // operator over 256-bucket tables — the 150M-row build takes
      // the bucketed co-located tier (per-bucket build ≤ cap)
      // instead of partition-to-fit's two full-tier re-shuffles.
      // mice_star is the reference's Flight workload
      // (train_flight.h:5-13) at the ENDPOINT scale — the
      // bucketize-once amortization claim is load-bearing exactly
      // here (600M-row fact, per-column cofactor + impute join each
      // round). The 3-round row is the multi-iteration claim: the
      // layout-preserving checkpoint means rounds 2..n never re-pay
      // the exchange, so marginal round cost ≪ round 1. LAST in the
      // tier so the multi-GB checkpoint working set cannot
      // contaminate the scan-aggregate rows.
      bucketedPair(spark, sf100Dir, "sf100", 256).map(p => Seq(
        "sf100_factorized_bucketed" -> (() => factorizedBucketed(p)),
        // the SAME adaptive call repeated: probeRowsPerKey memoizes per
        // input, so this row isolates the steady-state repeat-call cost
        // over bucketed inputs (probe amortized to zero) — the pair
        // sitting together IS the routing-stability claim (round-17
        // advice item 3). Named `_repeat` because it times the SAME
        // thunk as the bucketed row by design (round-18 advice: the
        // old `sf100_factorized_adaptive` name had previously carried
        // the raw-join measurement, so cross-round comparisons of that
        // key silently changed meaning — the raw row is
        // `sf100_factorized_adaptive_raw` in FULL mode). Two
        // alternatives measured and rejected in round 18: the explicit
        // per-key-triple identity OOMs at ~4 rows/key (150M ring-object
        // groups), and the probe-free +Inf pin lands on a sort-merge
        // join that sorts 600M rows (32 s vs 6.9 s) because WITHOUT the
        // probes' exact row counts hashJoinIfSafe cannot prove the hash
        // build fits.
        "sf100_factorized_adaptive_repeat" -> (() => factorizedBucketed(p)),
        "sf100_mice_star_round" -> (() => miceStarRound(p))) ++
        // the multi-round chains are 61 s and 174 s per PASS — they
        // blew the driver's round-17 budget (rc=124, no artifact) and
        // now run only in FULL mode; BENCH_CONTEXT.md carries their
        // out-of-band numbers
        (if (benchFull) Seq(
          "sf100_mice_star_3round" -> (() => miceStarRound(p, iterations = 3)),
          "sf100_mice_star_multi3" -> (() => miceStarMulti(p, iterations = 3)))
        else Seq.empty)).toSeq.flatten,
      // warmup+2 with retries capped at 3 (round-17 advice item 1): the
      // floor-convergence gate needs only two quiet passes to certify a
      // min, and six passes of a 30 s row is the budget, not the data
      repsOverride = Some(2), warmupOverride = Some(1),
      maxRepsOverride = Some(3), statMin = true)
  }

  /** Tiers whose fork timed out or exited nonzero this run — their
    * completed rows are kept but the artifact marks them incomplete. */
  private val incompleteTiers =
    java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

  private val tierNames = Seq("main", "sf1", "sf10", "sf100")
  private def tierDir(name: String): String = name match {
    case "main" => sfDir
    case "sf1" => sf1Dir
    case "sf10" => sf10Dir
    case "sf100" => sf100Dir
  }
  private def buildTier(spark: SparkSession, name: String): Tier = name match {
    case "main" => mainTier(spark)
    case "sf1" => sf1Tier(spark)
    case "sf10" => sf10Tier(spark)
    case "sf100" => sf100Tier(spark)
  }

  // ------------------------------------------------------------- timing
  // Self-validating timing: a single pass is at the mercy of JIT, GC,
  // and machine contention (round 2's committed result recorded 4-5×
  // phantoms from a concurrent build). Median of >= `reps` passes per
  // query; if the relative spread (max-min)/median still exceeds
  // `tolerance` after `maxReps` passes, the query is flagged in the
  // output rather than silently trusted.
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }
  // A pass is "noisy" only when the spread is large both relatively
  // AND absolutely — sub-second queries carry ~0.1 s scheduler jitter
  // that a pure percentage guard would flag forever, while the real
  // failure mode (round 2's 4-5× build-contention phantoms) trips both.
  private def spread(xs: Seq[Double]): Double =
    if (xs.max - xs.min < absFloor) 0.0
    else (xs.max - xs.min) / math.max(median(xs), 1e-9)
  // Floor convergence for min-stat queries: the two FASTEST passes must
  // agree (relative to the floor, same absFloor waiver). Contention only
  // ADDS time, so two independent passes near the same floor certify the
  // min as the uncontended number even when other passes are inflated —
  // the property the median can't offer on a busy box (round 11's
  // driver run: all three sf100 rows unstable, cofactor +699%).
  private def floorSpread(xs: Seq[Double]): Double = {
    if (xs.size < 2) return Double.MaxValue
    val s = xs.sorted
    if (s(1) - s(0) < absFloor) 0.0
    else (s(1) - s(0)) / math.max(s(0), 1e-9)
  }

  /** (name, seconds, noisy, failed) per row. `onRow` fires as each row
    * completes so the child can persist partial progress — the parent
    * streams it into an incremental stdout summary, and a driver kill
    * mid-tier still leaves every completed row in the artifact. */
  private def timeTier(t: Tier, only: Option[String],
                       onRow: (String, Double, Boolean, Boolean) => Unit = (_, _, _, _) => ())
      : Seq[(String, Double, Boolean, Boolean)] = {
    val suite = only match {
      case Some(rows) =>
        val want = rows.split(',').map(_.trim).filter(_.nonEmpty).toSet
        t.rows.filter(r => want(r._1))
      case None => t.rows
    }
    suite.map { case (name, fn) =>
      // per-tier overrides: sf100 passes run tens of seconds each, so
      // the tier trims warmups to 1 and uses min-of-reps (statMin) —
      // steady-state there is dominated by IO/scan, not JIT
      val (qReps, qWarm) = (t.repsOverride.getOrElse(reps), t.warmupOverride.getOrElse(warmups))
      val qMaxReps = t.maxRepsOverride.getOrElse(
        math.max(qReps, t.repsOverride.fold(maxReps)(r => r + 1)))
      val gate: Seq[Double] => Double = if (t.statMin) floorSpread else spread
      val stat: Seq[Double] => Double = if (t.statMin) xs => xs.min else median
      var failed = false
      def pass(): Double = {
        val t0 = System.nanoTime()
        try { fn() } catch { case e: Throwable => failed = true; System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      // the first pass pays per-query JIT/codegen; steady-state is what
      // scales to a long-lived cluster, so warmup passes are discarded —
      // including a transient warmup failure, which must not condemn a
      // query whose timed passes all succeed
      val warm = (1 to qWarm).map(_ => pass())
      failed = false
      var times = Vector.empty[Double]
      // short-circuit on a timed-pass failure: re-running a broken query
      // pays full execution up to the throw for no information
      while (!failed && times.size < qMaxReps
             && (times.size < qReps || gate(times) > tolerance)) {
        times :+= pass()
      }
      val noisy = !failed && gate(times) > tolerance
      if (failed)
        System.err.println(s"[bench] $name: FAILED — a pass threw; result marked broken, not timed")
      else if (noisy)
        System.err.println(f"[bench] $name: UNSTABLE after ${times.size} passes — " +
          f"spread ${gate(times) * 100}%.0f%% over $times (machine under load?)")
      else
        System.err.println(f"[bench] $name: ${stat(times)}%.3f s ${if (t.statMin) "min" else "median"} of ${times.size} " +
          f"(warmup ${warm.map(w => f"$w%.2f").mkString(",")})")
      // a failed query must be impossible to mistake for a fast one: its
      // value is -1 and it is excluded from the total
      val row = (name, if (failed) -1.0 else stat(times), noisy, failed)
      onRow(row._1, row._2, row._3, row._4)
      row
    }
  }

  // --------------------------------------------------------- child mode
  /** Run one tier in THIS JVM and write a TSV fragment — the forked
    * child's whole job. Fragment lines: name\tvalue\tnoisy\tfailed. */
  private def childMain(tierName: String): Unit = {
    val frag = sys.env.getOrElse("SPARK_GRAFT_BENCH_FRAG",
      s"/tmp/graft_bench_$tierName.tsv")
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").filter(_.nonEmpty)
    // the fragment is REWRITTEN after every completed row (not once at
    // the end): a driver kill mid-tier leaves all completed rows for
    // the parent's incremental summary instead of an empty file
    var done = Vector.empty[(String, Double, Boolean, Boolean)]
    def flush(): Unit = {
      val body = done.map { case (n, v, noisy, failed) =>
        f"$n\t$v%.3f\t$noisy\t$failed"
      }.mkString("", "\n", "\n")
      java.nio.file.Files.write(java.nio.file.Paths.get(frag),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    if (tierName != "main" && !tierExists(tierDir(tierName))) flush()
    else {
      val spark = makeSession()
      try timeTier(buildTier(spark, tierName), only,
        onRow = (n, v, noisy, failed) => { done :+= ((n, v, noisy, failed)); flush() })
      finally spark.stop()
    }
    flush()
  }

  // -------------------------------------------------------- parent mode
  /** Fork a fresh JVM running one tier (or one row), inheriting this
    * JVM's args (--add-opens, -Xmx) and classpath. The child's stdout
    * goes to a log file so the parent's one-line-JSON stdout contract
    * can't be polluted; stderr (the [bench] progress lines) streams
    * through. Returns the parsed fragment, or None on fork/exit/timeout
    * failure (caller falls back or records the tier as failed). */
  private def forkTier(tierName: String, only: Option[String],
                       onPartial: Seq[(String, Double, Boolean, Boolean)] => Unit = _ => ()):
      Option[Seq[(String, Double, Boolean, Boolean)]] = {
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = new java.io.File(
        new java.io.File(System.getProperty("java.home"), "bin"), "java").getAbsolutePath
      val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        // debugger/profiler agents bind ports/files once per machine —
        // a child inheriting them would crash on the collision
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent")
          || a.startsWith("-Xrunjdwp"))
      val cp = System.getProperty("java.class.path")
      // the row list can be long (batched recertify) — keep the temp
      // fragment name bounded and filename-safe
      val tag = only.fold(tierName)(r =>
        s"$tierName.${r.replaceAll("[^A-Za-z0-9_]", "-").take(48)}")
      val frag = java.nio.file.Files.createTempFile(s"graft_bench_$tag", ".tsv")
      java.nio.file.Files.delete(frag)
      val cmd = (Seq(javaBin) ++ jvmArgs ++ Seq("-cp", cp, "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_TIER", tierName)
      pb.environment().put("SPARK_GRAFT_BENCH_FRAG", frag.toString)
      only match {
        case Some(r) => pb.environment().put("SPARK_GRAFT_BENCH_ONLY", r)
        case None => pb.environment().remove("SPARK_GRAFT_BENCH_ONLY")
      }
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      pb.redirectOutput(new java.io.File(frag.toString + ".log"))
      System.err.println(s"[bench] forking fresh JVM for tier $tierName" +
        only.fold("")(r => s" (row $r only)"))
      val p = pb.start()
      def readFrag(): Seq[(String, Double, Boolean, Boolean)] =
        if (!java.nio.file.Files.exists(frag)) Seq.empty
        else java.nio.file.Files.readAllLines(frag).asScala.toSeq
          .filter(_.nonEmpty).flatMap { l =>
            val f = l.split('\t')
            // a partially-written trailing line parses short — skip it
            if (f.length < 4) None
            else try Some((f(0), f(1).toDouble, f(2).toBoolean, f(3).toBoolean))
            catch { case _: Exception => None }
          }
      // Poll rather than block: every 15 s the parent re-reads the
      // growing fragment and, on change, re-emits the cumulative
      // summary line — so even a SIGKILL from the driver's timeout
      // leaves the most recent complete summary in the output tail
      // (round-17 advice item 1). 25-min per-tier cap for the trimmed
      // default suite (~8 min uncontended); FULL mode restores the
      // multi-round MICE rows (61 s + 174 s per PASS), so its cap must
      // cover them or the flag would kill exactly the rows it restores.
      var seen = -1
      val capMs = (if (benchFull) 55L else 25L) * 60 * 1000
      val t0 = System.currentTimeMillis()
      var finished = false
      while (!finished && System.currentTimeMillis() - t0 < capMs) {
        finished = p.waitFor(15, java.util.concurrent.TimeUnit.SECONDS)
        val part = readFrag()
        if (part.size != seen) { seen = part.size; if (part.nonEmpty) onPartial(part) }
      }
      // a tier that did not EXIT CLEANLY must stay visible as broken in
      // the artifact: completed rows are kept (they are real timings),
      // but the tier is flagged incomplete so a crash that drops the
      // heavy tail rows can never read as a tier-total speedup
      if (!finished) {
        p.destroyForcibly()
        System.err.println(s"[bench] tier $tierName TIMED OUT (${capMs / 60000} min) — keeping completed rows, tier marked INCOMPLETE")
        incompleteTiers.add(tierName)
        return Some(readFrag())
      }
      if (p.exitValue() != 0) {
        System.err.println(s"[bench] tier $tierName child exited ${p.exitValue()} — see ${frag}.log; keeping completed rows, tier marked INCOMPLETE")
        incompleteTiers.add(tierName)
        val part = readFrag()
        return if (part.nonEmpty) Some(part) else None
      }
      Some(readFrag())
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] fork($tierName) failed: $e")
        None
    }
  }

  def main(args: Array[String]): Unit = {
    sys.env.get("SPARK_GRAFT_BENCH_TIER") match {
      case Some(tier) => childMain(tier)
      case None => parentMain()
    }
  }

  /** The driver records only the LAST ~2000 characters of the bench
    * run's output and parses the summary JSON line out of that window —
    * rounds 10-17 printed a multi-KB line whose head fell outside the
    * window, so every one of those rounds recorded `parsed: null`
    * despite a green run. The stdout line is therefore COMPACT by
    * contract (target ≤1600 chars): the full per-tier detail lives in
    * BENCH_RESULT.json; stdout carries the main-tier queries map plus
    * per-tier totals and failure/instability counts. Re-emitted
    * cumulatively as tiers progress so a driver timeout kill still
    * leaves the latest complete summary inside the tail window. */
  private def compactLine(tiers: Map[String, Seq[(String, Double, Boolean, Boolean)]],
                          recertN: Int, driftN: Int,
                          partial: Option[String]): String = {
    val main = tiers.getOrElse("main", Seq.empty)
    def totalOf(rows: Seq[(String, Double, Boolean, Boolean)]): Double =
      rows.collect { case (_, v, _, false) => v }.sum
    val all = tierNames.flatMap(t => tiers.getOrElse(t, Seq.empty))
    val failed = all.collect { case (k, _, _, true) => k }
    val unstable = all.collect { case (k, _, true, _) => k }
    def names(xs: Seq[String], cap: Int): String =
      (xs.take(cap).map("\"" + _ + "\"")
        ++ (if (xs.size > cap) Seq("\"+" + (xs.size - cap) + "\"") else Nil))
        .mkString("[", ",", "]")
    def build(withQueries: Boolean): String = {
      val qs =
        if (withQueries)
          main.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
        else "{}"
      val tierBits = Seq("sf1", "sf10", "sf100").flatMap { t =>
        tiers.get(t).filter(_.nonEmpty).map { rows =>
          val ff = rows.count(_._4)
          "\"" + t + "_total\":" + f"${totalOf(rows)}%.3f" +
            ",\"" + t + "_rows\":" + rows.size +
            (if (ff > 0) ",\"" + t + "_failed_n\":" + ff else "")
        }
      }.mkString(",")
      "{\"metric\":\"total\",\"value\":" + f"${totalOf(main)}%.3f" +
        ",\"unit\":\"sec\",\"queries\":" + qs +
        ",\"sf\":\"" + sfDir + "\",\"reps\":" + reps + ",\"stat\":\"median\"" +
        ",\"failed\":" + names(failed, 8) +
        ",\"unstable\":" + names(unstable, 6) +
        ",\"recert_n\":" + recertN + ",\"drift_n\":" + driftN +
        (if (incompleteTiers.isEmpty) ""
         else ",\"incomplete\":" + names(
           incompleteTiers.toArray(Array.empty[String]).toSeq.sorted, 4)) +
        partial.fold("")(t => ",\"partial\":\"" + t + "\"") +
        (if (tierBits.nonEmpty) "," + tierBits else "") +
        ",\"detail\":\"BENCH_RESULT.json\"}"
    }
    val full = build(withQueries = true)
    if (full.length <= 1600) full else build(withQueries = false)
  }

  private def parentMain(): Unit = {
    val fork = sys.env.getOrElse("SPARK_GRAFT_BENCH_FORK", "1") != "0"
    val activeTiers = tierNames.filter(t => t == "main" || tierExists(tierDir(t)))

    // drift references, resolved BEFORE the tiers run: the per-tier
    // recertify below needs them as each tier completes
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_RESULT.json")
    val driftRef = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", out)
    // second, IMMUTABLE reference: the latest per-round snapshot
    // (BENCH_r{N}.json, committed once by the driver and never
    // rewritten). The committed-file guard resets whenever
    // BENCH_RESULT.json is re-committed mid-round, so round-over-round
    // drift could hide behind a refreshed baseline (round 9's +7.7%
    // legacy drift was invisible to it). A per-round file can't be
    // reset the same way.
    val prevRef: Option[String] = sys.env.get("SPARK_GRAFT_BENCH_PREV")
      .map(p => if (p.isEmpty) None else Some(p)).getOrElse {
        val re = "BENCH_r(\\d+)\\.json".r
        Option(new java.io.File(".").listFiles()).toSeq.flatten
          .flatMap(f => f.getName match {
            case re(n) => Some(n.toInt -> f.getName)
            case _ => None
          }) match {
          case Seq() => None
          case fs => Some(fs.maxBy(_._1)._2)
        }
      }

    /** Rows of `rows` that sit >tolerance AND >driftAbs away from their
      * value in `refPath` (either sign; new rows have no reference and
      * never flag). A malformed env/file never aborts the bench. */
    def driftScanRows(refPath: String,
                      rows: Seq[(String, Double, Boolean, Boolean)]): Seq[(String, Double)] = (try {
      val driftAbs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DRIFT_ABS", "0.08").toDouble
      val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(refPath)),
        java.nio.charset.StandardCharsets.UTF_8)
      // the driver's per-round snapshot (BENCH_r{N}.json) is a WRAPPER
      // object whose bench line lives in a "tail" STRING field with
      // escaped quotes — unescaping first makes both formats scan
      val txt = raw.replace("\\\"", "\"")
      rows.collect { case (k, v, _, false) =>
        // \s* after the colon: the per-round driver snapshot
        // re-serializes the parsed line with ": " separators
        val re = ("\"" + java.util.regex.Pattern.quote(k) + "\"\\s*:\\s*(-?[0-9.]+)").r
        re.findFirstMatchIn(txt).map(_.group(1).toDouble) match {
          case Some(old) if old > 0 && math.abs(v - old) > driftAbs
              && math.abs(v - old) / old > tolerance => Some(k -> ((v - old) / old))
          case _ => None
        }
      }.flatten
    } catch { case _: Throwable => Seq.empty })

    var recertified: Seq[String] = Seq.empty

    /** Per-tier, as-it-completes recertification (round-18 verdict
      * item 1): the old single post-pass was gated on a budget the
      * suite itself consumed, so on a slow-box day the BIGGEST drifts
      * were exactly the rows never recertified (r18: 33 drift rows,
      * recertified: [], dedup_incremental +209% uncertified). Now the
      * worst-K rows over EITHER reference get one batched isolated
      * fork right after their tier's own fork returns — and past
      * budget the worst 2 still do (one bounded fork per tier; an
      * artifact whose largest drift carries no isolated evidence costs
      * more than the minutes it saves). min(run, isolated) is honest
      * because contention only ADDS time; a row slow in isolation too
      * keeps its drift flag as a real regression. */
    def recertifyTier(tier: String,
                      rows: Seq[(String, Double, Boolean, Boolean)]):
        Seq[(String, Double, Boolean, Boolean)] = {
      if (!fork) return rows
      val drifts = (driftScanRows(driftRef, rows)
          ++ prevRef.toSeq.flatMap(p => driftScanRows(p, rows)))
        .filter(_._2 > 0)
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toSeq
        .sortBy(-_._2)
      if (drifts.isEmpty) return rows
      val k = if (elapsedSec < budgetSec) recertK else 2
      if (elapsedSec >= budgetSec)
        System.err.println(s"[bench] recertify($tier): wall-clock budget ($budgetSec s) " +
          s"exhausted at $elapsedSec s — recertifying only the worst $k of ${drifts.size} drifts")
      val pick = drifts.take(k).map(_._1)
      drifts.drop(k).foreach { case (n, pct) =>
        System.err.println(f"[bench] recertify($n): +${pct * 100}%.0f%% drift left to the " +
          "post-pass (per-tier cap) — row keeps its flags if the budget runs out first")
      }
      forkTier(tier, Some(pick.mkString(","))) match {
        case Some(frag) =>
          val iso = frag.collect { case (n, v2, noisy2, false) => n -> (v2, noisy2) }.toMap
          recertified ++= pick.filter(iso.contains)
          pick.filterNot(iso.contains).foreach { n =>
            System.err.println(s"[bench] recertify($n): isolated re-run failed or missing — row keeps its flags")
          }
          rows.map {
            case (n, v1, noisy1, f1) if iso.contains(n) =>
              val (v2, noisy2) = iso(n)
              val better = math.min(v1, v2)
              System.err.println(f"[bench] recertified $n: run $v1%.3f s, isolated $v2%.3f s -> $better%.3f s")
              (n, better, noisy1 && noisy2, f1)
            case other => other
          }
        case None =>
          pick.foreach { n =>
            System.err.println(s"[bench] recertify($n): isolated re-run unavailable — row keeps its flags")
          }
          rows
      }
    }

    // per-tier results, fresh JVM each (fork mode) or one shared JVM
    // with cache drops between tiers (legacy / fork-unavailable mode)
    var byTier: Map[String, Seq[(String, Double, Boolean, Boolean)]] =
      if (fork) {
        var completed = Map.empty[String, Seq[(String, Double, Boolean, Boolean)]]
        val viaFork = activeTiers.map { t =>
          val r = forkTier(t, None, onPartial = part =>
            println(compactLine(completed + (t -> part), recertified.size, 0, partial = Some(t))))
            .map(rows => recertifyTier(t, rows))
          r.foreach { rows =>
            completed += (t -> rows)
            // cumulative re-emit AFTER the tier's recertify merge: a
            // driver kill later in the run still leaves a summary whose
            // recert_n reflects the work already done
            println(compactLine(completed, recertified.size, 0, partial = Some(t)))
          }
          t -> r
        }.toMap
        if (viaFork.values.exists(_.isEmpty))
          System.err.println("[bench] one or more tier forks failed — failed tiers report empty")
        viaFork.map { case (t, r) => t -> r.getOrElse(Seq.empty) }
      } else {
        val spark = makeSession()
        // Between tiers: drop every lingering cached/localCheckpoint
        // block (the references are gone but the ContextCleaner frees
        // blocks asynchronously) — stale storage blocks competing with
        // the next tier's shuffles is exactly the transient pressure
        // that failed one round-13 check run.
        def dropStaleCaches(): Unit = {
          spark.sqlContext.clearCache()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        }
        val r = activeTiers.map { t =>
          dropStaleCaches()
          t -> timeTier(buildTier(spark, t), None)
        }.toMap
        spark.stop()
        r
      }

    // Cross-run drift vs the COMMITTED result: per-run spread can be
    // tight while the whole run sits off the clean-day band (round 7:
    // three untouched queries drifted +29-39% under background load,
    // unstable=[] didn't catch it). A query >20% AND >0.08 s away from
    // its committed median is flagged; slower-than-committed drift also
    // marks the query unstable so the artifact can't silently record a
    // loaded-machine run as the new normal. New queries have no
    // reference and never flag.
    def allRows: Seq[(String, Double, Boolean, Boolean)] =
      tierNames.flatMap(t => byTier.getOrElse(t, Seq.empty))
    def driftScan(refPath: String): Seq[(String, Double)] =
      driftScanRows(refPath, allRows)

    // POST-PASS recertify: anything the per-tier worst-K pass left
    // behind (rows past the cap, or rows whose tier had no time), one
    // batched fork per tier, strictly budget-gated — the per-tier pass
    // above already guarantees the biggest drifts carry isolated
    // evidence, so this pass is pure refinement.
    if (fork && elapsedSec < budgetSec) {
      val slowRows = driftScan(driftRef).filter(_._2 > 0).map(_._1)
        .filterNot(recertified.contains)
      val byRecertTier = slowRows.groupBy(row =>
        tierNames.find(t => t != "main" && row.startsWith(t + "_")).getOrElse("main"))
      tierNames.filter(byRecertTier.contains).foreach { tier =>
        val rows = byRecertTier(tier)
        if (elapsedSec >= budgetSec) {
          System.err.println(s"[bench] recertify(${rows.mkString(",")}): skipped — " +
            s"wall-clock budget ($budgetSec s) exhausted at $elapsedSec s; rows keep their flags")
        } else forkTier(tier, Some(rows.mkString(","))) match {
          case Some(frag) =>
            val iso = frag.collect { case (n, v2, noisy2, false) => n -> (v2, noisy2) }.toMap
            byTier = byTier.updatedWith(tier)(_.map(_.map {
              case (n, v1, noisy1, f1) if iso.contains(n) =>
                val (v2, noisy2) = iso(n)
                val better = math.min(v1, v2)
                System.err.println(f"[bench] recertified $n: run $v1%.3f s, isolated $v2%.3f s -> $better%.3f s")
                (n, better, noisy1 && noisy2, f1)
              case other => other
            }))
            recertified ++= rows.filter(iso.contains)
            rows.filterNot(iso.contains).foreach { n =>
              System.err.println(s"[bench] recertify($n): isolated re-run failed or missing — row keeps its flags")
            }
          case None =>
            rows.foreach { n =>
              System.err.println(s"[bench] recertify($n): isolated re-run unavailable — row keeps its flags")
            }
        }
      }
    }

    val results = byTier.getOrElse("main", Seq.empty)
    val sf1Results = byTier.getOrElse("sf1", Seq.empty)
    val sf10Results = byTier.getOrElse("sf10", Seq.empty)
    val sf100Results = byTier.getOrElse("sf100", Seq.empty)

    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, false) => v }.sum
    val drifted = driftScan(driftRef)
    drifted.foreach { case (k, pct) =>
      System.err.println(f"[bench] $k: DRIFT ${pct * 100}%+.0f%% vs committed $driftRef")
    }
    // Box-level slowdown diagnosis: when MOST rows sit over the
    // committed baseline AND every auto-recertified row stayed slow in
    // its own single-row fresh JVM, the cause is the machine, not a
    // code change — name it in the artifact so a slow day stops
    // reading as thirty independent regressions (the exact forensic
    // conclusion rounds 12-15 each had to reach by hand).
    val posDrift = drifted.filter(_._2 > 0).map(_._1)
    val okRows = allRows.count(r => !r._4)
    val driftNote =
      if (fork && posDrift.size >= 8 && posDrift.size * 2 >= okRows &&
          recertified.nonEmpty && recertified.forall(posDrift.contains)) {
        System.err.println(s"[bench] drift diagnosis: ${posDrift.size}/$okRows rows over the " +
          "committed baseline and every isolated re-run stayed slow — box-level environment")
        s""","drift_note":"uniform: ${posDrift.size}/$okRows rows over the committed baseline and every single-row isolated re-run stayed slow - box-level environment, not a code regression""""
      } else ""
    // vs the immutable per-round snapshot (prevRef, resolved above):
    // report-only AND unstable-marking for slower rows, same thresholds
    val driftedPrev = prevRef.map(driftScan).getOrElse(Seq.empty)
    driftedPrev.foreach { case (k, pct) =>
      System.err.println(f"[bench] $k: DRIFT ${pct * 100}%+.0f%% vs previous round ${prevRef.get}")
    }
    val slowDrift = (drifted ++ driftedPrev).collect { case (k, pct) if pct > 0 => k }.toSet
    val flagged = (results.collect { case (k, _, true, _) => k }
        ++ slowDrift.filterNot(k => k.startsWith("sf1_") || k.startsWith("sf10_") || k.startsWith("sf100_")))
      .distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
    def pctJson(ds: Seq[(String, Double)]): String =
      ds.map { case (k, pct) => "\"" + k + f"""\":"${pct * 100}%+.0f%%"""" }
        .mkString("{", ",", "}")
    val driftJson = pctJson(drifted)
    val driftPrevJson = prevRef match {
      case Some(p) => f""","drift_vs_prev":{"ref":"$p","rows":${pctJson(driftedPrev)}}"""
      case None => ""
    }
    val broken = results.collect { case (k, _, _, true) => "\"" + k + "\"" }.mkString("[", ",", "]")
    def tierJson(tag: String, dir: String, rows: Seq[(String, Double, Boolean, Boolean)],
                 stat: Option[String]): String =
      if (rows.isEmpty) "" else {
        val q = rows.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
        val t = rows.collect { case (_, v, _, false) => v }.sum
        val u = (rows.collect { case (k, _, true, _) => k }
            ++ slowDrift.filter(_.startsWith(tag + "_")))
          .distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
        val b = rows.collect { case (k, _, _, true) => "\"" + k + "\"" }.mkString("[", ",", "]")
        val statJson = stat.fold("")(s => s""""stat":"$s",""")
        val inc = if (incompleteTiers.contains(tag)) """"incomplete":true,""" else ""
        f""","$tag":{"dir":"$dir",$statJson$inc"total":$t%.3f,"queries":$q,"unstable":$u,"failed":$b}"""
      }
    val sf1Json = tierJson("sf1", sf1Dir, sf1Results, None)
    val sf10Json = tierJson("sf10", sf10Dir, sf10Results, None)
    val sf100Json = tierJson("sf100", sf100Dir, sf100Results, Some("min"))
    val recertJson = recertified.map("\"" + _ + "\"").mkString("[", ",", "]")
    val isolatedJson = if (fork) "true" else "false"
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"stat":"median","tier_isolation":$isolatedJson,"recertified":$recertJson$driftNote,"unstable":$flagged,"failed":$broken,"drift":$driftJson$driftPrevJson$sf1Json$sf10Json$sf100Json}"""
    // the FULL detail goes only to the results file (my committed drift
    // reference); stdout gets the compact line LAST so it sits inside
    // the driver's 2000-char tail window — see compactLine's contract
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val line = compactLine(byTier, recertified.size,
      (drifted ++ driftedPrev).size, partial = None)
    System.err.println(s"[bench] stdout summary line: ${line.length} chars (tail window 2000)")
    println(line)
  }
}
