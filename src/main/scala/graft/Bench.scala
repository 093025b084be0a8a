package graft

import graft.ml.LinReg
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Headline benchmark (driver-run per round): cofactor aggregation
  * throughput is the primary engine metric (BASELINE.md), plus the
  * factorized join, model train+impute scan, and a MICE round. Results
  * are one JSON line; work is forced with the noop sink so timings
  * include the full plan but no driver materialization. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    def li = Tables.load(spark, sfDir, "lineitem")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

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
    // entries (the per-query failure contract below), not abort the
    // whole bench before any JSON is written.
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

    // the same moments as cofactor_full / q01_pricing through the
    // columnar-batch kernel (ColumnarCofactor): no ColumnarToRow, no
    // aggregate exchange — the vs-DuckDB scan-aggregate pair rides on
    // these rows
    def columnarCofactorFull(dir: String): Unit = {
      import graft.agg.ColumnarCofactor._
      val t = cofactor(Tables.load(spark, dir, "lineitem"),
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice"), NumCol("l_discount"), NumCol("l_tax")),
        Seq(CatCol("l_linenumber"), CatYear("l_shipdate")))
      require(t.isDefined, "columnar harvest must engage on the bare lineitem scan")
    }
    def columnarPricing(dir: String): Unit = {
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
    def columnarCofactorGrouped(dir: String): Unit = {
      val g = Graft.cofactorGrouped(Tables.load(spark, dir, "lineitem"),
        "l_linenumber",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), Seq())
      require(Graft.lastGroupedRoute() == "columnar",
        "grouped harvest must engage on the bare lineitem scan")
      noop(g)
    }
    // q6-shaped filtered cofactor through the compiled-mask harvest —
    // certifies per-round that a simple filter stays on the columnar path
    def columnarCofactorFiltered(dir: String): Unit = {
      import graft.agg.ColumnarCofactor._
      val f = Tables.load(spark, dir, "lineitem").filter(
        col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01" &&
        col("l_quantity") < 30)
      val t = cofactor(f,
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice"), NumCol("l_discount"), NumCol("l_tax")),
        Seq(CatCol("l_linenumber"), CatYear("l_shipdate")))
      require(t.isDefined, "columnar harvest must engage on the filtered lineitem scan")
    }

    val benches: Seq[(String, () => Unit)] = Seq(
      "q01_pricing" -> (() => noop(SparkEntry.queries("q01_agg_pricing")(spark, sfDir))),
      "q01_columnar" -> (() => columnarPricing(sfDir)),
      "cofactor_filtered" -> (() => columnarCofactorFiltered(sfDir)),
      "cofactor_full" -> { () =>
        noop(li.withColumn("shipyear", year(col("l_shipdate")))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber"), col("shipyear")).as("t")))
      },
      "cofactor_columnar" -> (() => columnarCofactorFull(sfDir)),
      "cofactor_grouped" -> { () =>
        noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(Graft.sumTriple(
            col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
            col("l_linenumber")).as("t")))
      },
      "cofactor_grouped_columnar" -> (() => columnarCofactorGrouped(sfDir)),
      "factorized_join" -> (() => noop(SparkEntry.queries("q09_factorized_join")(spark, sfDir))),
      // what the engine actually picks for this key profile: the
      // cardinality probe sees ~4 rows/key and falls back to the plain
      // fused aggregate over the join (q09 above is the explicit
      // factorized identity — the adaptive path is the production call)
      "factorized_adaptive" -> { () =>
        graft.ml.Factorized.cofactorOverJoinAdaptive(
          li.select(col("l_orderkey").as("k"), col("l_quantity")),
          Tables.load(spark, sfDir, "orders").select(col("o_orderkey").as("k"), col("o_totalprice")),
          "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
        ()
      },
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
      "minhash_neardup" -> { () =>
        val docs = Tables.load(spark, sfDir, "documents").select(col("doc_id"), col("text"))
        val mangled = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
        noop(graft.operators.Dedup.dedupNear(
          docs.unionByName(mangled), "doc_id", "text", threshold = 0.8))
      },
      "knn_bruteforce" -> (() => noop(SparkEntry.queries("q16_knn_bruteforce")(spark, sfDir))),
      // the same brute-force kernel over the int8-quantized corpus (4×
      // smaller vectors: 64 B vs 256 B per embedding) — the 100 TB
      // memory/bandwidth lever, timed end-to-end including quantization
      "knn_int8" -> { () =>
        val emb = Tables.load(spark, sfDir, "embeddings")
          .select(col("vec_id"),
            graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
        noop(graft.operators.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 20), emb, "vec_id", "q8", "vec_id", "q8", k = 3))
      },
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
    )

    // Self-validating timing: a single pass is at the mercy of JIT, GC,
    // and machine contention (round 2's committed result recorded 4-5×
    // phantoms from a concurrent build). Median of >= `reps` passes per
    // query; if the relative spread (max-min)/median still exceeds
    // `tolerance` after `maxReps` passes, the query is flagged in the
    // output rather than silently trusted.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val maxReps = math.max(reps, sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXREPS", "5").toInt)
    // 2 warmups: the first pays JIT/codegen, the second absorbs
    // ContextCleaner churn from the first (mice's localCheckpoints made
    // the first TIMED pass a 4-5× outlier with a single warmup)
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "2").toInt
    val tolerance = sys.env.getOrElse("SPARK_GRAFT_BENCH_TOL", "0.20").toDouble
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // A pass is "noisy" only when the spread is large both relatively
    // AND absolutely — sub-second queries carry ~0.1 s scheduler jitter
    // that a pure percentage guard would flag forever, while the real
    // failure mode (round 2's 4-5× build-contention phantoms) trips both.
    val absFloor = sys.env.getOrElse("SPARK_GRAFT_BENCH_ABS", "0.30").toDouble
    def spread(xs: Seq[Double]): Double =
      if (xs.max - xs.min < absFloor) 0.0
      else (xs.max - xs.min) / math.max(median(xs), 1e-9)
    // Floor convergence for min-stat queries: the two FASTEST passes must
    // agree (relative to the floor, same absFloor waiver). Contention only
    // ADDS time, so two independent passes near the same floor certify the
    // min as the uncontended number even when other passes are inflated —
    // the property the median can't offer on a busy box (round 11's
    // driver run: all three sf100 rows unstable, cofactor +699%).
    def floorSpread(xs: Seq[Double]): Double = {
      if (xs.size < 2) return Double.MaxValue
      val s = xs.sorted
      if (s(1) - s(0) < absFloor) 0.0
      else (s(1) - s(0)) / math.max(s(0), 1e-9)
    }
    def timeSuite(suite: Seq[(String, () => Unit)],
                  repsOverride: Option[Int] = None,
                  warmupOverride: Option[Int] = None,
                  maxRepsOverride: Option[Int] = None,
                  statMin: Boolean = false): Seq[(String, Double, Boolean, Boolean)] =
      suite.map { case (name, fn) =>
        // per-tier overrides: sf100 passes run tens of seconds each, so
        // the tier trims warmups to 1 and uses min-of-reps (statMin) —
        // steady-state there is dominated by IO/scan, not JIT
        val (qReps, qWarm) = (repsOverride.getOrElse(reps), warmupOverride.getOrElse(warmups))
        val qMaxReps = maxRepsOverride.getOrElse(
          math.max(qReps, repsOverride.fold(maxReps)(r => r + 1)))
        val gate: Seq[Double] => Double = if (statMin) floorSpread else spread
        val stat: Seq[Double] => Double = if (statMin) xs => xs.min else median
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
          System.err.println(f"[bench] $name: ${stat(times)}%.3f s ${if (statMin) "min" else "median"} of ${times.size} " +
            f"(warmup ${warm.map(t => f"$t%.2f").mkString(",")})")
        // a failed query must be impossible to mistake for a fast one: its
        // value is -1 and it is excluded from the total
        (name, if (failed) -1.0 else stat(times), noisy, failed)
      }
    val results = timeSuite(benches)

    // sf1 tier (~10× the default bench data: 6M-row lineitem, 50k docs,
    // 32k vectors — tools/gen_sf1.py): the DuckDB-comparable headline
    // families at a scale factor where per-action scheduling overhead
    // (~0.3 s) stops dominating and THROUGHPUT decides the number — the
    // scale the 2×-of-baseline target is actually about. Runs only when
    // the generated data exists; names are sf1_-prefixed so the
    // cross-run drift regex can never confuse tiers.
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/root/repo/testdata-sf1")
    // Between tiers: drop every lingering cached/localCheckpoint block
    // (mice rounds checkpoint the working set; the references are gone
    // but the ContextCleaner frees blocks asynchronously). A 15 GB
    // tier's shuffles competing with stale storage blocks is exactly
    // the transient memory pressure that failed one round-13 check run
    // (factorized rows threw under an sf0.1 main tier + sf100 combo;
    // clean in isolation).
    def dropStaleCaches(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }

    dropStaleCaches()
    val sf1Results: Seq[(String, Double, Boolean, Boolean)] =
      if (!new java.io.File(sf1Dir + "/lineitem.parquet").exists()) Seq.empty
      else {
        def li1 = Tables.load(spark, sf1Dir, "lineitem")
        li1.count() // warm the 10× scan before any timed pass
        timeSuite(Seq(
          "sf1_q01_pricing" -> (() => noop(SparkEntry.queries("q01_agg_pricing")(spark, sf1Dir))),
          "sf1_cofactor_full" -> { () =>
            noop(li1.withColumn("shipyear", year(col("l_shipdate")))
              .agg(Graft.sumTriple(
                col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
                col("l_linenumber"), col("shipyear")).as("t")))
          },
          "sf1_cofactor_columnar" -> (() => columnarCofactorFull(sf1Dir)),
          "sf1_factorized_adaptive" -> { () =>
            graft.ml.Factorized.cofactorOverJoinAdaptive(
              li1.select(col("l_orderkey").as("k"), col("l_quantity")),
              Tables.load(spark, sf1Dir, "orders").select(col("o_orderkey").as("k"), col("o_totalprice")),
              "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
            ()
          },
          "sf1_window_running" -> (() => noop(SparkEntry.queries("q19_window_running")(spark, sf1Dir))),
          "sf1_text_stats" -> (() => noop(SparkEntry.queries("q10_token_stats")(spark, sf1Dir))),
          "sf1_asof_join" -> (() => noop(SparkEntry.queries("q44_asof_join")(spark, sf1Dir))),
          "sf1_range_join" -> (() => noop(SparkEntry.queries("q46_range_join")(spark, sf1Dir))),
          "sf1_minhash_neardup" -> { () =>
            val docs = Tables.load(spark, sf1Dir, "documents").select(col("doc_id"), col("text"))
            val mangled = docs.filter(col("doc_id") % 10 === 0)
              .select((col("doc_id") + lit(10000000L)).as("doc_id"),
                regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
            noop(graft.operators.Dedup.dedupNear(
              docs.unionByName(mangled), "doc_id", "text", threshold = 0.8))
          },
          "sf1_knn_bruteforce" -> (() => noop(SparkEntry.queries("q16_knn_bruteforce")(spark, sf1Dir))),
          "sf1_knn_int8" -> { () =>
            val emb = Tables.load(spark, sf1Dir, "embeddings")
              .select(col("vec_id"),
                graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
            noop(graft.operators.Similarity.bruteForceTopK(
              emb.filter(col("vec_id") < 20), emb, "vec_id", "q8", "vec_id", "q8", k = 3))
          }
        ))
      }
    // sf10 tier (60M-row lineitem, 500k docs, 320k vectors — gen_sf1.py
    // with rep=100): ONLY the families whose ≤2×-of-DuckDB claim the
    // round-9 BENCH_CONTEXT rests on (knn_int8 / as-of / fused
    // text_stats / knn brute force, measured wins or ~1× there). Keeping
    // them in the drift-guarded artifact makes a regression to the
    // headline claim visible instead of living in a hand-run table.
    // ~30 s total; runs only when the generated tier exists.
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/root/repo/testdata-sf10")
    // bucketize-once setup for the factorized_bucketed rows (untimed:
    // the one-time write is the amortized cost the pattern exists to
    // pay once per CORPUS, not per run; a fresh session re-attaches the
    // existing files with a metadata-only CREATE TABLE). A setup
    // failure skips only the bucketed rows, BENCH-failure contract.
    def bucketedPair(dir: String, tag: String, buckets: Int):
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
    def factorizedBucketed(pair: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Unit = {
      graft.ml.Factorized.cofactorOverJoinAdaptive(
        pair._1, pair._2, "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
      ()
    }
    // ONE chained-MICE round over the bucketed star (the reference's
    // Flight workload shape, train_flight.h:5-13): per-column training
    // cofactor + row-level impute-update, with the bucketize-once
    // layout carrying both the per-key aggregates and the update join —
    // the "bucketize amortizes within one training job" claim, timed
    // end-to-end. The imputed column is derived deterministically
    // (~14% missing on k % 7 == 0) so every pass imputes the same
    // stratum. Phase decomposition prints to stderr like mice_1round's.
    def miceStarRound(pair: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)): Unit = {
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
          iterations = 1), tm)
      noop(done)
      System.err.println(s"[bench] mice_star phases: $tm")
      // free the pass's FINAL 60M-row checkpoint (the chain drops its
      // intermediates deterministically) so it cannot contend with the
      // next pass — one-RDD unpersist, microseconds, unlike the earlier
      // clearCache + blocking full unpersist which measured storage
      // teardown INTO the timed row
      graft.Graft.dropCheckpoint(done)
    }
    dropStaleCaches()
    val sf10Results: Seq[(String, Double, Boolean, Boolean)] =
      if (!new java.io.File(sf10Dir + "/lineitem.parquet").exists()) Seq.empty
      else timeSuite(Seq(
        // asof FIRST in the tier: round 13's driver run measured this row
        // at 11.3 s (+801%, self-flagged unstable) sitting immediately
        // after the 60M-row mice_star working set; the same query was
        // 0.42 s at sf0.1 and 0.56 s at sf1 in the same run and no as-of
        // code had changed. Running it before any heavy row (and moving
        // the bucketed/mice rows to the END of the tier) removes the
        // storage-pool interference by construction instead of trying to
        // flush it away between rows.
        "sf10_asof_join" -> (() => noop(SparkEntry.queries("q44_asof_join")(spark, sf10Dir))),
        "sf10_text_stats" -> (() => noop(SparkEntry.queries("q10_token_stats")(spark, sf10Dir))),
        // the factorized family at sf10, both physical designs: the
        // probe-routed adaptive over raw parquet (two exchanges) vs the
        // same operator over bucketized tables (zero exchanges) — the
        // pair quantifies what bucketize-once buys the repeated-join
        // pattern at this scale
        "sf10_factorized_adaptive" -> { () =>
          graft.ml.Factorized.cofactorOverJoinAdaptive(
            Tables.load(spark, sf10Dir, "lineitem")
              .select(col("l_orderkey").as("k"), col("l_quantity")),
            Tables.load(spark, sf10Dir, "orders")
              .select(col("o_orderkey").as("k"), col("o_totalprice")),
            "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
          ()
        },
        "sf10_knn_bruteforce" -> (() => noop(SparkEntry.queries("q16_knn_bruteforce")(spark, sf10Dir))),
        "sf10_knn_int8" -> { () =>
          val emb = Tables.load(spark, sf10Dir, "embeddings")
            .select(col("vec_id"),
              graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
          noop(graft.operators.Similarity.bruteForceTopK(
            emb.filter(col("vec_id") < 20), emb, "vec_id", "q8", "vec_id", "q8", k = 3))
        }) ++
        bucketedPair(sf10Dir, "sf10", 32).map(p => Seq(
          "sf10_factorized_bucketed" -> (() => factorizedBucketed(p)),
          "sf10_mice_star_round" -> (() => miceStarRound(p)))).toSeq.flatten
      )
    // sf100 tier (600M-row lineitem, relational tables only — the
    // gen_sf1.py machinery at rep=1000, see tools/Sf100Probe): the
    // scan-aggregate ENDPOINT the vs-DuckDB story rests on (q01 2.5×,
    // cofactor 3.1×, factorized fallback — BENCH_CONTEXT's sf100 table).
    // Promoted into the drift-guarded artifact so a regression in those
    // endpoint numbers breaks the bench instead of living in hand-run
    // probe output. Passes are tens of seconds, and the 15 GB tier is
    // the one most exposed to IO contention from concurrent jobs
    // (round 11's driver run: every sf100 row unstable, cofactor +699%
    // vs steady state), so the tier reports MIN-of-reps with a
    // floor-convergence gate: passes keep running (3..6) until the two
    // fastest agree within tolerance — one pair of quiet passes
    // certifies the uncontended number no matter how inflated the
    // contended passes are. Runs only when the tier exists.
    val sf100Dir = sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/root/repo/testdata-sf100")
    dropStaleCaches()
    val sf100Results: Seq[(String, Double, Boolean, Boolean)] =
      if (!new java.io.File(sf100Dir + "/lineitem.parquet").exists()) Seq.empty
      else {
        def li100 = Tables.load(spark, sf100Dir, "lineitem")
        li100.count() // warm the scan cache path (file listing, footers)
        timeSuite(Seq(
          "sf100_q01_pricing" -> (() => noop(SparkEntry.queries("q01_agg_pricing")(spark, sf100Dir))),
          "sf100_q01_columnar" -> (() => columnarPricing(sf100Dir)),
          "sf100_cofactor_columnar" -> (() => columnarCofactorFull(sf100Dir)),
          "sf100_cofactor_grouped_columnar" -> (() => columnarCofactorGrouped(sf100Dir)),
          "sf100_cofactor_filtered" -> (() => columnarCofactorFiltered(sf100Dir)),
          "sf100_cofactor_full" -> { () =>
            noop(li100.withColumn("shipyear", year(col("l_shipdate")))
              .agg(Graft.sumTriple(
                col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
                col("l_linenumber"), col("shipyear")).as("t")))
          },
          "sf100_factorized_adaptive" -> { () =>
            graft.ml.Factorized.cofactorOverJoinAdaptive(
              li100.select(col("l_orderkey").as("k"), col("l_quantity")),
              Tables.load(spark, sf100Dir, "orders")
                .select(col("o_orderkey").as("k"), col("o_totalprice")),
              "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
            ()
          }) ++
          // the exchange-free design at the endpoint scale: the same
          // operator over 256-bucket tables — the 150M-row build takes
          // the bucketed co-located tier (per-bucket build ≤ cap)
          // instead of partition-to-fit's two full-tier re-shuffles.
          // mice_star is the reference's Flight workload
          // (train_flight.h:5-13) at the ENDPOINT scale — the
          // bucketize-once amortization claim is load-bearing exactly
          // here (600M-row fact, per-column cofactor + impute join each
          // round). LAST in the tier so its multi-GB checkpoint working
          // set cannot contaminate the scan-aggregate rows (the sf10
          // ordering lesson, round 13).
          bucketedPair(sf100Dir, "sf100", 256).map(p => Seq(
            "sf100_factorized_bucketed" -> (() => factorizedBucketed(p)),
            "sf100_mice_star_round" -> (() => miceStarRound(p)))).toSeq.flatten,
          repsOverride = Some(3), warmupOverride = Some(1),
           maxRepsOverride = Some(6), statMin = true)
      }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, false) => v }.sum
    // Cross-run drift vs the COMMITTED result: per-run spread can be
    // tight while the whole run sits off the clean-day band (round 7:
    // three untouched queries drifted +29-39% under background load,
    // unstable=[] didn't catch it). A query >20% AND >0.08 s away from
    // its committed median is flagged; slower-than-committed drift also
    // marks the query unstable so the artifact can't silently record a
    // loaded-machine run as the new normal. New queries have no
    // reference and never flag.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_RESULT.json")
    val driftRef = sys.env.getOrElse("SPARK_GRAFT_BENCH_REF", out)
    def driftScan(refPath: String): Seq[(String, Double)] = (try {
      // driftAbs parse sits INSIDE the try: the stated contract is that a
      // setup/drift failure must not abort the bench before the artifact
      // is written, and a malformed env value is exactly such a failure
      val driftAbs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DRIFT_ABS", "0.08").toDouble
      val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(refPath)),
        java.nio.charset.StandardCharsets.UTF_8)
      // the driver's per-round snapshot (BENCH_r{N}.json) is a WRAPPER
      // object whose bench line lives in a "tail" STRING field with
      // escaped quotes (\"q01_pricing\":0.365) — the bare-quote regex
      // below matched nothing against it, so round-over-round drift
      // reported an empty rows:{} in a round where a tier total doubled
      // (round-13 finding). Unescaping first makes both formats scan.
      val txt = raw.replace("\\\"", "\"")
      // ALL tiers: sf1/sf10 names are prefixed so the per-name regex
      // can never confuse a tier with its main-tier namesake
      (results ++ sf1Results ++ sf10Results ++ sf100Results).collect { case (k, v, _, false) =>
        // \s* after the colon: the per-round driver snapshot
        // (BENCH_r{N}.json) re-serializes the parsed line with ": "
        // separators, while BENCH_RESULT.json itself is compact
        val re = ("\"" + java.util.regex.Pattern.quote(k) + "\"\\s*:\\s*(-?[0-9.]+)").r
        re.findFirstMatchIn(txt).map(_.group(1).toDouble) match {
          case Some(old) if old > 0 && math.abs(v - old) > driftAbs
              && math.abs(v - old) / old > tolerance => Some(k -> ((v - old) / old))
          case _ => None
        }
      }.flatten
    } catch { case _: Throwable => Seq.empty })
    val drifted = driftScan(driftRef)
    drifted.foreach { case (k, pct) =>
      System.err.println(f"[bench] $k: DRIFT ${pct * 100}%+.0f%% vs committed $driftRef")
    }
    // Second, IMMUTABLE reference: the latest per-round snapshot
    // (BENCH_r{N}.json, committed once by the driver and never rewritten).
    // The committed-file guard above resets whenever BENCH_RESULT.json is
    // re-committed mid-round, so round-over-round drift could hide behind
    // a refreshed baseline (round 9's +7.7% legacy drift was invisible to
    // it). A per-round file can't be reset the same way. Report-only AND
    // unstable-marking for slower rows, same thresholds.
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
    val sf1Json = if (sf1Results.isEmpty) "" else {
      val q1 = sf1Results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val t1 = sf1Results.collect { case (_, v, _, false) => v }.sum
      val u1 = (sf1Results.collect { case (k, _, true, _) => k }
          ++ slowDrift.filter(_.startsWith("sf1_")))
        .distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
      val b1 = sf1Results.collect { case (k, _, _, true) => "\"" + k + "\"" }.mkString("[", ",", "]")
      f""","sf1":{"dir":"$sf1Dir","total":$t1%.3f,"queries":$q1,"unstable":$u1,"failed":$b1}"""
    }
    val sf10Json = if (sf10Results.isEmpty) "" else {
      val q10 = sf10Results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val t10 = sf10Results.collect { case (_, v, _, false) => v }.sum
      val u10 = (sf10Results.collect { case (k, _, true, _) => k }
          ++ slowDrift.filter(_.startsWith("sf10_")))
        .distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
      val b10 = sf10Results.collect { case (k, _, _, true) => "\"" + k + "\"" }.mkString("[", ",", "]")
      f""","sf10":{"dir":"$sf10Dir","total":$t10%.3f,"queries":$q10,"unstable":$u10,"failed":$b10}"""
    }
    val sf100Json = if (sf100Results.isEmpty) "" else {
      val q100 = sf100Results.map { case (k, v, _, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
      val t100 = sf100Results.collect { case (_, v, _, false) => v }.sum
      val u100 = (sf100Results.collect { case (k, _, true, _) => k }
          ++ slowDrift.filter(_.startsWith("sf100_")))
        .distinct.map("\"" + _ + "\"").mkString("[", ",", "]")
      val b100 = sf100Results.collect { case (k, _, _, true) => "\"" + k + "\"" }.mkString("[", ",", "]")
      f""","sf100":{"dir":"$sf100Dir","total":$t100%.3f,"stat":"min","queries":$q100,"unstable":$u100,"failed":$b100}"""
    }
    val json = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"stat":"median","unstable":$flagged,"failed":$broken,"drift":$driftJson$driftPrevJson$sf1Json$sf10Json$sf100Json}"""
    println(json)
    // belt-and-braces: sbt's logger can prefix stdout lines ("[info] ..."),
    // which broke round-1 parsing — also drop the line in a results file
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
