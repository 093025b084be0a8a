package graft

import graft.agg.{CofactorAggregate, MultiplyTriple, SumTriple, ToCofactor}
import graft.ring.Triple
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.call_function

/**
 * Public API: SQL function registration + Column helpers.
 *
 * SQL surface (mirrors the reference's registrations,
 * duckdb_imputation_extension.cpp:48-249, minus the 399 generated
 * arity-specific names — one generic aggregate dispatches on types):
 *
 *  - `sum_to_triple(cols…)`  fused lift+sum aggregate → triple struct
 *  - `sum_to_nb_agg(cols…)`  fused NB variant
 *  - `to_cofactor(cols…)` / `to_nb_agg(cols…)` per-row lift
 *  - `sum_triple(triple)` / `sum_nb_agg(nbagg)` aggregate over lifted rows
 *  - `multiply_triple(a, b)` / `multiply_nb_agg(a, b)` ring product
 *
 * Text/similarity kernels (all native codegen'd expressions):
 * `simhash64`, `shingle_hashes`, `minhash_signature` / `minhash_bands` /
 * `minhash_prepare`, `repetition_score`; vector math `dot_product`,
 * `vector_norm`, `cosine_similarity`, `vector_sub`, `quantize_int8`;
 * product quantization `pq_encode`, `pq_lut`, `pq_adc_dot`,
 * `pq_sdc_dot`; and the reference's SQL ML surface (`lda_train`,
 * `linreg_train`, `qda_train`, `nb_train` + the matching `*_predict`s).
 */
object Graft {

  // Weak keys: a long-lived driver cycling SparkSessions must not have
  // its dead sessions pinned by the registration cache.
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): SparkSession = {
    if (!registered.containsKey(spark)) synchronized {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("sum_to_triple", es => CofactorAggregate(es, nbMode = false), "scala_udf")
      reg.createOrReplaceTempFunction("sum_to_nb_agg", es => CofactorAggregate(es, nbMode = true), "scala_udf")
      reg.createOrReplaceTempFunction("to_cofactor", es => ToCofactor(es, nbMode = false), "scala_udf")
      reg.createOrReplaceTempFunction("to_nb_agg", es => ToCofactor(es, nbMode = true), "scala_udf")
      reg.createOrReplaceTempFunction("sum_triple", es => SumTriple(es.head), "scala_udf")
      reg.createOrReplaceTempFunction("sum_nb_agg", es => SumTriple(es.head), "scala_udf")
      reg.createOrReplaceTempFunction("multiply_triple", es => MultiplyTriple(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("multiply_nb_agg", es => MultiplyTriple(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("simhash64", es => graft.functions.SimHash64(es.head), "scala_udf")
      // literal-int argument (k, shingle width, band count, …): fail with
      // a usable message on a non-foldable or NULL argument instead of an
      // opaque eval error mid-analysis
      def intArg(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression], i: Int): Int = {
        if (!es(i).foldable)
          throw new IllegalArgumentException(
            s"argument #${i + 1} must be a literal integer, got ${es(i).sql}")
        es(i).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"argument #${i + 1} must be a literal integer, got " +
            (if (other == null) "NULL" else other.toString))
        }
      }
      reg.createOrReplaceTempFunction("shingle_hashes", es =>
        graft.functions.ShingleHashes(es(0), intArg(es, 1)), "scala_udf")
      reg.createOrReplaceTempFunction("minhash_signature", es =>
        graft.functions.MinHashSignature(es(0), intArg(es, 1), intArg(es, 2)), "scala_udf")
      reg.createOrReplaceTempFunction("minhash_bands", es =>
        graft.functions.MinHashSignature(es(0), intArg(es, 1), intArg(es, 2), intArg(es, 3)), "scala_udf")
      reg.createOrReplaceTempFunction("minhash_prepare", es =>
        graft.functions.MinHashPrepare(es(0), intArg(es, 1), intArg(es, 2), intArg(es, 3)), "scala_udf")
      reg.createOrReplaceTempFunction("chunk_text", es =>
        graft.functions.ChunkText(es(0), intArg(es, 1), intArg(es, 2)), "scala_udf")
      reg.createOrReplaceTempFunction("distinct_ngrams", es =>
        graft.functions.DistinctNgrams(es(0), intArg(es, 1)), "scala_udf")
      reg.createOrReplaceTempFunction("all_ngrams", es =>
        graft.functions.AllNgrams(es(0), intArg(es, 1)), "scala_udf")
      reg.createOrReplaceTempFunction("gopher_stats", es =>
        graft.functions.GopherStats(es.head), "scala_udf")
      reg.createOrReplaceTempFunction("repetition_score", es =>
        graft.functions.RepetitionScore(es(0), intArg(es, 1)), "scala_udf")
      reg.createOrReplaceTempFunction("token_stats", es =>
        graft.functions.TokenStats(es.head), "scala_udf")
      // term_counts(text, 'term1', 'term2', …) — the fused BM25 input
      // kernel; terms must be literal strings (the byte tables compile
      // once per expression, not per row)
      reg.createOrReplaceTempFunction("term_counts", es => {
        val terms = es.drop(1).zipWithIndex.map { case (e, i) =>
          if (!e.foldable)
            throw new IllegalArgumentException(
              s"term_counts: term #${i + 1} must be a literal string, got ${e.sql}")
          e.eval() match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.toString
            case other => throw new IllegalArgumentException(
              s"term_counts: term #${i + 1} must be a literal string, got " +
              (if (other == null) "NULL" else other.toString))
          }
        }
        graft.functions.TermCounts(es.head, terms)
      }, "scala_udf")
      // blocklist_stats(text, 'a', 'b', …) — hashed term-SET membership
      // per token (the filter-list kernel; same literal-terms contract)
      reg.createOrReplaceTempFunction("blocklist_stats", es => {
        val terms = es.drop(1).zipWithIndex.map { case (e, i) =>
          if (!e.foldable)
            throw new IllegalArgumentException(
              s"blocklist_stats: term #${i + 1} must be a literal string, got ${e.sql}")
          e.eval() match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.toString
            case other => throw new IllegalArgumentException(
              s"blocklist_stats: term #${i + 1} must be a literal string, got " +
              (if (other == null) "NULL" else other.toString))
          }
        }
        graft.functions.BlocklistStats(es.head, terms)
      }, "scala_udf")
      // the engine-portable split on the SQL surface: both are thin
      // wrappers over the Column implementations (pure built-in
      // arithmetic, codegen'd); weights must be literal doubles
      reg.createOrReplaceTempFunction("stable_hash32", es =>
        graft.operators.StableSplit.stableHash32Expr(es.head), "scala_udf")
      reg.createOrReplaceTempFunction("stable_split", es => {
        val ws = es.drop(1).zipWithIndex.map { case (e, i) =>
          if (!e.foldable)
            throw new IllegalArgumentException(
              s"stable_split: weight #${i + 1} must be a literal number, got ${e.sql}")
          e.eval() match {
            case n: Number => n.doubleValue()
            case d: org.apache.spark.sql.types.Decimal => d.toDouble // SQL 0.8 is DECIMAL
            case other => throw new IllegalArgumentException(
              s"stable_split: weight #${i + 1} must be a literal number, got " +
              (if (other == null) "NULL" else other.toString))
          }
        }
        graft.operators.StableSplit.stableSplitExpr(es.head, ws)
      }, "scala_udf")
      reg.createOrReplaceTempFunction("lang_id", es =>
        graft.functions.LangId(es.head), "scala_udf")
      reg.createOrReplaceTempFunction("stopword_ratio", es =>
        graft.functions.StopwordRatio(es(0), es(1)), "scala_udf")
      // bounded top-k (score DESC NULLS LAST, id ASC) — the map-side
      // ranking tail of every similarity search (see TopKAggregate)
      reg.createOrReplaceTempFunction("topk_by_score", es =>
        agg.TopKByScore(es(0), es(1), intArg(es, 2)), "scala_udf")
      // native embedding math (codegen'd single-loop expressions)
      reg.createOrReplaceTempFunction("dot_product", es =>
        graft.functions.DotProduct(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("vector_norm", es =>
        graft.functions.VectorNorm(es.head), "scala_udf")
      reg.createOrReplaceTempFunction("cosine_similarity", es =>
        graft.functions.CosineSimilarity(es(0), es(1)), "scala_udf")
      reg.createOrReplaceTempFunction("quantize_int8", es =>
        graft.functions.QuantizeInt8(es.head), "scala_udf")
      reg.createOrReplaceTempFunction("vector_sub", es =>
        graft.functions.VectorSub(es(0), es(1)), "scala_udf")
      // product-quantization kernels (corpus encode / query LUT / O(m) pair score)
      reg.createOrReplaceTempFunction("pq_encode", es =>
        graft.functions.PqEncode(es(0), es(1), intArg(es, 2), intArg(es, 3)), "scala_udf")
      // SMALLINT-code variant: ksub <= 32768 — the coarse quantizer past
      // 128 cells (fine PQ codes stay bytes)
      reg.createOrReplaceTempFunction("pq_encode_s", es =>
        graft.functions.PqEncode(es(0), es(1), intArg(es, 2), intArg(es, 3), wide = true), "scala_udf")
      reg.createOrReplaceTempFunction("pq_lut", es =>
        graft.functions.PqLut(es(0), es(1), intArg(es, 2), intArg(es, 3)), "scala_udf")
      reg.createOrReplaceTempFunction("pq_adc_dot", es =>
        graft.functions.PqAdcDot(es(0), es(1)), "scala_udf")
      // 5-arg form pins m/ksub (the production form — wrong geometry ->
      // NULL, never silently wrong scores); 3-arg infers ksub = sqrt
      reg.createOrReplaceTempFunction("pq_sdc_dot", es =>
        if (es.length >= 5)
          graft.functions.PqSdcDot(es(0), es(1), es(2), intArg(es, 3), intArg(es, 4))
        else graft.functions.PqSdcDot(es(0), es(1), es(2)), "scala_udf")
      // reference SQL ML surface (duckdb_imputation_extension.cpp:184-248)
      reg.createOrReplaceTempFunction("lda_train", es =>
        agg.MlSqlFunctions.LdaTrain(es), "scala_udf")
      reg.createOrReplaceTempFunction("linreg_train", es =>
        agg.MlSqlFunctions.LinRegTrain(es), "scala_udf")
      reg.createOrReplaceTempFunction("qda_train", es =>
        agg.MlSqlFunctions.PerClassTrain(es, nb = false), "scala_udf")
      reg.createOrReplaceTempFunction("nb_train", es =>
        agg.MlSqlFunctions.PerClassTrain(es, nb = true), "scala_udf")
      reg.createOrReplaceTempFunction("lda_predict", es =>
        agg.MlSqlFunctions.MlPredictExpr(es, "lda", numFlags = 1), "scala_udf")
      reg.createOrReplaceTempFunction("qda_predict", es =>
        agg.MlSqlFunctions.MlPredictExpr(es, "qda", numFlags = 1), "scala_udf")
      reg.createOrReplaceTempFunction("nb_predict", es =>
        agg.MlSqlFunctions.MlPredictExpr(es, "nb", numFlags = 1), "scala_udf")
      reg.createOrReplaceTempFunction("linreg_predict", es =>
        agg.MlSqlFunctions.MlPredictExpr(es, "linreg", numFlags = 2), "scala_udf")
      registered.put(spark, java.lang.Boolean.TRUE)
    }
    spark
  }

  /** Fused cofactor aggregate over continuous (`DoubleType`/`FloatType`)
    * and categorical (integer-typed) columns. */
  def sumTriple(cols: Column*): Column = call_function("sum_to_triple", cols: _*)
  def sumNbAgg(cols: Column*): Column = call_function("sum_to_nb_agg", cols: _*)
  def toCofactor(cols: Column*): Column = call_function("to_cofactor", cols: _*)
  def toNbAgg(cols: Column*): Column = call_function("to_nb_agg", cols: _*)
  def sumTripleOf(c: Column): Column = call_function("sum_triple", c)
  def multiplyTriple(a: Column, b: Column): Column = call_function("multiply_triple", a, b)

  /** Collect the cofactor triple of `df` over the given continuous and
    * categorical columns (one distributed aggregation job; the triple —
    * a few KB — is the only thing that reaches the driver). */
  def cofactor(df: DataFrame, num: Seq[String], cat: Seq[String], nb: Boolean = false): Triple = {
    register(df.sparkSession)
    // fast path: when `df` is a columnar scan (optionally under simple
    // filters — attr-vs-literal comparisons, contains/startsWith/
    // endsWith, IN, IS [NOT] NULL, bare boolean flags, AND/OR/NOT,
    // evaluated by the kernel as a per-batch mask) and every column is
    // a plain supported type, consume the parquet batches directly
    // (ColumnarCofactor) — identical semantics (null-skip, int→cat
    // dispatch, cardinality guard), no ColumnarToRow, no agg exchange.
    // A join, computed column, or uncompilable predicate makes the
    // harvest refuse and we fall through to the row aggregate below.
    graft.agg.ColumnarCofactor.cofactor(
      df,
      num.map(graft.agg.ColumnarCofactor.NumCol),
      cat.map(graft.agg.ColumnarCofactor.CatCol),
      nbMode = nb
    ).getOrElse {
      val cols = num.map(c => org.apache.spark.sql.functions.col(c).cast("double")) ++
        cat.map(c => org.apache.spark.sql.functions.col(c).cast("int"))
      val agg = if (nb) sumNbAgg(cols: _*) else sumTriple(cols: _*)
      tripleFromRow(df.agg(agg.as("t")).head().getStruct(0))
    }
  }

  /**
   * Cofactor triples over `df`, one per entry of `filters`, computed in
   * a SINGLE aggregation job — one scan answers what k filtered rescans
   * would (optimization guide §1.2: fix the distributed algorithm
   * first; §2.3: aggregate before you shuffle). `None` aggregates every
   * row; `Some(pred)` aggregates exactly the rows where `pred` is true.
   *
   * Filtering is implemented by NULL-masking the lifted inputs
   * (`when(pred, input)`): the cofactor aggregate's any-NULL rule skips
   * the whole row before touching its buffer, which is semantically
   * identical to aggregating `df.filter(pred)`, and the included rows
   * accumulate in the same per-partition order as the filtered scan
   * would see them — the fused triples match the separate-scan results
   * value for value. Used by the MICE delta loops, whose per-column
   * delta/refresh scans over the incomplete stratum all read the SAME
   * frame and differ only in their row predicate.
   */
  def cofactorMasked(df: DataFrame, num: Seq[String], cat: Seq[String],
                     filters: Seq[Option[Column]], nb: Boolean = false): Seq[Triple] = {
    require(filters.nonEmpty, "cofactorMasked needs at least one filter slot")
    register(df.sparkSession)
    import org.apache.spark.sql.functions.{col, when}
    val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
    val aggs = filters.zipWithIndex.map { case (f, i) =>
      val ins = f.fold(cols)(p => cols.map(c => when(p, c)))
      (if (nb) sumNbAgg(ins: _*) else sumTriple(ins: _*)).as(s"__t$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    filters.indices.map(i => tripleFromRow(row.getStruct(i)))
  }

  /**
   * Numeric-only cofactor as PLAIN codegen'd aggregates: `count(*)` +
   * k linear + k(k+1)/2 upper-triangle product SUMs, assembled into the
   * [[Triple]] driver-side. Semantically ≡ [[cofactor]] with `cat = ∅`
   * (same any-null-drops-the-row rule, enforced by the filter below, so
   * partial sums see exactly the rows the fused aggregate would lift) —
   * but where the fused aggregate runs as an ObjectHashAggregate that
   * CLOSES the whole-stage-codegen pipeline feeding it, these SUMs fuse
   * INTO it: over a shuffled-hash join the scan→join→partial-agg chain
   * is one generated loop, the shuffle carries one 8·(1+k+k(k+1)/2)-byte
   * row per partition, and the final merge is the same hash agg. Worth
   * ~2× on a wide-join cofactor (sf10 60M ⋈ 15M: the adaptive fallback's
   * ObjectHashAggregate boundary was the remaining gap vs a vectorized
   * single-node engine). Float caveat: partial-sum ORDER differs from
   * the buffer walk, so last-bit doubles can differ from [[cofactor]] —
   * callers already treat triples as ±1e-9 (`Triple.approxEquals`).
   */
  def cofactorNumeric(df: DataFrame, num: Seq[String]): Triple = {
    import org.apache.spark.sql.functions._
    val k = num.length
    val cast = num.map(c => col(c).cast("double"))
    val clean = if (k == 0) df else df.where(cast.map(_.isNotNull).reduce(_ && _))
    val aggs: Seq[Column] = count(lit(1)) +: (cast.map(sum) ++
      (for { i <- 0 until k; j <- i until k } yield sum(cast(i) * cast(j))))
    val row = clean.agg(aggs.head, aggs.tail: _*).head()
    def d(idx: Int): Double = if (row.isNullAt(idx)) 0.0 else row.getDouble(idx)
    Triple(row.getLong(0),
      Array.tabulate(k)(i => d(1 + i)),
      Array.tabulate(k * (k + 1) / 2)(i => d(1 + k + i)),
      Array.empty, Array.empty, Array.empty)
  }

  /**
   * Skew-resilient grouped cofactor: two-stage aggregation through a
   * row salt. Stage 1 aggregates on (keys, salt) — a hot key's rows
   * spread over `saltBuckets` reducers — stage 2 ring-adds the partial
   * triples per key (`Triple.add` is associative/commutative, so the
   * result is the plain grouped cofactor). Use when one group holds a
   * large share of the data and AQE's skew handling can't help (it
   * splits join partitions, not aggregation groups).
   * Returns `keys ++ [t]` with `t` the triple struct.
   */
  def cofactorGroupedSalted(df: DataFrame, keys: Seq[String],
                            num: Seq[String], cat: Seq[String],
                            saltBuckets: Int = 32, nb: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    register(df.sparkSession)
    val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
    // content-derived salt: xxhash64 over every HASHABLE column of df
    // (not just the aggregate's inputs — low-cardinality features would
    // cap a hot group's spread at their distinct-combination count)
    // makes the stage DETERMINISTIC under task retry — a fetch failure
    // re-runs one task, not the whole stage (monotonically_increasing_id
    // depends on row position, so Spark must mark the stage
    // indeterminate and recompute it wholesale). MapType-bearing columns
    // are excluded (xxhash64 rejects them at analysis); keys/num/cat are
    // primitive, so the salt inputs are never empty. Spreading is
    // bounded by the hot group's distinct hashable-row count;
    // byte-identical duplicate rows share a bucket (interchangeable
    // rows — the result is unchanged, only the spread degrades, by the
    // duplicate multiplicity).
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val saltInputs = df.schema.fields.toSeq.collect {
      case f if hashable(f.dataType) => col(f.name)
    }
    val stage1 = df
      .withColumn("__salt", pmod(xxhash64(saltInputs: _*), lit(saltBuckets.toLong)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg((if (nb) sumNbAgg(cols: _*) else sumTriple(cols: _*)).as("__t"))
    stage1.groupBy(keys.map(col): _*)
      .agg(call_function(if (nb) "sum_nb_agg" else "sum_triple", col("__t")).as("t"))
  }

  /** Deterministically free a SUPERSEDED `localCheckpoint`'s storage
    * blocks. Iterative operators (MICE loops, connected components)
    * replace their working-set checkpoint every round; relying on the
    * async ContextCleaner lets rounds × working-set copies accumulate
    * in executor storage at scale before driver GC notices. Callers
    * pass the BARE superseded checkpoint frame (plan = one LogicalRDD)
    * only after its replacement has materialized (localCheckpoint is
    * eager), so nothing can still read the dropped blocks. BLOCKING:
    * an async unpersist lets 2–3 working-set generations coexist and
    * churn the storage pool (sf10 mice_star measured 9–30 s spread
    * from exactly that); the synchronous removal costs one RPC
    * round-trip per step against gigabytes of eviction pressure. */
  private[graft] def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** True when `df`'s analyzed plan is leaf + NARROW operators only
    * (projections, filters, unions — no joins, aggregates, windows,
    * generators, sorts): re-executing it costs one scan, so iterative
    * operators skip the input checkpoint and keep the scan's bucketed
    * co-location alive downstream (a LogicalRDD checkpoint erases
    * bucket metadata and re-introduces an exchange under every join
    * and grouped aggregate over the data). */
  private[graft] def isNarrowPlan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    !df.queryExecution.analyzed.exists {
      case _: Join | _: Aggregate | _: Window | _: Generate | _: Sort |
           _: GlobalLimit | _: Distinct | _: Intersect | _: Except => true
      case _ => false
    }
  }

  /** Working-set checkpoint for iterative operators: eager
    * `localCheckpoint` at a SERIALIZED storage level
    * (`MEMORY_AND_DISK_SER` unless `spark.graft.checkpoint.storageLevel`
    * overrides). Deserialized blocks store one Java object graph per
    * row — at a 600M-row working set that is tens of GB a GENERATION,
    * and an iterative operator holds two generations at the handoff
    * (previous + replacement, released by [[dropCheckpoint]]), which
    * overflowed a 60 GB scratch disk in the sf100 MICE bench.
    * Serialized blocks are compact Tungsten bytes, and with
    * `spark.rdd.compress=true` (recommended; set in Bench/Verify and
    * the test session) they LZ4-compress on both heap and disk —
    * several × smaller on training-shaped data (near-sequential keys,
    * low-entropy measures). The deser CPU on re-read is amortized
    * against the scan/join each iteration performs anyway.
    *
    * The level is SIZE-ADAPTIVE: below ~1 GB estimated (Catalyst plan
    * stats) the generation stores DESERIALIZED (`MEMORY_AND_DISK`) —
    * at small working sets the ser+LZ4 round trip is pure overhead
    * (measured +66% on the sf0.1 `mice_1round` bench row when every
    * level was serialized), while the object-graph blowup it guards
    * against is bounded by the same small size. Unknown stats (a
    * LogicalRDD leaf without origin stats reports the session default,
    * effectively ∞) err to SERIALIZED — the safe direction at scale.
    * `spark.graft.checkpoint.storageLevel` pins either explicitly. */
  private[graft] def checkpoint(df: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val pinned = df.sparkSession.conf.get("spark.graft.checkpoint.storageLevel", "")
    val lvl =
      if (pinned.nonEmpty) StorageLevel.fromString(pinned)
      else if (df.queryExecution.optimizedPlan.stats.sizeInBytes < (1L << 30))
        StorageLevel.MEMORY_AND_DISK
      else StorageLevel.MEMORY_AND_DISK_SER
    // LAYOUT-PRESERVING, unlike the public `localCheckpoint` API: the
    // stored generation is rebuilt through `LogicalRDD.fromDataset`,
    // which rewrites the executed plan's outputPartitioning/ordering
    // onto the new leaf — `localCheckpoint` discards both (the
    // LogicalRDD reports UnknownPartitioning, certified by
    // tools/CheckpointPartitioningProbe), so every downstream join or
    // grouped aggregate on an already-clustered key paid a fresh
    // exchange. An iterative operator whose generation ends
    // hash-clustered (a groupBy, an explicit repartition(key)) now
    // hands that clustering to the next iteration for free. Blocks are
    // plain-persisted, not lineage-truncated: on eviction a partition
    // recomputes from the frozen physical plan — deterministic, and
    // strictly safer than localCheckpoint's unrecoverable-block
    // failure mode.
    // toRdd's UnsafeRows are reused per partition iterator — copy
    // before storing, exactly as the public checkpoint path does
    val internal = df.queryExecution.toRdd.map(_.copy())
    internal.persist(lvl)
    internal.count() // eager: materialize before the caller drops the previous generation
    org.apache.spark.sql.graft.ColumnBridge.datasetOverRdd(df, internal)
  }

  /** Route the last [[cofactorGrouped]] call on this thread took
    * ("columnar" = batch-kernel harvest, "row" = grouped row aggregate).
    * Set at the LIVE decision point; oracle rows and specs certify the
    * routing through this (same discipline as
    * [[graft.ml.Factorized.lastStarRouting]]). Thread-local: parallel
    * suites and concurrent sessions don't race. */
  private val lastGroupedRouteTL = new ThreadLocal[String] {
    override def initialValue(): String = ""
  }
  def lastGroupedRoute(): String = lastGroupedRouteTL.get()

  /** A [[Triple]] as an external Row matching
    * [[graft.agg.TripleCodec.dataType]]; maps emitted in sorted key
    * order and lin/quad normalized `+ 0.0`, both mirroring
    * `TripleCodec.toCatalyst` exactly — the aggregate route's output —
    * so a downstream hash/dedup over the struct can never see
    * route-dependent bytes (-0.0 vs +0.0). Map values need no
    * normalization: the ring merge never stores exact zeros. */
  def tripleToRow(t: Triple, nb: Boolean = false): Row = {
    def si(m: Map[Int, Double]) = scala.collection.immutable.TreeMap(m.toSeq: _*)
    def sl(m: Map[Long, Double]) = scala.collection.immutable.TreeMap(m.toSeq: _*)
    val lin = t.lin.toSeq.map(_ + 0.0)
    val quad = t.quad.toSeq.map(_ + 0.0)
    if (nb) Row(t.n, lin, quad, t.linCat.toSeq.map(si))
    else Row(t.n, lin, quad, t.linCat.toSeq.map(si),
      t.quadNumCat.toSeq.map(si), t.quadCat.toSeq.map(sl))
  }

  /**
   * Grouped cofactor — `GROUP BY key` with one full triple per group
   * (the reference's grouped-aggregate shape; q03's query) as a
   * `(key, t)` DataFrame. An integer-typed (int/long) or SINGLE-BYTE
   * string key (flag/status columns — probed, see below) over a bare
   * or simply-filtered scan routes through the columnar batch kernel,
   * riding as the per-class label
   * ([[graft.agg.ColumnarCofactor.cofactorPerClass]]) — the harvest's
   * structural-refusal contract is inherited, so a join, computed
   * column, unsupported key type, or uncompilable filter falls back to
   * the grouped row aggregate below. NULL keys are dropped on BOTH
   * routes (the kernel skips NULL-input rows; the row route filters
   * explicitly — a NULL group whose key unboxes to 0 is never what a
   * grouped moment wants). The kernel route is gated on ONE memoized
   * probe scan ([[graft.ml.Factorized.probeGroupedShape]]): it builds
   * one FULL buffer per group per partition and materializes every
   * group driver-side — the right plan for dimension-like keys, an
   * executor OOM for a fact-like key that is still under the 1M
   * cardinality guard. The default cap (`maxGroups` ≤ 0) is
   * BYTE-BASED: per-group buffer bytes are estimated from the probe's
   * MEASURED cat-column cardinalities (each per-group map holds at
   * most min(column cardinality, rows/group) entries — a 10k-category
   * column costs ~80 KB/group, not a flat allowance), against ~64 MB
   * of buffers per partition (the SHJ guard's budget); pass
   * `maxGroups > 0` to pin it (clamped to the kernel's cardinality
   * guard). Over-cap keys route to the distributed row aggregate,
   * which handles them natively. String keys whose probed exact max
   * byte width is ≤ 8 (NUL-free) pack base-256 into the LONG label
   * channel (`en-US` locales, 8-char SKUs; route `"columnar"`); WIDER
   * or NUL-embedded string keys under the group cap ride the kernel
   * through a DICTIONARY label instead (route `"columnar-dict"`: one
   * memoized distinct scan builds a broadcast value↔index map, each
   * row pays one hash probe — URLs, dataset names, full locales), so
   * the only string keys left to the row aggregate are genuinely
   * over-cap ones. CatShortString's mid-job fail-loud throw stays
   * reserved for cat COLUMNS a user pinned explicitly; a public GROUP
   * BY never crashes on data shape. The probe runs only on
   * structurally harvestable plans (plan-shape refusal is checked
   * first, without any scan).
   */
  def cofactorGrouped(df: DataFrame, key: String, num: Seq[String], cat: Seq[String],
                      nb: Boolean = false, maxGroups: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    register(df.sparkSession)
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val keyField = df.schema.find(f => resolver(f.name, key))
    // int AND long keys ride the kernel's LONG label channel
    // (full-range longs, no 2^32 aliasing possible); strings of ≤8
    // UTF-8 bytes pack through CatShortString (flag, lang, country,
    // locale, SKU codes); the key is emitted back in the column's
    // ORIGINAL form so the output schema never depends on which route
    // ran
    val keyType = keyField.map(_.dataType)
    val isStrKey = keyType.contains(StringType)
    val numSpecs = num.map(graft.agg.ColumnarCofactor.NumCol)
    val catSpecs = cat.map(graft.agg.ColumnarCofactor.CatCol)
    val viaKernel = groupedKernelGate(df, key, num, cat, nb, maxGroups,
        probeNulls = false)
      .flatMap { case (ls, _) => graft.agg.ColumnarCofactor.cofactorPerClassLong(
        df, numSpecs, catSpecs, ls, nbMode = nb).map(gs => (ls, gs)) }
    viaKernel match {
      case Some((ls, groups)) =>
        val dictStrings = ls match {
          case ds: graft.agg.ColumnarCofactor.CatDictString =>
            ds.dict.value.map(new String(_, java.nio.charset.StandardCharsets.UTF_8))
          case _ => null
        }
        lastGroupedRouteTL.set(if (dictStrings != null) "columnar-dict" else "columnar")
        val schema = StructType(Seq(
          StructField(keyField.get.name, keyType.get),
          StructField("t", graft.agg.TripleCodec.dataType(nb))))
        val rows: java.util.List[Row] = java.util.Arrays.asList(
          groups.map { case (k, t) =>
            val kv: Any =
              if (dictStrings != null) dictStrings(k.toInt)
              else if (isStrKey) graft.agg.ColumnarCofactor.unpackShortString(k)
              else if (keyType.get == LongType) k
              else k.toInt
            Row(kv, tripleToRow(t, nb))
          }: _*)
        df.sparkSession.createDataFrame(rows, schema)
      case None =>
        lastGroupedRouteTL.set("row")
        val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
        val agg = if (nb) sumNbAgg(cols: _*) else sumTriple(cols: _*)
        // rows with any NULL input are skipped by BOTH the row
        // aggregate and the kernel, but a group whose rows ALL carry a
        // NULL input would survive here as an empty (n=0) triple while
        // the kernel drops it — pre-filter so the two routes return
        // the same group set
        val nonNull = (key +: (num ++ cat)).map(c => col(c).isNotNull).reduce(_ && _)
        df.filter(nonNull).groupBy(col(key)).agg(agg.as("t"))
    }
  }

  /**
   * Multi-key grouped cofactor — `GROUP BY k1, k2[, k3, k4]` with one
   * full triple per key TUPLE (the `source × language` curation-cut
   * shape). The kernel route packs every key into the ONE Long label
   * channel with a fixed per-key byte budget measured by the shape
   * probe ([[graft.agg.ColumnarCofactor.CatPackedKeys]]): a string key
   * owns its exact max UTF-8 width, an int-typed key the bytes its
   * probed [0, max] range needs — ≤ 8 bytes TOTAL rides the kernel
   * (e.g. 4-byte source × 2-byte lang × a small int tier), anything
   * wider, any negative int key, NUL-embedded or >8-byte strings, or
   * an unharvestable plan falls back to the grouped row aggregate.
   * Rows with a NULL in ANY key OR any num/cat input are dropped on
   * both routes (same contract as the single-key surface) — a group
   * whose rows all carry a NULL input therefore does not appear at
   * all, on either route. Output columns carry the ORIGINAL key
   * types, so the schema never depends on the route.
   */
  def cofactorGroupedMulti(df: DataFrame, keys: Seq[String], num: Seq[String], cat: Seq[String],
                           nb: Boolean = false, maxGroups: Int = -1): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType, StructField, StructType}
    require(keys.nonEmpty, "cofactorGroupedMulti needs at least one key")
    if (keys.size == 1) return cofactorGrouped(df, keys.head, num, cat, nb, maxGroups)
    register(df.sparkSession)
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val keyFields = keys.map(k => df.schema.find(f => resolver(f.name, k))
      .getOrElse(throw new IllegalArgumentException(s"key column $k not found")))
    val numSpecs = num.map(graft.agg.ColumnarCofactor.NumCol)
    val catSpecs = cat.map(graft.agg.ColumnarCofactor.CatCol)
    val viaKernel = groupedKernelGateMulti(df, keys, num, cat, nb, maxGroups)
      .flatMap { case (ls, _) => graft.agg.ColumnarCofactor.cofactorPerClassLong(
        df, numSpecs, catSpecs, ls, nbMode = nb).map(gs => (ls, gs)) }
    viaKernel match {
      case Some((ls, groups)) =>
        lastGroupedRouteTL.set("columnar")
        val schema = StructType(
          keyFields.map(f => StructField(f.name, f.dataType)) :+
            StructField("t", graft.agg.TripleCodec.dataType(nb)))
        val rows: java.util.List[Row] = java.util.Arrays.asList(
          groups.map { case (k, t) =>
            val fields = graft.agg.ColumnarCofactor.unpackPackedKeys(k, ls.widths)
            val kvs = keyFields.zip(fields).map { case (f, v) =>
              f.dataType match {
                case StringType => graft.agg.ColumnarCofactor.unpackShortString(v)
                case LongType => v
                case IntegerType => v.toInt
                case ShortType => v.toShort
                case ByteType => v.toByte
                case other => throw new IllegalStateException(s"unreachable key type $other")
              }
            }
            Row.fromSeq(kvs :+ tripleToRow(t, nb))
          }: _*)
        df.sparkSession.createDataFrame(rows, schema)
      case None =>
        lastGroupedRouteTL.set("row")
        val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
        val agg = if (nb) sumNbAgg(cols: _*) else sumTriple(cols: _*)
        // same all-NULL-input-group pre-filter as the single-key
        // fallback: keep the kernel and row routes returning the same
        // group SET, not just the same triples on shared groups
        val nonNull = (keys ++ num ++ cat).map(c => col(c).isNotNull).reduce(_ && _)
        df.filter(nonNull).groupBy(keys.map(col): _*).agg(agg.as("t"))
    }
  }

  /** [[groupedKernelGate]] for `GROUP BY k1, k2[, …]`: every key must
    * be int-typed or string, the probe's exact per-key shapes must
    * pack into ≤ 8 bytes total ([[graft.agg.ColumnarCofactor.CatPackedKeys]]
    * byte budgets — a string key owns its max UTF-8 width, an int key
    * the bytes of its non-negative range), and the COMBINED key-tuple
    * cardinality passes the same byte-based group cap. Returns the
    * packed label spec plus the probed NULL-row bound. */
  private[graft] def groupedKernelGateMulti(df: DataFrame, keys: Seq[String],
      num: Seq[String], cat: Seq[String], nb: Boolean, maxGroups: Int,
      probeNulls: Boolean = false,
      driverGroupCap: Long = Long.MaxValue): Option[(graft.agg.ColumnarCofactor.CatPackedKeys, Long)] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    if (keys.size < 2 || keys.size > 4) return None
    val keyTypes = keys.map(k => df.schema.find(f => resolver(f.name, k)).map(_.dataType))
    if (keyTypes.exists(_.isEmpty)) return None
    val isStr = keyTypes.map(_.contains(StringType))
    val intOk = keyTypes.forall(_.exists {
      case StringType | IntegerType | LongType | ShortType | ByteType => true
      case _ => false
    })
    if (!intOk) return None
    val numSpecs = num.map(graft.agg.ColumnarCofactor.NumCol)
    val catSpecs = cat.map(graft.agg.ColumnarCofactor.CatCol)
    // plan-shape refusal first (driver-only, no scan); widths don't
    // affect harvestability, so probe-independent placeholders suffice
    val probeSpec = graft.agg.ColumnarCofactor.CatPackedKeys(keys, Seq.fill(keys.size)(1))
    if (!graft.agg.ColumnarCofactor.canHarvest(df, numSpecs, catSpecs :+ probeSpec)) return None
    // a column the schema marks non-nullable can never hold a NULL —
    // drop it from the probe's count list (fewer aggregate columns on
    // the shared shape scan; the skip is exact, not a heuristic)
    val (rows, keyCard, keyShapes, catCards, nullUB) =
      graft.ml.Factorized.probeGroupedShape(df, keys, cat, isStr,
        nullCols = if (probeNulls) ((keys ++ num) ++ cat).filter(c => schemaNullable(df, c))
                   else Seq())
    // exact per-key byte budgets from the probe
    val widths = keys.indices.map { i =>
      val sh = keyShapes(i)
      if (isStr(i)) {
        if (sh.width > 8) return None // too wide / NUL / all-NULL
        math.max(1, sh.width) // an all-empty string key still owns a byte
      } else {
        if (sh.lo < 0) return None // negative int keys don't zero-pack
        if (sh.hi < sh.lo) 1 // all-NULL key: every row is dropped anyway
        else {
          var w = 1
          while (w < 8 && sh.hi >= (1L << (8 * w))) w += 1
          w
        }
      }
    }
    if (widths.sum > 8) return None
    // same byte-based group cap as the single-key gate, with the
    // COMBINED tuple cardinality
    val rpk = rows.toDouble / math.max(1L, keyCard)
    val d = num.size
    val ePerCat = catCards.map(c => math.min(c.toDouble, rpk))
    val catBytes = ePerCat.map(_ * (64.0 + 8.0 * (d + 1))).sum +
      (if (nb) 0.0
       else (for { i <- ePerCat.indices; j <- i until ePerCat.size }
         yield math.min(ePerCat(i) * ePerCat(j), rpk) * 56.0).sum)
    val bufBytes = 8.0 * (1 + d + (if (nb) d else d * (d + 1) / 2)) + catBytes
    val groupCap: Long = math.min(driverGroupCap,
      if (maxGroups > 0)
        math.min(maxGroups.toLong, CofactorAggregate.confMaxCategories().toLong)
      else math.min(1L << 20, ((64L << 20) / math.max(1.0, bufBytes)).toLong))
    if (keyCard > groupCap) None
    else if (probeNulls && nullUB > rows / 10) None
    else Some((graft.agg.ColumnarCofactor.CatPackedKeys(keys, widths), nullUB))
  }

  /** True when the resolved schema field is nullable (or unresolved —
    * assume the worst). Used to skip null-count probe columns the
    * schema already proves clean. */
  private[graft] def schemaNullable(df: DataFrame, c: String): Boolean = {
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    df.schema.find(f => resolver(f.name, c)).forall(_.nullable)
  }

  /** Driver-output group cap for the SQL planner-strategy kernel routes
    * (`spark.graft.sqlKernel.maxDriverGroups`, default 65 536). The
    * byte-based gate above bounds EXECUTOR buffer memory; this bounds
    * what the strategy execs materialize on the DRIVER (one key tuple +
    * triple + UnsafeRow per group on a single thread — round-19 verdict
    * item 2). Past it the default distributed aggregate plans, which
    * handles any cardinality; the DataFrame API (`cofactorGrouped`)
    * keeps its own byte-based cap and is unaffected. */
  private[graft] def sqlKernelDriverGroupCap(): Long =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.sqlKernel.maxDriverGroups", "65536").toLong
    catch { case _: Throwable => 65536L }

  /** Install [[graft.plans.GroupedCofactorStrategy]] on the session's
    * experimental strategies (idempotent): SQL/DataFrame single-key
    * `GROUP BY` + `sum_to_triple`/`sum_to_nb_agg` over harvestable
    * scans then plans through the grouped columnar kernel. Opt-in by
    * design — the library's own row-aggregate parity tests and bench
    * rows construct exactly that shape on purpose; sessions created
    * with `spark.sql.extensions=graft.plans.GraftExtensions` get it
    * automatically. */
  def enableSqlGroupedKernel(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[graft.plans.GroupedCofactorStrategy]))
      spark.experimental.extraStrategies =
        cur :+ graft.plans.GroupedCofactorStrategy(spark)
  }

  /** Install the FULL kernel-routing strategy set (idempotent): the
    * grouped + flat cofactor strategy above plus the SUM/AVG/COUNT
    * moments strategy ([[graft.plans.GroupedMomentsStrategy]] — the
    * TPC-H-Q1/curation-cut shape). This is what `Bench`, `Verify`, and
    * `GraftExtensions` sessions run with, so the oracle gate certifies
    * the kernel-routed plans; bare test sessions stay row-routed so the
    * kernel-vs-row parity specs keep comparing two genuinely different
    * physical plans. */
  def enableSqlKernels(spark: SparkSession): Unit = {
    enableSqlGroupedKernel(spark)
    val cur = spark.experimental.extraStrategies
    if (!cur.exists(_.isInstanceOf[graft.plans.GroupedMomentsStrategy]))
      spark.experimental.extraStrategies =
        cur :+ graft.plans.GroupedMomentsStrategy(spark)
    // the declarative rewrite for numeric-only cofactors that FEED A
    // JOIN — the shape the grouped kernel strategy refuses by design
    // (driver materialization is wrong there); plain SUMs keep the
    // whole pipeline in codegen'd hash aggregates instead of
    // ObjectHashAggregate buffer objects
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(graft.plans.CofactorDeclarativeRewrite))
      spark.experimental.extraOptimizations =
        opts :+ graft.plans.CofactorDeclarativeRewrite
  }

  /** Kernel-route eligibility for a single-key grouped cofactor — the
    * shared gate behind [[cofactorGrouped]] and the SQL planner strategy
    * ([[graft.plans.GroupedCofactorStrategy]]). Ordered cheapest-first:
    * key-type check and plan-shape refusal are driver-only; the shape
    * probe (ONE memoized fixed-memory scan) runs only on structurally
    * harvestable plans. Returns the label spec plus the probed NULL-row
    * upper bound when every gate passes.
    *
    * `probeNulls` (the SQL surface) additionally counts NULLs in the
    * key AND every aggregated column: SQL keeps default-aggregate
    * semantics exactly (a NULL group survives; a group whose rows all
    * carry a NULL input still appears with an empty triple), both
    * shapes the kernel's skip-any-NULL-row contract cannot reproduce
    * alone — the caller routes those rows through a row-aggregate SIDE
    * CHANNEL and ring-merges. The gate refuses only when the probed
    * NULL-row bound exceeds ~10% of the table: past that the side
    * channel is no longer a remainder and the default plan is the
    * honest choice. */
  private[graft] def groupedKernelGate(df: DataFrame, key: String,
      num: Seq[String], cat: Seq[String], nb: Boolean, maxGroups: Int,
      probeNulls: Boolean,
      driverGroupCap: Long = Long.MaxValue): Option[(graft.agg.ColumnarCofactor.CatSpec, Long)] = {
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val keyType = df.schema.find(f => resolver(f.name, key)).map(_.dataType)
    val isStrKey = keyType.contains(StringType)
    val numSpecs = num.map(graft.agg.ColumnarCofactor.NumCol)
    val catSpecs = cat.map(graft.agg.ColumnarCofactor.CatCol)
    val labelSpec: Option[graft.agg.ColumnarCofactor.CatSpec] =
      if (keyType.exists(t => t == IntegerType || t == LongType))
        Some(graft.agg.ColumnarCofactor.CatCol(key))
      else if (isStrKey) Some(graft.agg.ColumnarCofactor.CatShortString(key))
      else None
    labelSpec match {
      case None => None
      // plan-shape refusal first: it is driver-only, while the shape
      // probe scans — never pay a scan for a plan the kernel was never
      // going to take
      case Some(ls) if !graft.agg.ColumnarCofactor.canHarvest(df, numSpecs, catSpecs :+ ls) =>
        None
      case Some(ls) =>
        // one cheap fixed-memory probe scan, MEMOIZED per (plan, key,
        // cats, file snapshot); ±5% HLL error only softens the cap's
        // edge (a few % more buffers), never its magnitude. Key width
        // is exact (max over the scan), so the string gate is hard.
        val (rows, keyCard, keyShapes, catCards, nullUB) =
          graft.ml.Factorized.probeGroupedShape(df, Seq(key), cat, Seq(isStrKey),
            nullCols = if (probeNulls) ((key +: num) ++ cat).filter(c => schemaNullable(df, c))
                       else Seq())
        val keyWidth = keyShapes.head.width
        val rpk = rows.toDouble / math.max(1L, keyCard)
        // measured per-group buffer estimate: packed quad + lin fixed
        // part, plus per-cat maps bounded by min(cardinality, rows per
        // group) entries — a map slot is a (d+1)-double array plus
        // entry overhead (~64 B), and non-NB cat pairs add one counter
        // per co-occurring value pair, bounded by both the cardinality
        // product and the group's row count. Order-of-magnitude gate
        // with measured inputs, not an exact bound.
        val d = num.size
        val ePerCat = catCards.map(c => math.min(c.toDouble, rpk))
        val catBytes = ePerCat.map(_ * (64.0 + 8.0 * (d + 1))).sum +
          (if (nb) 0.0
           else (for { i <- ePerCat.indices; j <- i until ePerCat.size }
             yield math.min(ePerCat(i) * ePerCat(j), rpk) * 56.0).sum)
        val bufBytes = 8.0 * (1 + d + (if (nb) d else d * (d + 1) / 2)) + catBytes
        val groupCap: Long =
          // a pinned cap is clamped to the kernel's own label-cardinality
          // guard: a pin above it would pass this gate and then throw
          // IllegalStateException MID-JOB inside the kernel instead of
          // routing to the row aggregate (which handles any cardinality)
          // no floor: the old flat-allowance gate kept max(256, …) so a
          // mis-estimate could not starve narrow aggregates, but with
          // MEASURED cat cardinalities a floor would re-admit up to 256
          // groups × multi-MB buffers — the per-partition OOM this gate
          // exists to stop. A refused tiny-group case merely takes the
          // (always-correct) row aggregate.
          math.min(driverGroupCap,
            if (maxGroups > 0)
              math.min(maxGroups.toLong, CofactorAggregate.confMaxCategories().toLong)
            else math.min(1L << 20,
              ((64L << 20) / math.max(1.0, bufBytes)).toLong))
        if (keyCard > groupCap) None
        // past ~10% NULL-bearing rows the side channel stops being a
        // remainder — the default plan is the honest choice
        else if (probeNulls && nullUB > rows / 10) None
        else if (isStrKey && keyWidth > 8)
          // too wide / NUL-embedded for base-256 packing, but the group
          // cardinality fits every kernel cap: DICTIONARY-encode the key
          // (one memoized distinct scan, broadcast ≤ cap strings) and
          // ride the kernel with the dictionary index as the label —
          // the route that removes the row-aggregate perf cliff for
          // real-world cut keys (URLs, dataset names, 'en_US.UTF-8'
          // locales). Falls through to the row aggregate only when the
          // EXACT distinct count lands over the cap the ±5% probe
          // admitted.
          groupDict(df, key, groupCap)
            .map(bc => (graft.agg.ColumnarCofactor.CatDictString(key, bc), nullUB))
        else Some((ls, nullUB))
    }
  }

  /** The sorted distinct values of string key column `key` as a
    * broadcast of UTF-8 byte arrays — [[groupedKernelGate]]'s
    * dictionary for the [[graft.agg.ColumnarCofactor.CatDictString]]
    * label route. Returns None when the exact distinct count exceeds
    * `cap` (the HLL probe under-estimated — the caller falls back to
    * the row aggregate, which handles any cardinality). Memoized with
    * the probes' (plan, tag, file-snapshot) discipline so the SQL
    * strategy's plan-time gate and execute-time re-gate share ONE
    * distinct scan and ONE broadcast; evicted entries unpersist their
    * broadcast. */
  private val dictCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
        org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, String, Long),
            org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]]]): Boolean = {
        val evict = size() > 64
        if (evict) e.getValue.unpersist(false)
        evict
      }
    })
  private def groupDict(df: DataFrame, key: String, cap: Long):
      Option[org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]]] = {
    import org.apache.spark.sql.functions.col
    val ck = (df.queryExecution.analyzed.canonicalized, "gdict:" + key,
      graft.ml.Factorized.snapshotFingerprint(df))
    val cached = dictCache.get(ck)
    if (cached != null) return Some(cached)
    val capInt = math.min(cap, Int.MaxValue - 2L).toInt
    val vals = df.select(col(key)).na.drop().distinct().take(capInt + 1)
    if (vals.length > capInt) return None
    val bytes = vals.map(_.getString(0)).sorted
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bc = df.sparkSession.sparkContext.broadcast(bytes)
    dictCache.put(ck, bc)
    Some(bc)
  }

  /** Per-class cofactors: `GROUP BY label` aggregation collected as
    * (label value, triple) pairs (the QDA/NB training input). Rows with
    * a NULL label are dropped on BOTH routes (a SQL GROUP BY would form
    * a NULL group whose key then unboxes to 0 — silently merging
    * unlabeled rows into class 0 is never what training wants). Bare
    * scans route through the columnar kernel, like [[cofactor]]. */
  def cofactorPerClass(df: DataFrame, num: Seq[String], cat: Seq[String],
                       label: String, nb: Boolean = false): Seq[(Int, Triple)] = {
    register(df.sparkSession)
    graft.agg.ColumnarCofactor.cofactorPerClass(
      df,
      num.map(graft.agg.ColumnarCofactor.NumCol),
      cat.map(graft.agg.ColumnarCofactor.CatCol),
      graft.agg.ColumnarCofactor.CatCol(label),
      nbMode = nb
    ).getOrElse {
      val cols = num.map(c => org.apache.spark.sql.functions.col(c).cast("double")) ++
        cat.map(c => org.apache.spark.sql.functions.col(c).cast("int"))
      val agg = if (nb) sumNbAgg(cols: _*) else sumTriple(cols: _*)
      df.filter(org.apache.spark.sql.functions.col(label).isNotNull)
        .groupBy(org.apache.spark.sql.functions.col(label).cast("int").as("__label"))
        .agg(agg.as("t"))
        .collect()
        .map(r => r.getInt(0) -> tripleFromRow(r.getStruct(1))).toSeq
  } }

  /** Decode a collected triple struct Row into a [[Triple]]. quad_cat
    * decodes into a TreeMap: diagonal packed keys all share
    * Long.hashCode 0 (hi^lo folds to zero), so building a HashMap from
    * a big quad_cat map would be O(m²). */
  def tripleFromRow(r: Row): Triple = {
    val nb = r.length == 4
    Triple(
      r.getLong(0),
      r.getSeq[Double](1).toArray,
      r.getSeq[Double](2).toArray,
      r.getSeq[collection.Map[Int, Double]](3).map(_.toMap).toArray,
      if (nb) Array.empty else r.getSeq[collection.Map[Int, Double]](4).map(_.toMap).toArray,
      if (nb) Array.empty
      else r.getSeq[collection.Map[Long, Double]](5)
        .map(m => scala.collection.immutable.TreeMap.from(m)).toArray
    )
  }
}
