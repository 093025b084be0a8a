package graft

import graft.ml.LinReg
import graft.ring.Triple
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/**
 * Driver contract: one `queries` entry per operator from SURVEY.md §2,
 * with DuckDB-runnable oracle SQL where the semantics are
 * SQL-expressible. Column names and ordering are aliased identically on
 * both sides; floating aggregates are rounded on a scale where the
 * float64 summation-order error is far below the rounding grid
 * (sums of prices are avg-scaled first).
 */
object SparkEntry {

  private def li(s: SparkSession, dir: String): DataFrame = Tables.load(s, dir, "lineitem")

  /** events.parquet with `ts` forced to TIMESTAMP (LTZ): the file
    * annotates INT64 micros with isAdjustedToUTC=false, which Spark
    * infers as TIMESTAMP_NTZ — but `unix_micros` (= DuckDB `epoch_us`)
    * only takes LTZ, and the forced schema reads the SAME raw micros
    * without any wall-clock/timezone reinterpretation, so the two
    * engines agree on exact epoch-micros regardless of session tz. */
  private val eventsSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  // recall golden scaling shared by q45/q48: floor(hit/nTrue · 1e4) —
  // load-bearing for oracle parity (the DuckDB side hardcodes the
  // outputs), so it must be a SINGLE definition
  private def recallX1e4(hit: Long, nTrue: Long): Long =
    if (nTrue == 0) 0L else math.floor(hit.toDouble / nTrue * 10000).toLong

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_cofactor_flat")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // §2.3 relational surface: group-by aggregation with expressions
    "q01_agg_pricing" -> { (s, dir) =>
      li(s, dir).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("avg_disc_price"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // §2.1 #3 fused cofactor aggregate — continuous block, flat projection
    "q02_cofactor_flat" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir)
        .agg(Graft.sumTriple(col("l_quantity"), col("l_extendedprice"), col("l_linenumber")).as("t"))
        .select(
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.lin")(1) / col("t.n"), 2).as("avg_price"),
          round(col("t.quad")(0) / col("t.n"), 2).as("avg_qty_qty"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"),
          round(col("t.quad")(2) / col("t.n"), 2).as("avg_price_price"))
    },

    // fused cofactor with GROUP BY (partial agg + shuffle by key)
    "q03_cofactor_grouped" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir).groupBy(col("l_returnflag"))
        .agg(Graft.sumTriple(col("l_quantity"), col("l_extendedprice")).as("t"))
        .select(
          col("l_returnflag"),
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"))
        .orderBy(col("l_returnflag"))
    },

    // categorical block: lin_cat slice == per-category counts
    "q04_cofactor_cat_counts" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir)
        .agg(Graft.sumTriple(col("l_quantity"), col("l_linenumber")).as("t"))
        .select(explode(col("t.lin_cat")(0)).as(Seq("l_linenumber", "cnt")))
        .select(col("l_linenumber"), col("cnt").cast("long").as("cnt"))
        .orderBy(col("l_linenumber"))
    },

    // quad_num_cat slice == per-category numeric sums (qty integer-valued ⇒ exact)
    "q05_cofactor_numcat" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir)
        .agg(Graft.sumTriple(col("l_quantity"), col("l_linenumber")).as("t"))
        .select(explode(col("t.quad_num_cat")(0)).as(Seq("l_linenumber", "sum_qty")))
        .select(col("l_linenumber"), round(col("sum_qty"), 2).as("sum_qty"))
        .orderBy(col("l_linenumber"))
    },

    // quad_cat slice == categorical pair co-occurrence counts
    "q06_cofactor_cat_pairs" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir)
        .withColumn("shipyear", year(col("l_shipdate")))
        .agg(Graft.sumTriple(col("l_linenumber"), col("shipyear")).as("t"))
        .select(explode(col("t.quad_cat")(1)).as(Seq("k", "cnt")))
        .select(
          shiftright(col("k"), 32).cast("int").as("l_linenumber"),
          (col("k").bitwiseAND(lit(0xffffffffL))).cast("int").as("shipyear"),
          col("cnt").cast("long").as("cnt"))
        .orderBy(col("l_linenumber"), col("shipyear"))
    },

    // §2.2 #13 linreg_train on the triple vs SQL regression aggregates
    "q07_linreg_train" -> { (s, dir) =>
      val t = Graft.cofactor(li(s, dir), Seq("l_extendedprice", "l_quantity"), Seq())
      val m = LinReg.train(t, label = 0, computeVariance = false)
      import s.implicits._
      Seq((BigDecimal(m.numCoef(0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
           BigDecimal(m.intercept).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .toDF("slope", "icpt")
    },

    // §2.2 #14 linreg_predict as a Column expression, row-wise
    "q08_linreg_predict" -> { (s, dir) =>
      val data = li(s, dir)
      val t = Graft.cofactor(data, Seq("l_extendedprice", "l_quantity"), Seq())
      val m = LinReg.train(t, label = 0, computeVariance = false)
      data.select(
          col("l_orderkey"), col("l_linenumber"),
          round(LinReg.predict(m, Seq(col("l_quantity")), Seq()), 2).as("pred"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // text analysis: token statistics (pure Column expressions)
    "q10_token_stats" -> { (s, dir) =>
      // fused single-pass kernel (one tokenize + one hash pass per doc;
      // TokenStatsSpec pins field-for-field parity with the unfused
      // tokenCount/array_distinct/length expressions)
      Graft.register(s)
      Tables.load(s, dir, "documents")
        .withColumn("__ts", graft.functions.TextFunctions.tokenStats(col("text")))
        .select(col("doc_id"),
          col("__ts.n_tokens").cast("long").as("n_tokens"),
          col("__ts.n_distinct").cast("long").as("n_distinct"),
          col("__ts.n_chars").cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },

    // exact deduplication: keep smallest doc_id per (lang, source) key.
    // Project BEFORE deduping: exact() keeps whole rows via
    // min_by(struct(*)), which blocks column pruning — at scale the
    // discarded text column would otherwise be read and shuffled.
    "q11_dedup_exact" -> { (s, dir) =>
      graft.operators.Dedup.exact(
          Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
          Seq(col("lang"), col("source")), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },

    // quality scoring (length saturation × lexical diversity × punct
    // penalty); gridded with floor(x·10⁴+0.5)/10⁴ — identical float ops
    // in both engines, unlike round() on a .00005-boundary product
    "q12_quality_score" -> { (s, dir) =>
      Tables.load(s, dir, "documents").select(
          col("doc_id"),
          (floor(graft.functions.TextFunctions.qualityScoreRaw(col("text")) * 10000 + 0.5) / 10000)
            .as("quality"))
        .orderBy(col("doc_id"))
    },

    // language-id heuristic — hash-checked: the oracle replicates the
    // library's stopword tables and tie-break (max score, then max lang)
    "q13_langid_counts" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(graft.functions.TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang_pred"))
    },

    // MinHash+LSH near-dedup RECALL against exact all-pairs ground truth:
    // the corpus is documents ∪ perturbed copies (last word dropped ⇒
    // high-Jaccard near-duplicate); n_true counts pairs with exact
    // shingle-set Jaccard ≥ 0.8 by brute force (TEST HARNESS ONLY — the
    // operator itself never goes all-pairs), n_found the LSH-surfaced
    // verified pairs. At 64 hashes / 32 bands (r = 2) a true pair at
    // J ≥ 0.8 escapes every band with probability (1−0.8²)³² ≈ 7·10⁻¹⁵,
    // so recall is deterministically 1 and the oracle asserts it —
    // n_true is INDEPENDENTLY recomputed by DuckDB over shingle strings
    // (the library intersects 64-bit shingle hashes; equal modulo
    // vanishing collision probability).
    "q14_minhash_neardup" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val mangled = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
      val all = docs.unionByName(mangled).cache()
      val sh = all.select(col("doc_id"),
          array_distinct(graft.functions.TextFunctions.shingleHashes(col("text"), 3)).as("__sh"))
        .cache()
      val a = sh.select(col("doc_id").as("ida"), col("__sh").as("__sa"))
      val b = sh.select(col("doc_id").as("idb"), col("__sh").as("__sb"))
      val inter = size(array_intersect(col("__sa"), col("__sb"))).cast("double")
      val uni = size(array_union(col("__sa"), col("__sb"))).cast("double")
      val jac = when(uni === lit(0.0), lit(0.0)).otherwise(inter / uni)
      val nTrue = a.join(b, col("ida") < col("idb")).filter(jac >= 0.8).count()
      val (pairs, release) = graft.operators.Dedup.nearDuplicatePairsReleasable(
        all, "doc_id", "text", threshold = 0.8, numHashes = 64, bands = 32)
      val nFound = pairs.count()
      val nInput = all.count()
      // every output is a collected count — nothing downstream needs the
      // caches, so release them before the remaining ~40 queries run
      release(); sh.unpersist(); all.unpersist()
      val recall = if (nTrue == 0) 10000L else math.floor(nFound.toDouble / nTrue * 10000).toLong
      Seq((nInput, nTrue, nFound, recall))
        .toDF("n_input", "n_true", "n_found", "recall_x1e4")
    },

    // SimHash near-dedup recall: banded candidate generation (4 disjoint
    // 16-bit chunks) vs brute-force Hamming ≤ 3 — by pigeonhole two
    // fingerprints within distance 3 MUST agree on a chunk, so
    // n_banded == n_bruteforce exactly. The hash family is
    // library-defined, so the pair counts are frozen GOLDEN values at
    // sf0.01 (the reference's discipline, test/python/test_sum.py:22-52);
    // n_input / n_planted are independently recomputed by the oracle.
    "q15_simhash" -> { (s, dir) =>
      import s.implicits._
      Graft.register(s)
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val mangled = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
      val all = docs.unionByName(mangled).cache()
      val fp = all.select(col("doc_id"),
          graft.functions.SimHash64.simhash64(
            graft.functions.TextFunctions.tokens(lower(col("text")))).as("__fp"))
        .cache()
      val a = fp.select(col("doc_id").as("ida"), col("__fp").as("__fa"))
      val b = fp.select(col("doc_id").as("idb"), col("__fp").as("__fb"))
      val nBrute = a.join(b, col("ida") < col("idb"))
        .filter(bit_count(col("__fa").bitwiseXOR(col("__fb"))) <= 3).count()
      val banded = graft.operators.Dedup.simhashPairs(
        all, col("doc_id"), col("text"), maxDist = 3).cache()
      val nBanded = banded.count()
      val nPlantedFound = banded.filter(col("idB") === col("idA") + lit(10000000L)).count()
      val (nInput, nPlanted) = (all.count(), mangled.count())
      banded.unpersist(); fp.unpersist(); all.unpersist() // counts collected; free the caches
      Seq((nInput, nPlanted, nBrute, nBanded, nPlantedFound))
        .toDF("n_input", "n_planted", "n_bruteforce", "n_banded", "n_planted_found")
    },

    // brute-force cosine top-k ANN (exact baseline)
    "q16_knn_bruteforce" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      graft.operators.Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 20), emb,
          "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .select(col("qId"), col("cId"), col("rank").cast("long").as("rank"),
          round(col("cos"), 3).as("cos"))
        .orderBy(col("qId"), col("rank"))
    },

    // embedding near-duplicate pairs above a cosine threshold (exact)
    "q17_embedding_neardup" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 2000)
      graft.operators.Similarity.embeddingNearDupPairs(
          emb, "vec_id", "embedding", threshold = 0.35, dim = 64, nPlanes = 0)
        .select(col("idA"), col("idB"), round(col("cos"), 3).as("cos"))
        .orderBy(col("idA"), col("idB"))
    },

    // MICE imputation, hash-checked: deterministic arithmetic mask (same
    // expression evaluates identically in DuckDB), stochastic=false, one
    // imputed column with no categorical features — the observed stratum
    // never changes, so the trained model is exactly the closed-form
    // regression the oracle can compute with regr_slope/regr_intercept.
    // Exercises the full partitioned delta-triple path (static + delta −
    // subtract) with a hard oracle on the resulting imputation RMSE.
    "q18_mice_impute" -> { (s, dir) =>
      val base = li(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount").as("d_true"))
        .withColumn("miss",
          (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L)) % 1000 < 150)
        .withColumn("l_discount", when(col("miss"), lit(null)).otherwise(col("d_true")))
      val cfg = graft.mice.Mice.Config(
        contCols = Seq("l_quantity", "l_discount"), catCols = Seq(),
        imputeCont = Seq("l_discount"), imputeCat = Seq(),
        iterations = 2, stochastic = false)
      val done = graft.mice.Mice.partitioned(base, cfg)
      done.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("miss"), lit(1))).as("n_imputed"),
        round(sqrt(avg(when(col("miss"),
          pow(col("l_discount") - col("d_true"), 2)))), 4).as("rmse"))
    },

    // window functions: ranking + running aggregate per partition
    "q19_window_running" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      li(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("run_qty", sum(col("l_quantity"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("rn").cast("long").as("rn"),
          round(col("run_qty"), 2).as("run_qty"))
        .orderBy(col("l_suppkey"), col("rn"))
    },

    // set operations: UNION ALL + DISTINCT
    "q20_setops" -> { (s, dir) =>
      Tables.load(s, dir, "customer").select(col("c_nationkey").cast("int").as("nk"))
        .unionByName(Tables.load(s, dir, "supplier").select(col("s_nationkey").cast("int").as("nk")))
        .distinct()
        .orderBy(col("nk"))
    },

    // anti join: orders with no high-quantity lineitem
    "q21_antijoin" -> { (s, dir) =>
      val ords = Tables.load(s, dir, "orders")
      val hi = li(s, dir).filter(col("l_quantity") > 45)
      ords.join(hi, ords("o_orderkey") === hi("l_orderkey"), "left_anti")
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    },

    // top-k with deterministic tiebreak
    "q22_topk_orders" -> { (s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    },

    // multi-join star aggregation (broadcast dims) — revenue per nation
    "q23_star_join" -> { (s, dir) =>
      val cust = Tables.load(s, dir, "customer")
      val ords = Tables.load(s, dir, "orders")
      val nation = Tables.load(s, dir, "nation")
      li(s, dir)
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"),
          round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("avg_rev"))
        .orderBy(col("n_name"))
    },

    // §2.1 #4 multiply_triple: factorized join aggregation == aggregate over the join
    "q09_factorized_join" -> { (s, dir) =>
      Graft.register(s)
      val a = li(s, dir).groupBy(col("l_orderkey").as("k"))
        .agg(Graft.sumTriple(col("l_quantity")).as("A"))
      val b = Tables.load(s, dir, "orders").groupBy(col("o_orderkey").as("k"))
        .agg(Graft.sumTriple(col("o_totalprice")).as("B"))
      a.join(b, "k")
        .select(Graft.sumTripleOf(Graft.multiplyTriple(col("A"), col("B"))).as("t"))
        .select(
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.lin")(1) / col("t.n"), 2).as("avg_total"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_total"))
    },

    // §2.1 #5/#7 fused NB aggregate — global moments + class count slices
    "q24_nb_agg_moments" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir)
        .agg(Graft.sumNbAgg(col("l_quantity"), col("l_extendedprice"), col("l_linenumber")).as("t"))
        .select(
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.lin")(1) / col("t.n"), 2).as("avg_price"),
          round(col("t.quad")(0), 2).as("sum_qty_sq"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_price_sq"),
          size(col("t.lin_cat")(0)).cast("long").as("n_classes"))
    },

    // fused NB aggregate with GROUP BY: lin_cat slice == per-group class counts
    "q25_nb_agg_grouped" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir).groupBy(col("l_returnflag"))
        .agg(Graft.sumNbAgg(col("l_quantity"), col("l_linenumber")).as("t"))
        .select(col("l_returnflag"),
          explode(col("t.lin_cat")(0)).as(Seq("l_linenumber", "cnt")))
        .select(col("l_returnflag"), col("l_linenumber"), col("cnt").cast("long").as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linenumber"))
    },

    // §2.1 #8 multiply_nb_agg: factorized NB join == NB aggregate over the join
    "q26_nb_factorized" -> { (s, dir) =>
      Graft.register(s)
      val a = li(s, dir).groupBy(col("l_partkey").as("k"))
        .agg(Graft.sumNbAgg(col("l_quantity")).as("A"))
      val b = Tables.load(s, dir, "part").groupBy(col("p_partkey").as("k"))
        .agg(Graft.sumNbAgg(col("p_retailprice")).as("B"))
      a.join(b, "k")
        .select(call_function("sum_nb_agg", call_function("multiply_nb_agg", col("A"), col("B"))).as("t"))
        .select(
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.lin")(1) / col("t.n"), 2).as("avg_retail"),
          round(col("t.quad")(0), 2).as("sum_qty_sq"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_retail_sq"))
    },

    // §2.2 #15 lda_train: per-class discriminant coefficients vs the
    // closed-form pooled-covariance solve in SQL (2 continuous features ⇒
    // the 2×2 inverse is SQL-expressible; discount scaled ×100 keeps the
    // covariance well-conditioned so pinv == inverse to ~1e-12)
    "q27_lda_train" -> { (s, dir) =>
      val data = li(s, dir).withColumn("disc100", col("l_discount") * 100)
      val t = Graft.cofactor(data, Seq("l_quantity", "disc100"), Seq("l_linenumber"))
      val m = graft.ml.Lda.train(t, label = 0)
      import s.implicits._
      m.classes.indices.map(i =>
          (m.classes(i), m.coef(i)(0), m.coef(i)(1), m.intercepts(i)))
        .toDF("class", "coef_qty", "coef_disc", "icpt")
        .select(col("class"),
          round(col("coef_qty"), 5).as("coef_qty"),
          round(col("coef_disc"), 5).as("coef_disc"),
          round(col("icpt"), 5).as("icpt"))
        .orderBy(col("class"))
    },

    // §2.2 #16 lda_predict: argmax over class scores on every distinct
    // feature combination (lineitem has no unique row key in this data),
    // against the same closed-form model scored in SQL. Features are
    // class-shifted so the argmax margin is O(σ) — robust to last-ulp
    // float divergence — and integer-coded for deterministic output.
    "q28_lda_predict" -> { (s, dir) =>
      val data = mlPredictData(s, dir)
      val t = Graft.cofactor(data, Seq("x1", "x2"), Seq("l_linenumber"))
      val m = graft.ml.Lda.train(t, label = 0)
      mlPredictOut(data, graft.ml.Lda.predict(m, Seq(col("x1"), col("x2")), Seq()))
    },

    // §2.2 #17 qda_train: per-class quadratic form (−½Σ⁺), linear term,
    // and constant (incl. log-pseudo-det + prior) vs closed-form SQL
    "q29_qda_train" -> { (s, dir) =>
      val data = li(s, dir).withColumn("disc100", col("l_discount") * 100)
      val perClass = Graft.cofactorPerClass(
        data, Seq("l_quantity", "disc100"), Seq(), label = "l_linenumber")
      val m = graft.ml.Qda.train(perClass)
      import s.implicits._
      m.classes.indices.map(i =>
          (m.classes(i), m.quad(i)(0), m.quad(i)(1), m.quad(i)(3),
           m.linear(i)(0), m.linear(i)(1), m.consts(i)))
        .toDF("class", "q11", "q12", "q22", "l1", "l2", "cst")
        .select(col("class"),
          round(col("q11"), 5).as("q11"), round(col("q12"), 5).as("q12"),
          round(col("q22"), 5).as("q22"), round(col("l1"), 5).as("l1"),
          round(col("l2"), 5).as("l2"), round(col("cst"), 5).as("cst"))
        .orderBy(col("class"))
    },

    // §2.2 #18 qda_predict: argmax of the quadratic scores vs SQL
    "q30_qda_predict" -> { (s, dir) =>
      val data = mlPredictData(s, dir)
      val perClass = Graft.cofactorPerClass(
        data, Seq("x1", "x2"), Seq(), label = "l_linenumber")
      val m = graft.ml.Qda.train(perClass)
      mlPredictOut(data, graft.ml.Qda.predict(m, Seq(col("x1"), col("x2")), Seq()))
    },

    // §2.2 #19 nb_train (+ #5/#6 per-class NB aggregates): priors,
    // per-class Gaussian moments (with the reference's 1e-9 jitter,
    // naive_bayes.cpp:111-117) and a categorical conditional frequency
    "q31_nb_train" -> { (s, dir) =>
      val data = li(s, dir)
        .withColumn("disc100", col("l_discount") * 100)
        .withColumn("shipyear", year(col("l_shipdate")))
      val perClass = Graft.cofactorPerClass(
        data, Seq("l_quantity", "disc100"), Seq("shipyear"),
        label = "l_linenumber", nb = true)
      nbTrainOut(s, graft.ml.NaiveBayes.train(perClass))
    },

    // semi join: orders with at least one high-quantity lineitem
    "q34_semijoin" -> { (s, dir) =>
      val ords = Tables.load(s, dir, "orders")
      val hi = li(s, dir).filter(col("l_quantity") > 45)
      ords.join(hi, ords("o_orderkey") === hi("l_orderkey"), "left_semi")
        .select(col("o_orderkey"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    },

    // ROLLUP aggregation with explicit grouping-level markers (NULL
    // subtotal rows replaced by sentinels so ordering is deterministic)
    "q35_rollup" -> { (s, dir) =>
      li(s, dir).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
          coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
          col("cnt"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))
    },

    // gap-based sessionization over the events stream (30-minute gap) —
    // event time compared in integer epoch-micros on both sides
    // (events.ts is timestamp[us]; unix_micros = DuckDB epoch_us)
    "q33_sessionize" -> { (s, dir) =>
      val ev = s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t_us"))
      graft.operators.Sessionize.summary(
          ev, col("user_id"), col("t_us"), col("event_id"), maxGap = 1800000000L)
        .select(col("key").as("user_id"), col("n_sessions"),
          col("n_events"), col("max_sess_events"))
        .orderBy(col("user_id"))
    },

    // §2.2 #20 nb_predict: Gaussian NB argmax vs SQL log-likelihood scoring
    "q32_nb_predict" -> { (s, dir) =>
      val data = mlPredictData(s, dir)
      val perClass = Graft.cofactorPerClass(
        data, Seq("x1", "x2"), Seq(), label = "l_linenumber", nb = true)
      val m = graft.ml.NaiveBayes.train(perClass)
      mlPredictOut(data, graft.ml.NaiveBayes.predict(m, Seq(col("x1"), col("x2")), Seq()))
    },

    // §2.2 #16 lda_predict through the ONE-HOT DICTIONARY path: a binary
    // categorical feature joins the numeric one, so prediction scores a
    // map lookup per category (Lda.predict's typedLit dictionary). The
    // full one-hot block (LDA keeps every category) makes the pooled
    // scatter singular along (0,1,1); pinvCut resolves it, and since LDA
    // argmax is affine-invariant the oracle trains the EQUIVALENT
    // closed-form 2×2 model on [x1, 1{c=1}] — identical predictions.
    "q36_lda_predict_cat" -> { (s, dir) =>
      val data = mlCatPredictData(s, dir)
      val t = Graft.cofactor(data, Seq("x1"), Seq("l_linenumber", "c"))
      val m = graft.ml.Lda.train(t, label = 0)
      mlCatPredictOut(data, graft.ml.Lda.predict(m, Seq(col("x1")), Seq(col("c"))))
    },

    // §2.2 #18 qda_predict with a categorical feature: exercises the
    // drop-first one-hot dictionary (category 0 dropped ⇒ features
    // [x1, 1{c=1}], per-class 2×2 covariance nonsingular) through the
    // pure-Column scoring's categorical map lookups.
    "q37_qda_predict_cat" -> { (s, dir) =>
      val data = mlCatPredictData(s, dir)
      val perClass = Graft.cofactorPerClass(
        data, Seq("x1"), Seq("c"), label = "l_linenumber")
      val m = graft.ml.Qda.train(perClass)
      mlCatPredictOut(data, graft.ml.Qda.predict(m, Seq(col("x1")), Seq(col("c"))))
    },

    // §2.2 #20 nb_predict with a categorical feature: the per-class
    // conditional-frequency lookup (unseen ⇒ −∞) gets a hard signal —
    // the oracle recomputes p(c|class) from a GROUP BY and scores
    // ln(prior) + Gaussian(x1) + ln(freq) identically.
    "q38_nb_predict_cat" -> { (s, dir) =>
      val data = mlCatPredictData(s, dir)
      val perClass = Graft.cofactorPerClass(
        data, Seq("x1"), Seq("c"), label = "l_linenumber", nb = true)
      val m = graft.ml.NaiveBayes.train(perClass)
      mlCatPredictOut(data, graft.ml.NaiveBayes.predict(m, Seq(col("x1")), Seq(col("c"))))
    },

    // int8 embedding quantization (the 100 TB memory lever): the pairwise
    // dot and per-side squared norms over the quantized arrays, emitted
    // as EXACT INTEGERS. The quantized values are int8 and dim = 64, so
    // every sum stays far below 2^53 — bit-identical in any engine's
    // accumulator — where the round-3 rounded-cosine column failed on
    // the sign bit of zero (DuckDB round() → -0.0, Spark's BigDecimal
    // round → +0.0, numerically equal, hash-different). The oracle
    // replicates the floor(x·s + 0.5) grid verbatim. Norms are computed
    // once per side before the pair join (the cosine-from-norms
    // discipline of Similarity), not per pair.
    "q47_quantized_cosine" -> { (s, dir) =>
      Graft.register(s)
      val qz = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"),
          graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q"))
        .withColumn("n2", call_function("dot_product", col("q"), col("q")).cast("bigint"))
      val a = qz.select(col("vec_id").as("idA"), col("q").as("qa"), col("n2").as("na2"))
      val b = qz.select(col("vec_id").as("idB"), col("q").as("qb"), col("n2").as("nb2"))
      a.join(b, col("idA") < col("idB"))
        .select(col("idA"), col("idB"),
          call_function("dot_product", col("qa"), col("qb")).cast("bigint").as("dot"),
          col("na2"), col("nb2"))
        .orderBy(col("idA"), col("idB"))
    },

    // int8 quantization wired into the ANN search path END-TO-END (the
    // reason the operator exists): the corpus is quantized once — 4× the
    // vectors per cache line / shuffle byte — and the SAME bruteForceTopK
    // kernel searches the int8 arrays (the native vector math accepts any
    // fixed-width numeric array). Recall@3 against the float brute force
    // is the outcome: n_true is independently recomputed by DuckDB, the
    // hit count is a deterministic frozen outcome (integer arrays →
    // bit-exact cosines, ties broken by cId; q15/q45 golden discipline).
    "q48_quantized_knn" -> { (s, dir) =>
      import s.implicits._
      Graft.register(s)
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val bf = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .select(col("qId"), col("cId")).cache()
      val nTrue = bf.count()
      val qemb = emb.select(col("vec_id"),
        graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
      val q8 = graft.operators.Similarity.bruteForceTopK(
          qemb.filter(col("vec_id") < 50), qemb, "vec_id", "q8", "vec_id", "q8", k = 3)
        .select(col("qId").as("q2"), col("cId").as("c2"))
      val hit = bf.join(q8, bf("qId") === q8("q2") && bf("cId") === q8("c2")).count()
      bf.unpersist()
      Seq((nTrue, hit, recallX1e4(hit, nTrue)))
        .toDF("n_true", "int8_hit", "int8_recall_x1e4")
    },

    // dequantize error bound, corpus-wide: |x − q/s| ≤ 0.5/s for every
    // element of every vector ⟺ |x·s − q| ≤ 0.5 in grid units (scale-
    // free, so zero vectors need no special case: q=0, x·s=0). Both
    // engines replicate the identical double arithmetic; the 1e-9 slack
    // keeps the boolean stable even against a last-ulp divergence.
    "q49_dequantize_bound" -> { (s, dir) =>
      Graft.register(s)
      val qz = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          graft.operators.Quantize.quantizeInt8(col("embedding")).as("qz"))
      qz.select(
          array_max(zip_with(col("embedding"), col("qz.q"),
            (x, q) => abs(x.cast("double") * col("qz.scale") - q.cast("double"))))
            .as("gridErr"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("gridErr") > 0.5 + 1e-9, 1L).otherwise(0L)).as("n_violations"))
    },

    // range (interval) join (beyond the reference): clicks within the 5
    // minutes preceding each error event, per user — bucketized
    // equi-join + exact range filter (one shuffle per side), NEVER the
    // BroadcastNestedLoopJoin Spark would plan for a raw inequality
    // join. DuckDB's native range join is the independent ground truth.
    "q46_range_join" -> { (s, dir) =>
      val ev = s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t_us"))
      // cached: used by the range join AND the zero-count left join —
      // without it events.parquet is scanned a third time
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("t_us"),
          (col("t_us") - lit(300000000L)).as("lo"), col("t_us").as("hi"))
        .cache()
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_eid"), col("user_id"), col("t_us").as("ct"))
      val pairs = graft.operators.RangeJoin.pointInInterval(
        clicks, errors, pointTs = col("ct"), lo = col("lo"), hi = col("hi"),
        bucketWidth = 300000000L,
        pointKey = col("user_id"), intervalKey = col("user_id"))
      val counts = pairs.groupBy(col("interval.event_id").as("event_id"))
        .agg(count(lit(1)).as("n_clicks"))
      errors.select(col("event_id"))
        .join(counts, Seq("event_id"), "left")
        .select(col("event_id"), coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
        .orderBy(col("event_id"))
    },

    // ANN SCALE paths (IVF with kmeans refinement; hyperplane LSH):
    // recall@3 against the exact brute force, as one hash-checked row.
    // n_true is independently recomputed by DuckDB (its own brute-force
    // top-3 count); the hit counts are deterministic (seeded centroids /
    // hyperplanes) golden values at sf0.01 — the same frozen-outcome
    // discipline as q15. Approximate-by-design, so recall < 1 is
    // expected and PINNED, not hidden.
    "q45_ann_recall" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val bf = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .select(col("qId"), col("cId")).cache()
      val nTrue = bf.count()
      // unrefined (kmeansIters = 0, seeded-sample centroids) AND refined
      // (3 Lloyd iterations) recall side by side: refinement is
      // bit-deterministic since round 4 — ivfBuild's per-dimension means
      // accumulate in fixed-point integers, which sum exactly in any
      // partitioning/fetch order — so BOTH hit counts pin as goldens,
      // and the quality the defaults leave on the table is visible.
      def ivfHitAt(iters: Int): Long = {
        val idx = graft.operators.Similarity.ivfBuild(
          emb, "vec_id", "embedding", nCentroids = 16, kmeansIters = iters)
        val ivf = graft.operators.Similarity.ivfTopK(
            idx, queries, "vec_id", "embedding", "vec_id", "embedding", k = 3, nProbe = 4)
          .select(col("qId").as("q2"), col("cId").as("c2"))
        bf.join(ivf, bf("qId") === ivf("q2") && bf("cId") === ivf("c2")).count()
      }
      val ivfHit = ivfHitAt(0)
      val ivfRefHit = ivfHitAt(3)
      val lsh = graft.operators.Similarity.lshTopK(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding",
          k = 3, dim = 64, nPlanes = 4)
        .select(col("qId").as("q3"), col("cId").as("c3"))
      val lshHit = bf.join(lsh, bf("qId") === lsh("q3") && bf("cId") === lsh("c3")).count()
      // multi-table LSH (3 seeded hyperplane sets): the geometric-recall
      // lever a single table leaves on the table
      val lshm = graft.operators.Similarity.lshTopKSeeds(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding",
          k = 3, dim = 64, nPlanes = 4, seeds = Seq(42L, 43L, 44L))
        .select(col("qId").as("q4"), col("cId").as("c4"))
      val lshmHit = bf.join(lshm, bf("qId") === lshm("q4") && bf("cId") === lshm("c4")).count()
      bf.unpersist()
      def rec(h: Long) = recallX1e4(h, nTrue)
      Seq((nTrue, ivfHit, rec(ivfHit), ivfRefHit, rec(ivfRefHit),
          lshHit, rec(lshHit), lshmHit, rec(lshmHit)))
        .toDF("n_true", "ivf_hit", "ivf_recall_x1e4",
          "ivf_ref_hit", "ivf_ref_recall_x1e4", "lsh_hit", "lsh_recall_x1e4",
          "lshm_hit", "lshm_recall_x1e4")
    },

    // as-of join (beyond the reference; a native operator in DuckDB/kdb
    // that Spark lacks): every click matched to the latest view of the
    // same user at-or-before it — one shuffle + per-partition sort, no
    // range cross join. Checked against DuckDB's native ASOF JOIN.
    "q44_asof_join" -> { (s, dir) =>
      val ev = s.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("t_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("t_us"))
      // ties at the winning timestamp resolve to max(event_id): the
      // oracle pre-aggregates one view per (user, µs) because DuckDB's
      // ASOF JOIN picks an ARBITRARY tied row, but on the Spark side
      // rightOrder = v_eid makes the asof window's running-last pick
      // exactly the max event id at the winning timestamp — the r20
      // groupBy(user, t) pre-aggregate computed the same winner through
      // an EXTRA full exchange of the view stream (r21, guide §2.4; the
      // q44 oracle hash pins the equivalence)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("t_us").as("vt"), col("event_id").as("v_eid"))
      graft.operators.AsofJoin.asofBackward(
          clicks, views, col("user_id"), col("user_id"),
          col("t_us"), col("vt"), rightOrder = col("v_eid"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof.v_eid"), lit(-1L)).as("view_eid"),
          coalesce(col("t_us") - col("asof.vt"), lit(-1L)).as("dt_us"))
        .orderBy(col("event_id"))
    },

    // the reference's PURE-SQL ML workflow (imputation_base.cpp:46-133):
    // train and predict entirely through the registered SQL functions —
    // lda_train over a scalar-subquery triple, lda_predict splicing the
    // opaque params handle — same model/data as q28, same oracle.
    "q39_lda_sql_surface" -> { (s, dir) =>
      Graft.register(s)
      mlPredictData(s, dir).createOrReplaceTempView("mlq39")
      s.sql("""
        SELECT l_linenumber,
               CAST(round(x1*10) AS BIGINT) AS ix1,
               CAST(round(x2*50) AS BIGINT) AS ix2,
               cnt,
               lda_predict(
                 (SELECT lda_train(sum_to_triple(x1, x2, l_linenumber), 0, 0D, false)
                  FROM mlq39),
                 false, x1, x2) AS pred
        FROM (SELECT l_linenumber, x1, x2, count(*) AS cnt
              FROM mlq39 GROUP BY 1, 2, 3)
        ORDER BY l_linenumber, ix1, ix2""")
    },

    // §2.1 #1/#2 UNFUSED lift: per-row to_cofactor followed by the
    // sum_triple aggregate — must equal the fused q02 slices exactly
    // (the reference golden fused≡unfused discipline, test_sum.py:40-52)
    "q40_unfused_lift" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir)
        .select(Graft.toCofactor(
          col("l_quantity"), col("l_extendedprice"), col("l_linenumber")).as("c"))
        .agg(Graft.sumTripleOf(col("c")).as("t"))
        .select(
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.lin")(1) / col("t.n"), 2).as("avg_price"),
          round(col("t.quad")(0) / col("t.n"), 2).as("avg_qty_qty"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"),
          round(col("t.quad")(2) / col("t.n"), 2).as("avg_price_price"))
    },

    // §2.1 #11 driver-side NB ring ADD: per-class NB aggregates of two
    // disjoint halves merged with Triple.add must train the same model
    // as one aggregation of the whole — checked against the q31 oracle.
    "q42_nb_ring_add" -> { (s, dir) =>
      val data = li(s, dir)
        .withColumn("disc100", col("l_discount") * 100)
        .withColumn("shipyear", year(col("l_shipdate")))
      def half(even: Boolean) = Graft.cofactorPerClass(
        data.filter((col("l_orderkey") % 2 === 0) === even),
        Seq("l_quantity", "disc100"), Seq("shipyear"),
        label = "l_linenumber", nb = true)
      val merged = graft.ring.Triple.addPerClass(half(true), half(false))
      nbTrainOut(s, graft.ml.NaiveBayes.train(merged))
    },

    // §2.1 #10/#11 driver-side NB ring SUBTRACT: whole − odd half must
    // equal the even half (delta-maintenance algebra on NB aggregates),
    // checked against the q31 oracle filtered to the even half.
    "q43_nb_ring_subtract" -> { (s, dir) =>
      val data = li(s, dir)
        .withColumn("disc100", col("l_discount") * 100)
        .withColumn("shipyear", year(col("l_shipdate")))
      val whole = Graft.cofactorPerClass(
        data, Seq("l_quantity", "disc100"), Seq("shipyear"),
        label = "l_linenumber", nb = true)
      val odd = Graft.cofactorPerClass(
        data.filter(col("l_orderkey") % 2 =!= 0),
        Seq("l_quantity", "disc100"), Seq("shipyear"),
        label = "l_linenumber", nb = true).toMap
      val even = whole.map { case (k, t) =>
        k -> odd.get(k).map(graft.ring.Triple.subtract(t, _)).getOrElse(t)
      }.filter(_._2.n > 0).sortBy(_._1)
      nbTrainOut(s, graft.ml.NaiveBayes.train(even))
    },

    // §2.1 #5/#6 unfused NB lift: to_nb_agg + sum_nb_agg ≡ fused q24
    "q41_unfused_nb_lift" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir)
        .select(Graft.toNbAgg(
          col("l_quantity"), col("l_extendedprice"), col("l_linenumber")).as("c"))
        .agg(call_function("sum_nb_agg", col("c")).as("t"))
        .select(
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.lin")(1) / col("t.n"), 2).as("avg_price"),
          round(col("t.quad")(0), 2).as("sum_qty_sq"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_price_sq"),
          size(col("t.lin_cat")(0)).cast("long").as("n_classes"))
    },

    // transitive near-dedup CONNECTED COMPONENTS (the clustering step
    // after pair generation — q14 already oracles the real MinHash pair
    // generator): min-label propagation over an edge set chosen to be
    // (a) SQL-expressible so DuckDB can independently recompute it with
    // a recursive CTE, and (b) genuinely multi-hop — consecutive doc_ids
    // sharing a language chain into components of diameter up to ~7 at
    // sf0.01, so the fixpoint loop is actually exercised, not a
    // single-round clique collapse.
    "q50_neardup_components" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"))
      val pairs = d.select(col("doc_id").as("idA"), col("lang").as("__la"))
        .join(d.select(col("doc_id").as("idB"), col("lang").as("__lb")),
          col("idB") === col("idA") + 1 && col("__la") === col("__lb"))
        .select(col("idA"), col("idB"))
      graft.operators.Dedup.connectedComponents(pairs, maxIters = 64)
        .orderBy(col("id"))
    },

    // benchmark decontamination: docs sharing any 5-gram shingle with the
    // "benchmark" (doc_id % 37 == 0 slice) are dropped. The oracle
    // recomputes shingles as n-gram STRINGS (DuckDB has no FNV mirror),
    // so agreement here also certifies the hash path collision-free on
    // this corpus.
    "q51_decontaminate" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = docs.filter(col("doc_id") % 37 === 0)
      graft.operators.Decontaminate.clean(docs, bench, "doc_id", "text", n = 5)
        .select(col("doc_id")).orderBy(col("doc_id"))
    },

    // sequence packing: per-language token streams chunked at a 512-token
    // budget; the straddling doc goes to the earlier pack.
    "q52_pack_sequences" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("tc"))
      graft.operators.Pack.assign(d, col("lang"), col("doc_id"), col("tc"), budget = 512L)
        .orderBy(col("doc_id"))
    },

    // PII redaction: deterministic synthetic PII (email + phone + IPv4
    // derived from doc_id, identical construction in the oracle) appended
    // to every doc, then scrubbed — so every row exercises all three
    // patterns and the Java-regex vs RE2 semantics are proven equivalent.
    "q53_pii_redaction" -> { (s, dir) =>
      val id = col("doc_id").cast("string")
      val raw = concat(col("text"),
        lit(" contact user"), id, lit("@example.com or +1 (555) 010-"), id,
        lit(" at 10.0."), (col("doc_id") % 256).cast("string"), lit(".7 now"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), graft.functions.TextFunctions.redactPii(raw).as("clean"))
        .orderBy(col("doc_id"))
    },

    // within-document repetition: top-bigram fraction (native single-pass
    // expression) vs the oracle's explicit unnest + count + max/sum.
    "q54_repetition_score" -> { (s, dir) =>
      Tables.load(s, dir, "documents").select(col("doc_id"),
          round(graft.functions.TextFunctions.repetitionScore(col("text")), 6).as("rep"))
        .orderBy(col("doc_id"))
    },

    // PQ encode against the shared closed-form integer codebook
    // ([[synthCb]]): vectors are int8-quantized first (the q47 grid,
    // which DuckDB replicates verbatim), so every squared distance is an
    // exact integer and the per-subspace argmin — ties to the lowest
    // codeword id on both engines — is engine-independent. One row per
    // (vector, subspace): a full independent recompute of the
    // pq_encode kernel, not a frozen golden.
    "q55_pq_encode" -> { (s, dir) =>
      Graft.register(s)
      val cb = synthCb
      Tables.load(s, dir, "embeddings").filter(col("vec_id") < 100)
        .select(col("vec_id"),
          graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
        .select(col("vec_id"),
          posexplode(graft.operators.Pq.encode(col("q8"), cb)).as(Seq("j", "code")))
        .select(col("vec_id"), col("j").cast("long").as("j"), col("code").cast("long").as("code"))
        .orderBy(col("vec_id"), col("j"))
    },

    // ADC top-k in the exact-integer domain: int8 vectors × the integer
    // codebook make every LUT entry and every ADC sum an exact integer
    // (≤ 8·8·127·8 ≪ 2^53), so the scores hash bit-identically and the
    // ranking (adc desc, cId) is fully deterministic. DuckDB recomputes
    // the codes independently (the q55 argmin) and scores each pair as
    // dot(query, reconstruction) — mathematically ADC's Σⱼ lut[codeⱼ],
    // the identity PqSpec pins — so kernel AND ranking are both checked
    // end-to-end with no frozen outcomes.
    "q56_pq_adc_topk" -> { (s, dir) =>
      Graft.register(s)
      val cb = synthCb
      val qz = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
      val queries = qz.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qId"), graft.operators.Pq.lut(col("q8"), cb).as("__lut"))
      val corpus = qz.select(col("vec_id").as("cId"),
        graft.operators.Pq.encode(col("q8"), cb).as("__codes"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qId")).orderBy(col("adc").desc, col("cId"))
      corpus.crossJoin(broadcast(queries))
        .filter(col("qId") =!= col("cId"))
        .withColumn("adc", graft.operators.Pq.adcDot(col("__lut"), col("__codes")).cast("bigint"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("qId"), col("cId"), col("adc"), col("rank"))
        .orderBy(col("qId"), col("rank"))
    },

    // IVFADC (IVF coarse pruning + PQ/ADC fine scoring — the
    // billion-vector composition the PQ kernels exist for) recall@3 vs
    // exact brute force, q45 golden discipline: n_true independently
    // recomputed by DuckDB, hit counts frozen outcomes of the seeded,
    // fixed-point-deterministic training (partition-independence probed
    // at local[32]/32 and local[5]/7 before freezing). The near-uniform
    // synthetic embeddings are PQ's worst case, so geometry matters and
    // is pinned honestly: at m=16/ksub=128 (14 code bytes vs 256 float
    // bytes, 18×) IVFADC at nProbe=8 recovers 84/150 — matching q45's
    // IVF-flat refined 86/150 at nProbe=4 while doing O(m)=16 lookups
    // per pair instead of O(d)=64 multiplies on a corpus it never
    // re-reads floats from; at m=32 (9×) it recovers 108/150, strictly
    // beating every float path in q45 at equal-or-less per-pair work.
    // pqfull is the exhaustive-ADC ceiling (coarse-stage loss = full−p8).
    "q57_ivfadc_recall" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val bf = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .select(col("qId"), col("cId")).cache()
      val nTrue = bf.count()
      val idx = graft.operators.Similarity.ivfBuild(
        emb, "vec_id", "embedding", nCentroids = 16, kmeansIters = 3)
      val cb16 = graft.operators.Pq.train(emb, "vec_id", "embedding", dim = 64, m = 16, ksub = 128, iters = 2)
      val cb32 = graft.operators.Pq.train(emb, "vec_id", "embedding", dim = 64, m = 32, ksub = 128, iters = 2)
      def hits(df: DataFrame): Long = {
        val d = df.select(col("qId").as("q2"), col("cId").as("c2"))
        bf.join(d, bf("qId") === d("q2") && bf("cId") === d("c2")).count()
      }
      val adc4 = hits(graft.operators.Pq.ivfPqTopK(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb16, nProbe = 4))
      val adc8 = hits(graft.operators.Pq.ivfPqTopK(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb16, nProbe = 8))
      val wide8 = hits(graft.operators.Pq.ivfPqTopK(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb32, nProbe = 8))
      val full = hits(graft.operators.Pq.topK(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb16))
      bf.unpersist()
      def rec(h: Long) = recallX1e4(h, nTrue)
      Seq((nTrue, adc4, rec(adc4), adc8, rec(adc8), wide8, rec(wide8), full, rec(full)))
        .toDF("n_true", "ivfadc4_hit", "ivfadc4_recall_x1e4",
          "ivfadc8_hit", "ivfadc8_recall_x1e4",
          "ivfadc_wide_hit", "ivfadc_wide_recall_x1e4",
          "pqfull_hit", "pqfull_recall_x1e4")
    },

    // RESIDUAL IVFADC (the paper's actual method, Jégou TPAMI 2011
    // §IV-A: PQ-encode x − μ_cell instead of x) vs q57's flat variant,
    // same q45/q57 golden discipline. The lever is the SMALL bit
    // budget: at m=8/ksub=16 (8 one-byte codes, 32 bits/vector — the
    // geometry a 100 TB corpus actually wants) residual recall@3 is
    // 27/150 at nProbe=4 vs flat's 20/150 (+35% relative) because
    // residuals are tight around the centroid so the same codes carry
    // within-cell structure. At m=16/ksub=128 residual ties flat
    // (84/150 — on near-uniform data weak cells make residuals ≈ the
    // full vectors), pinned honestly rather than hidden.
    "q58_residual_ivfadc_recall" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val bf = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .select(col("qId"), col("cId")).cache()
      val nTrue = bf.count()
      val idx = graft.operators.Similarity.ivfBuild(
        emb, "vec_id", "embedding", nCentroids = 16, kmeansIters = 3)
      def hits(df: DataFrame): Long = {
        val d = df.select(col("qId").as("q2"), col("cId").as("c2"))
        bf.join(d, bf("qId") === d("q2") && bf("cId") === d("c2")).count()
      }
      val res8cb = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = 2)
      val res8p4 = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, res8cb, nProbe = 4))
      val res8p8 = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, res8cb, nProbe = 8))
      val res16cb = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 16, ksub = 128, iters = 2)
      val res16p8 = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, res16cb, nProbe = 8))
      bf.unpersist()
      def rec(h: Long) = recallX1e4(h, nTrue)
      Seq((nTrue, res8p4, rec(res8p4), res8p8, rec(res8p8), res16p8, rec(res16p8)))
        .toDF("n_true", "res8p4_hit", "res8p4_recall_x1e4",
          "res8p8_hit", "res8p8_recall_x1e4",
          "res16p8_hit", "res16p8_recall_x1e4")
    },

    // SDC (symmetric distance) pair scoring over codes alone — the
    // q55/q56 exact-integer discipline: int8 vectors × the closed-form
    // integer codebook make every codeword-dot-table entry and every
    // SDC sum an exact integer. DuckDB recomputes the codes (q55
    // argmin), reassembles both reconstructions, and scores each pair
    // as their inner product — mathematically identical to the
    // kernel's Σⱼ table[(j·ksub+aⱼ)·ksub+bⱼ] (the identity PqSpec
    // pins) — so the encoded-pair scoring path is fully
    // independently checked with zero frozen values.
    "q59_pq_sdc_pairs" -> { (s, dir) =>
      Graft.register(s)
      val cb = synthCb
      val tableLit = typedLit(cb.sdcTable.toSeq)
      val qz = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 40)
        .select(col("vec_id"),
          graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))
        .select(col("vec_id"), graft.operators.Pq.encode(col("q8"), cb).as("codes"))
      val a = qz.select(col("vec_id").as("idA"), col("codes").as("ca"))
      val b = qz.select(col("vec_id").as("idB"), col("codes").as("cb"))
      a.join(b, col("idA") < col("idB"))
        .select(col("idA"), col("idB"),
          graft.operators.Pq.sdcDot(tableLit, col("ca"), col("cb")).cast("bigint").as("sdc"))
        .orderBy(col("idA"), col("idB"))
    },

    // Semantic dedup over codes alone (SemDeDup shape): SDC pairs ≥
    // threshold → transitive component collapse → min-id survivors.
    // Exact-integer SDC and norms (the q55/q59 synthetic-codebook
    // discipline) with the division replicated in the same IEEE order
    // on both engines; threshold 0.55 probed: nearest pair cos sits
    // 3.8e-4 away (no boundary risk) and the largest component has 7
    // members (min-label propagation converges far under maxIters).
    // DuckDB independently recomputes codes, reconstructions, pairs,
    // and components (recursive CTE, the q50 pattern) — the whole
    // pipeline checked end-to-end with zero frozen values.
    "q60_semantic_dedup" -> { (s, dir) =>
      Graft.register(s)
      val cb = synthCb
      val codes = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 300)
        .select(col("vec_id").as("cId"), lit(0).as("cent"),
          graft.operators.Pq.encode(
            graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q"), cb).as("codes"))
      graft.operators.Pq.semanticDedupEncoded(codes, cb, 0.55)
        .select(col("cId").as("vec_id"))
        .orderBy(col("vec_id"))
    },

    // k-NN graph over codes (the clustering backbone): single cell so
    // DuckDB's all-pairs recompute covers every candidate; ranked by
    // the SDC cosine (bit-identical division on both engines), emitted
    // as exact integers only — sdc numerator and rank, never the
    // double.
    "q61_knn_graph" -> { (s, dir) =>
      Graft.register(s)
      val cb = synthCb
      val codes = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 60)
        .select(col("vec_id").as("cId"), lit(0).as("cent"),
          graft.operators.Pq.encode(
            graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q"), cb).as("codes"))
      val graph = graft.operators.Pq.knnGraphEncoded(codes, cb, k = 3)
      val withCodes = graph.join(codes.select(col("cId").as("qId"), col("codes").as("__qc")), "qId")
        .join(codes.select(col("cId"), col("codes").as("__cc")), "cId")
      val tableLit = typedLit(cb.sdcTable.toSeq)
      withCodes.select(col("qId"), col("cId"),
          graft.operators.Pq.sdcDot(tableLit, col("__qc"), col("__cc")).cast("bigint").as("sdc"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("qId"), col("rank"))
    },

    // OPQ-lite rotated-residual IVFADC (Ge et al. CVPR 2013, the
    // random-rotation baseline) at q58's 32-bit geometry (m=8, ksub=16):
    // a seeded orthonormal rotation decorrelates the residual subspaces
    // before quantization. Pinned outcome: 29/150 @nProbe=4 and 34/150
    // @nProbe=8 vs unrotated q58's 27/29 — a modest but real lift on
    // this near-uniform corpus (rotation pays most on correlated /
    // variance-skewed dimensions; rotation seed 44 of {42..45} probed,
    // spread 27-29 / 28-34). Same golden discipline as q57/q58: n_true
    // recomputed by DuckDB, hit counts frozen outcomes of the
    // bit-deterministic seeded build, partition-independence probed.
    "q63_opq_rotation_recall" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val bf = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .select(col("qId"), col("cId")).cache()
      val nTrue = bf.count()
      val idx = graft.operators.Similarity.ivfBuild(
        emb, "vec_id", "embedding", nCentroids = 16, kmeansIters = 3)
      def hits(df: DataFrame): Long = {
        val d = df.select(col("qId").as("q2"), col("cId").as("c2"))
        bf.join(d, bf("qId") === d("q2") && bf("cId") === d("c2")).count()
      }
      val rot = Some(graft.operators.Pq.rotation(64, seed = 44L))
      val cb = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = 2, rot = rot)
      val p4 = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb, nProbe = 4, rot = rot))
      val p8 = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb, nProbe = 8, rot = rot))
      bf.unpersist()
      def rec(h: Long) = recallX1e4(h, nTrue)
      Seq((nTrue, p4, rec(p4), p8, rec(p8)))
        .toDF("n_true", "rot8p4_hit", "rot8p4_recall_x1e4",
          "rot8p8_hit", "rot8p8_recall_x1e4")
    },

    // Flight-style multi-table MICE (the reference paper's workload
    // shape, factorized_imputation_flight.h:6-8): impute the fact-side
    // l_discount from l_quantity (fact) AND o_totalprice (dimension) —
    // the training cofactor is computed FACTORIZED over
    // lineitem ⋈ orders (per-key triples + ring product, the join never
    // materialized); only the missing stratum is joined wide for
    // prediction. q18 discipline: deterministic arithmetic mask,
    // non-stochastic, so the trained model is exactly the closed-form
    // 2-regressor least squares the oracle solves by Cramer's rule.
    "q62_flight_mice_join" -> { (s, dir) =>
      Graft.register(s)
      val fact = li(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("l_discount").cast("double").as("d_true"))
        .withColumn("miss",
          (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L)) % 1000 < 150)
        .withColumn("l_discount", when(col("miss"), lit(null)).otherwise(col("d_true")))
      val dim = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      val done = graft.mice.MiceJoin.imputeContOverJoin(
        fact, dim, key = "l_orderkey", target = "l_discount",
        factNum = Seq("l_quantity"), dimNum = Seq("o_totalprice"))
      done.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("miss"), lit(1))).as("n_imputed"),
        round(sqrt(avg(when(col("miss"),
          pow(col("l_discount") - col("d_true"), 2)))), 4).as("rmse"))
    },

    // CHAINED multi-column MICE over the join (q62 one column up — the
    // full Flight workload loop): TWO fact-side columns imputed in one
    // chained round, each trained factorized over lineitem ⋈ orders with
    // the OTHER column among the features, so step 2's training data
    // contains step 1's imputations (the chain, visible in the oracle:
    // its second Cramer solve reads the first's predictions). q62
    // discipline throughout — deterministic arithmetic masks (disjoint
    // hashes), non-stochastic, normalize=true, closed-form DuckDB
    // least-squares comparator per step, RMSE rounded to 4dp.
    "q64_chained_mice_join" -> { (s, dir) =>
      Graft.register(s)
      val fact = li(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_discount").cast("double").as("d_true"),
          col("l_tax").cast("double").as("t_true"))
        .withColumn("miss_d",
          (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L)) % 1000 < 150)
        .withColumn("miss_t",
          (col("l_orderkey") * lit(7919L) + col("l_linenumber") * lit(104729L)) % 1000 < 150)
        .withColumn("l_discount", when(col("miss_d"), lit(null)).otherwise(col("d_true")))
        .withColumn("l_tax", when(col("miss_t"), lit(null)).otherwise(col("t_true")))
      val dim = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"))
      val done = graft.mice.MiceJoin.imputeChainedOverJoin(fact, dim, "l_orderkey",
        graft.mice.MiceJoin.ChainConfig(
          factNum = Seq("l_discount", "l_tax"), factCat = Seq(),
          dimNum = Seq("o_totalprice"),
          imputeCont = Seq("l_discount", "l_tax"), iterations = 1))
      done.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("miss_d"), lit(1))).as("n_imputed_d"),
        count(when(col("miss_t"), lit(1))).as("n_imputed_t"),
        round(sqrt(avg(when(col("miss_d"),
          pow(col("l_discount") - col("d_true"), 2)))), 4).as("rmse_d"),
        round(sqrt(avg(when(col("miss_t"),
          pow(col("l_tax") - col("t_true"), 2)))), 4).as("rmse_t"))
    },

    // Non-parametric OPQ (Ge CVPR 2013 Alg. 1: alternating per-subspace
    // k-means + Procrustes rotation updates over the seeded residual
    // sample) on q63's exact build — same IVF index, same 32 bits/vector
    // (m=8, ksub=16). The ladder these three pinned rows climb at
    // nProbe=8: identity 29 < random 34 (q63) < OPQ 39 of 150 — the
    // learned rotation is the strongest free recall lever on the
    // small-bit-budget geometry, +34% over no rotation at identical
    // index and scan cost. Deterministic end to end (driver-side
    // alternation over the xxhash64-prefix sample; partition
    // independence probed via GoldenProbe 32 vs 5).
    "q65_opq_nonparametric_recall" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 50)
      val bf = graft.operators.Similarity.bruteForceTopK(
          queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 3)
        .select(col("qId"), col("cId")).cache()
      val nTrue = bf.count()
      val idx = graft.operators.Similarity.ivfBuild(
        emb, "vec_id", "embedding", nCentroids = 16, kmeansIters = 3)
      def hits(df: DataFrame): Long = {
        val d = df.select(col("qId").as("q2"), col("cId").as("c2"))
        bf.join(d, bf("qId") === d("q2") && bf("cId") === d("c2")).count()
      }
      val rot = Some(graft.operators.Pq.opqRotationResidual(
        idx, "vec_id", "embedding", dim = 64, m = 8, ksub = 16))
      val cb = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = 2, rot = rot)
      val p4 = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb, nProbe = 4, rot = rot))
      val p8 = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
        "vec_id", "embedding", "vec_id", "embedding", k = 3, cb, nProbe = 8, rot = rot))
      bf.unpersist()
      def rec(h: Long) = recallX1e4(h, nTrue)
      Seq((nTrue, p4, rec(p4), p8, rec(p8)))
        .toDF("n_true", "opqp4_hit", "opqp4_recall_x1e4",
          "opqp8_hit", "opqp8_recall_x1e4")
    },

    // MULTI-DIMENSION star MICE (q62 two dims up — the paper's full
    // Flight/Retailer star shape): l_discount imputed from features in
    // TWO dimension tables (orders.o_totalprice on l_orderkey,
    // part.p_retailprice on l_partkey), trained through the CHAINED
    // ring products of Factorized.cofactorOverStar with the factorized
    // chain PINNED (minRowsPerKey=0) so the oracle certifies the
    // fact-grouped triple × dim triple × dim triple decomposition
    // itself, not the materialized fallback. q62 discipline throughout:
    // deterministic arithmetic mask, non-stochastic, closed-form DuckDB
    // Cramer comparator over the materialized 3-way join, RMSE at 4dp.
    "q66_star_mice_join" -> { (s, dir) =>
      Graft.register(s)
      val fact = li(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_discount").cast("double").as("d_true"))
        .withColumn("miss",
          (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L)) % 1000 < 150)
        .withColumn("l_discount", when(col("miss"), lit(null)).otherwise(col("d_true")))
      val dims = Seq(
        graft.ml.Factorized.StarDim(
          Tables.load(s, dir, "orders").select(
            col("o_orderkey").as("l_orderkey"),
            col("o_totalprice").cast("double").as("o_totalprice")),
          "l_orderkey", num = Seq("o_totalprice")),
        graft.ml.Factorized.StarDim(
          Tables.load(s, dir, "part").select(
            col("p_partkey").as("l_partkey"),
            col("p_retailprice").cast("double").as("p_retailprice")),
          "l_partkey", num = Seq("p_retailprice")))
      val done = graft.mice.MiceJoin.imputeContOverStar(
        fact, dims, target = "l_discount", factNum = Seq(), minRowsPerKey = 0.0)
      done.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("miss"), lit(1))).as("n_imputed"),
        round(sqrt(avg(when(col("miss"),
          pow(col("l_discount") - col("d_true"), 2)))), 4).as("rmse"))
    },

    // GROUPED auto-factorization through the optimizer rule, end to end
    // on real tables: the round-11 FactorizeCofactorRule extension
    // (grouping columns join their side's pre-aggregation keys) drives a
    // GROUP BY cofactor over lineitem ⋈ orders; the rewrite is ASSERTED
    // to fire (a silently-fused plan must not pass as factorized), and
    // the per-group moments are read back out of the triple and checked
    // against DuckDB's plain grouped averages. Averages, not sums, so
    // double-rounding at 5/2 dp is orders of magnitude above the
    // partial-sum-order float noise.
    "q67_grouped_rule_factorized" -> { (s, dir) =>
      Graft.register(s)
      val liq = li(s, dir).select(col("l_orderkey"), col("l_returnflag"),
        col("l_quantity").cast("double").as("l_quantity"))
      val ord = Tables.load(s, dir, "orders").select(col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      val saved = s.experimental.extraOptimizations
      s.experimental.extraOptimizations = saved :+ graft.plans.FactorizeCofactorRule
      try {
        val q = liq.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(Graft.sumTriple(col("l_quantity"), col("o_totalprice")).as("t"))
          .select(col("l_returnflag"),
            col("t.n").as("n_rows"),
            round(col("t.lin")(0) / col("t.n"), 5).as("avg_qty"),
            round(col("t.lin")(1) / col("t.n"), 2).as("avg_price"),
            round(col("t.quad")(1) / col("t.n"), 2).as("avg_qp"))
          .orderBy(col("l_returnflag"))
        // assert on the FINAL query's optimized plan — the one about to
        // execute — and COLLECT while the rule is still installed: the
        // `finally` below uninstalls it, and any later QueryExecution
        // (Verify re-planning the returned frame) would silently
        // optimize WITHOUT the rule, making the oracle certify the
        // plain fused plan instead of the grouped rewrite. The rows the
        // driver hashes are therefore the rewrite's own output (the
        // per-group moments read back out of the triple), per-group.
        require(q.queryExecution.optimizedPlan.toString.contains("multiply_triple"),
          "grouped auto-factorization must fire — the oracle certifies the rewrite")
        val rows = q.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), q.schema)
      } finally s.experimental.extraOptimizations = saved
    },

    // The skew-salted SHJ tier under the correctness gate: a 20-key
    // synthetic join whose build side holds ~50 rows per key while the
    // cap is forced tiny, so EVERY key is "hot" — hashJoinIfSafe must
    // take the salted route (asserted on the plan: a silently plain join
    // must not pass as the salted tier) and the salted join's aggregate
    // must match DuckDB over the materialized join exactly (each
    // probe-build pair met exactly once despite build-row salting and
    // probe-row replication).
    "q68_salted_skew_join" -> { (s, dir) =>
      Graft.register(s)
      val fact = li(s, dir).select(pmod(col("l_orderkey"), lit(20)).as("k"),
        col("l_quantity").cast("double").as("x"))
      val dim = Tables.load(s, dir, "orders").filter(col("o_orderkey") < 1000)
        .select(pmod(col("o_orderkey"), lit(20)).as("k"),
          col("o_totalprice").cast("double").as("y"))
      // 1024 B: small enough that the 96 KB projected build exceeds
      // cap×partitions at ANY plausible local parallelism (the tier
      // choice must be partition-count-independent for a golden row)
      val key = "spark.graft.shj.maxBuildPartitionBytes"
      val saved = s.conf.getOption(key)
      s.conf.set(key, "1024")
      try {
        val joined = graft.ml.Factorized.hashJoinIfSafe(fact, dim, Seq("k"),
          rightRows = Some(1000L))
        require(joined.queryExecution.optimizedPlan.toString.contains("__salt"),
          "the salted tier must engage — the oracle certifies the salted plan")
        joined.agg(count(lit(1)).as("n_rows"),
          round(avg(col("x")), 5).as("avg_x"),
          round(avg(col("y")), 2).as("avg_y"),
          round(avg(col("x") * col("y")), 2).as("avg_xy"))
      } finally {
        saved match {
          case Some(v) => s.conf.set(key, v)
          case None => s.conf.unset(key)
        }
      }
    },

    // The MIXED star route under the correctness gate: orders is the
    // fact, lineitem a MULTIPLICATIVE dim (~4 rows per order key — must
    // be aggregated or the join fans out), customer a NEAR-UNIQUE dim
    // (1 row per cust key — must fold row-level or pay one ring buffer
    // per row AND drag its key into the fact grouping). minRowsPerKey=2
    // is ADAPTIVE (0 / MaxValue are the pins): the memoized probe judges
    // each dim, and the split is ASSERTED — a silently all-aggregated or
    // all-materialized run must not pass as the mixed route. The
    // declared layout interleaves the routing's block order, so the
    // checked moments also certify Triple.permute's restore. Oracle =
    // the same moments over the materialized 3-way join in DuckDB.
    "q69_star_mixed_route" -> { (s, dir) =>
      Graft.register(s)
      val fact = Tables.load(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"))
      val dims = Seq(
        graft.ml.Factorized.StarDim(
          li(s, dir).select(col("l_orderkey").as("o_orderkey"),
            col("l_quantity").cast("double").as("l_quantity")),
          "o_orderkey", num = Seq("l_quantity")),
        graft.ml.Factorized.StarDim(
          Tables.load(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
            col("c_acctbal").cast("double").as("c_acctbal")),
          "o_custkey", num = Seq("c_acctbal")))
      val t = graft.ml.Factorized.cofactorOverStar(fact,
        factNum = Seq("o_totalprice"), factCat = Seq(), dims, minRowsPerKey = 2.0)
      val (aggKeys, foldKeys) = graft.ml.Factorized.lastStarRouting()
      require(aggKeys == Seq("o_orderkey") && foldKeys == Seq("o_custkey"),
        s"mixed route expected (agg=o_orderkey, fold=o_custkey); got agg=$aggKeys fold=$foldKeys")
      // declared num layout [o_totalprice, l_quantity, c_acctbal];
      // packed quad upper triangle → pq at index 1, qb at index 4
      import s.implicits._
      Seq((t.n, t.lin(0) / t.n, t.lin(1) / t.n, t.lin(2) / t.n,
          t.quad(1) / t.n, t.quad(4) / t.n))
        .toDF("n_rows", "p", "q", "b", "pq", "qb")
        .select(col("n_rows"),
          round(col("p"), 2).as("avg_price"),
          round(col("q"), 5).as("avg_qty"),
          round(col("b"), 2).as("avg_bal"),
          round(col("pq"), 2).as("avg_pq"),
          round(col("qb"), 2).as("avg_qb"))
    },

    // Star MICE with a CATEGORICAL dim feature (the round-11 verdict's
    // convenience gap): impute l_discount over the lineitem ⋈ orders ⋈
    // part star where orders contributes a numeric feature and part a
    // 5-level categorical (p_size mod 5) — the one-hot block rides the
    // chained ring products (minRowsPerKey=0 pins the fully factorized
    // chain, q66 discipline). Oracle: with one numeric + one categorical
    // regressor, the least-squares prediction is the ANCOVA closed form
    // (per-category intercept + shared within-group slope) — unique for
    // any seen category even though the one-hot design is rank-deficient
    // (fitted functions of all LS solutions agree on the span), so
    // DuckDB recomputes it exactly without a matrix inverse.
    "q70_star_mice_cat_dim" -> { (s, dir) =>
      Graft.register(s)
      val fact = li(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
          col("l_discount").cast("double").as("d_true"))
        .withColumn("miss",
          (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L)) % 1000 < 150)
        .withColumn("l_discount", when(col("miss"), lit(null)).otherwise(col("d_true")))
      val dims = Seq(
        graft.ml.Factorized.StarDim(
          Tables.load(s, dir, "orders").select(
            col("o_orderkey").as("l_orderkey"),
            col("o_totalprice").cast("double").as("o_totalprice")),
          "l_orderkey", num = Seq("o_totalprice")),
        graft.ml.Factorized.StarDim(
          Tables.load(s, dir, "part").select(
            col("p_partkey").as("l_partkey"),
            pmod(col("p_size"), lit(5)).cast("int").as("p_cat")),
          "l_partkey", cat = Seq("p_cat")))
      val done = graft.mice.MiceJoin.imputeContOverStar(
        fact, dims, target = "l_discount", factNum = Seq(), minRowsPerKey = 0.0)
      done.agg(
        count(lit(1)).as("n_rows"),
        count(when(col("miss"), lit(1))).as("n_imputed"),
        round(sqrt(avg(when(col("miss"),
          pow(col("l_discount") - col("d_true"), 2)))), 4).as("rmse"))
    },

    // The round-12 ranking tail itself under oracle: TopKByScore (the
    // bounded aggregate every knn path now rides) vs DuckDB's window
    // row_number, on a score landscape built to stress exactly what a
    // float cosine never deterministically does — heavy ties (score =
    // doc_id % 7, broken by cId asc), sprinkled NULL scores (% 11,
    // DESC NULLS LAST), and one group scored entirely NULL (group 4),
    // whose top-k is pure NULL-tail padding ordered by cId. Integer-
    // derived doubles, so no cross-engine rounding-boundary flake.
    "q71_topk_ties" -> { (s, dir) =>
      Graft.register(s)
      val scored = Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(
          (col("doc_id") % 5).as("qId"),
          col("doc_id").as("cId"),
          when(col("doc_id") % 11 === 0 || col("doc_id") % 5 === 4, lit(null))
            .otherwise((col("doc_id") % 7).cast("double")).as("cos"))
      // output coalesces the NULL scores (ranked last) to -1: the
      // hash compare must not have to equate NULL/NaN doubles
      graft.operators.Similarity.topKScored(scored, 4)
        .select(col("qId"), col("cId"), coalesce(col("cos"), lit(-1.0)).as("cos"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("qId"), col("rank"))
    },

    // The BUCKETED co-located join tier under the correctness gate:
    // lineitem and orders are bucketized once on the join key
    // (Tables.writeBucketed — the 100 TB pattern for fact tables joined
    // repeatedly), the SHJ build cap is forced below build/confParts at
    // ANY plausible partition count so the un-bucketed plan would take
    // the partition-to-fit REPARTITION tier, and the bucketed tier must
    // instead keep the scan's own hash partitioning: the executed plan
    // is ASSERTED to contain a ShuffledHashJoin and ZERO exchanges — a
    // silently re-shuffled (or silently sort-merged) plan must not pass
    // as the bucketed tier. The moments the oracle hashes come out of
    // that shuffle-free join (q09's shape over the same tables).
    "q72_bucketed_join_cofactor" -> { (s, dir) =>
      Graft.register(s)
      val liRaw = li(s, dir).select(col("l_orderkey"), col("l_quantity"))
      val ordRaw = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val ordRows = ordRaw.count()
      val liRows = liRaw.count()
      // build = orders (the smaller projection); cap sits at build/150 so
      // build/confParts exceeds it for every confParts ≤ 150 (tier choice
      // stays partition-count-independent, q68's discipline) while the
      // 256-bucket per-bucket build (build/256) stays under it
      val perRow = (8L + 8L * 2 + 24L) * 2L
      val cap = math.max(1L, ordRows * perRow / 150L)
      dropBucketedTable(s, "q72_li_bkt")
      dropBucketedTable(s, "q72_ord_bkt")
      Tables.writeBucketed(liRaw, "q72_li_bkt", "l_orderkey", 256)
      Tables.writeBucketed(ordRaw, "q72_ord_bkt", "o_orderkey", 256)
      val noBroadcast = "spark.sql.autoBroadcastJoinThreshold"
      val savedBc = s.conf.getOption(noBroadcast)
      val capKey = "spark.graft.shj.maxBuildPartitionBytes"
      val savedCap = s.conf.getOption(capKey)
      s.conf.set(noBroadcast, "-1")
      s.conf.set(capKey, cap.toString)
      try {
        val liB = s.table("q72_li_bkt").select(col("l_orderkey").as("k"), col("l_quantity"))
        val ordB = s.table("q72_ord_bkt").select(col("o_orderkey").as("k"), col("o_totalprice"))
        val joined = graft.ml.Factorized.hashJoinIfSafe(liB, ordB, Seq("k"),
          leftRows = Some(liRows), rightRows = Some(ordRows))
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.contains("ShuffledHashJoin"),
          s"bucketed tier must produce a shuffled-hash join:\n$plan")
        require(!plan.contains("Exchange"),
          s"bucketed co-located join must plan with ZERO exchanges:\n$plan")
        joined
          .agg(Graft.sumTriple(col("l_quantity"), col("o_totalprice")).as("t"))
          .select(
            col("t.n").as("n_rows"),
            round(col("t.lin")(0), 2).as("sum_qty"),
            round(col("t.lin")(1) / col("t.n"), 2).as("avg_total"),
            round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_total"))
      } finally {
        savedBc match { case Some(v) => s.conf.set(noBroadcast, v); case None => s.conf.unset(noBroadcast) }
        savedCap match { case Some(v) => s.conf.set(capKey, v); case None => s.conf.unset(capKey) }
      }
    },

    // MISMATCHED bucket counts through the engine's bucket coalescing,
    // under the correctness gate: lineitem bucketized at 128, orders
    // (the build side) at 64 — the planner coalesces the probe's 128
    // buckets onto 64 (stream-side coalesce, ratio 2) and the join must
    // still plan with ZERO exchanges (asserted, with the coalesce
    // visible in the scan). Coalescing is a session conf read at
    // physical-planning time, so the rows the oracle hashes are
    // COLLECTED while the conf is set (q67 discipline: a later
    // re-planning by Verify's write must not silently certify the
    // exchange-bearing fallback instead).
    "q73_bucket_coalesced_join" -> { (s, dir) =>
      Graft.register(s)
      val liRaw = li(s, dir).select(col("l_orderkey"), col("l_quantity"))
      val ordRaw = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val ordRows = ordRaw.count()
      val liRows = liRaw.count()
      dropBucketedTable(s, "q73_li_bkt")
      dropBucketedTable(s, "q73_ord_bkt")
      Tables.writeBucketed(liRaw, "q73_li_bkt", "l_orderkey", 128)
      Tables.writeBucketed(ordRaw, "q73_ord_bkt", "o_orderkey", 64)
      val perRow = (8L + 8L * 2 + 24L) * 2L
      // cap just above the POST-COALESCE per-bucket build (build/64) so
      // the bucketed tier pre-qualifies on the smaller count; at any
      // plausible verify parallelism the un-bucketed plan would
      // repartition instead
      val cap = ordRows * perRow / 64L + 1024L
      val conf = Seq(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.graft.shj.maxBuildPartitionBytes" -> cap.toString,
        "spark.sql.bucketing.coalesceBucketsInJoin.enabled" -> "true")
      val saved = conf.map { case (k, _) => k -> s.conf.getOption(k) }
      conf.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val liB = s.table("q73_li_bkt").select(col("l_orderkey").as("k"), col("l_quantity"))
        val ordB = s.table("q73_ord_bkt").select(col("o_orderkey").as("k"), col("o_totalprice"))
        val joined = graft.ml.Factorized.hashJoinIfSafe(liB, ordB, Seq("k"),
          leftRows = Some(liRows), rightRows = Some(ordRows))
        val plan = joined.queryExecution.executedPlan.toString
        require(plan.contains("ShuffledHashJoin"),
          s"coalesced bucketed tier must produce a shuffled-hash join:\n$plan")
        require(!plan.contains("Exchange"),
          s"coalesced bucketed join must plan with ZERO exchanges:\n$plan")
        val q = joined
          .agg(Graft.sumTriple(col("l_quantity"), col("o_totalprice")).as("t"))
          .select(
            col("t.n").as("n_rows"),
            round(col("t.lin")(0) / col("t.n"), 5).as("avg_qty"),
            round(col("t.lin")(1), 2).as("sum_total"),
            round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_total"))
        val rows = q.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), q.schema)
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    },

    // The columnar-batch cofactor kernel under the correctness gate:
    // moments computed straight off the parquet scan's ColumnarBatch
    // vectors (no ColumnarToRow, no agg exchange) — continuous block
    // (raw + a derived disc-price column), a categorical int column, and
    // the year-of-timestamp categorical, each read back out of the
    // triple and compared against DuckDB recomputing them relationally.
    // The harvest MUST engage (a silent row-aggregate fallback cannot
    // pass as the batch kernel).
    "q74_columnar_cofactor" -> { (s, dir) =>
      import graft.agg.ColumnarCofactor._
      val t = cofactor(
        li(s, dir),
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice"),
          NumDerived(Seq("l_extendedprice", "l_discount"), "disc_price", discPriceKernel)),
        Seq(CatCol("l_linenumber"), CatYear("l_shipdate"))
      ).getOrElse(throw new IllegalStateException(
        "q74: the columnar harvest must engage — the oracle certifies the batch kernel"))
      val n = t.n.toDouble
      val years = t.linCat(1)
      val minYear = years.keys.min
      val row = Row(
        t.n,
        dround(t.lin(0), 2),                                  // sum_qty
        dround(t.lin(1) / n, 2),                              // avg_price
        dround(t.quad(Triple.triIdx(0, 1, 3)) / n, 2),        // avg_qty_price
        dround(t.lin(2) / n, 2),                              // avg_disc_price
        dround(t.quadNumCat(0).getOrElse(1, 0.0), 2),         // Σ qty | linenumber=1
        years.size.toLong,                                    // n_years
        minYear,                                              // min_year
        years(minYear).toLong)                                // cnt_min_year
      val schema = StructType(Seq(
        StructField("n_rows", LongType), StructField("sum_qty", DoubleType),
        StructField("avg_price", DoubleType), StructField("avg_qty_price", DoubleType),
        StructField("avg_disc_price", DoubleType), StructField("sum_qty_line1", DoubleType),
        StructField("n_years", LongType), StructField("min_year", IntegerType),
        StructField("cnt_min_year", LongType)))
      s.createDataFrame(java.util.Arrays.asList(row), schema)
    },

    // q01's pricing aggregate through the SAME columnar kernel: the
    // group-by pair rides as one packed-strings categorical and every
    // output is read back out of the triple's categorical maps — the
    // DuckDB oracle is the plain GROUP BY (q01's own SQL shape).
    "q75_columnar_pricing" -> { (s, dir) =>
      import graft.agg.ColumnarCofactor._
      val t = cofactor(
        li(s, dir),
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice"),
          NumDerived(Seq("l_extendedprice", "l_discount"), "disc_price", discPriceKernel)),
        Seq(CatPackedStrings(Seq("l_returnflag", "l_linestatus")))
      ).getOrElse(throw new IllegalStateException(
        "q75: the columnar harvest must engage — the oracle certifies the batch kernel"))
      // packed-key ascending == ORDER BY l_returnflag, l_linestatus
      val rows = t.linCat(0).keys.toSeq.sorted.map { key =>
        val cnt = t.linCat(0)(key)
        val Seq(flag, status) = unpackStrings(key, 2)
        Row(flag, status,
          dround(t.quadNumCat(0).getOrElse(key, 0.0), 2),        // sum_qty
          dround(t.quadNumCat(1).getOrElse(key, 0.0) / cnt, 2),  // avg_price
          dround(t.quadNumCat(2).getOrElse(key, 0.0) / cnt, 2),  // avg_disc_price
          cnt.toLong)
      }
      val schema = StructType(Seq(
        StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
        StructField("sum_qty", DoubleType), StructField("avg_price", DoubleType),
        StructField("avg_disc_price", DoubleType), StructField("cnt", LongType)))
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    },

    // Per-class triples (the QDA/LDA/NB training input) through the
    // columnar kernel: one FULL triple per label value — including the
    // per-class QUAD moment, which the flat kernel's categorical maps
    // cannot express — plus a per-class categorical (distinct ship
    // years), each recomputed relationally by DuckDB. Harvest asserted.
    "q76_perclass_columnar" -> { (s, dir) =>
      import graft.agg.ColumnarCofactor
      import graft.agg.ColumnarCofactor._
      val perClass = ColumnarCofactor.cofactorPerClass(
        li(s, dir),
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice")),
        Seq(CatYear("l_shipdate")),
        CatCol("l_linenumber")
      ).getOrElse(throw new IllegalStateException(
        "q76: the columnar harvest must engage — the oracle certifies the per-class kernel"))
      val rows = perClass.sortBy(_._1).map { case (line, t) =>
        val n = t.n.toDouble
        Row(line, t.n,
          dround(t.lin(0), 2),                            // sum_qty
          dround(t.lin(1) / n, 2),                        // avg_price
          dround(t.quad(Triple.triIdx(0, 1, 2)) / n, 2),  // avg_qty_price (per-class quad)
          t.linCat(0).size.toLong)                        // n_years
      }
      val schema = StructType(Seq(
        StructField("l_linenumber", IntegerType), StructField("n_rows", LongType),
        StructField("sum_qty", DoubleType), StructField("avg_price", DoubleType),
        StructField("avg_qty_price", DoubleType), StructField("n_years", LongType)))
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    },

    // Filtered columnar cofactor: a TPC-H-q6-shaped predicate (timestamp
    // range + double cuts) composed with OR / IN / string equality runs
    // THROUGH the harvest — the kernel compiles the FilterExec condition
    // to a per-batch selection mask (three-valued logic) instead of
    // refusing the plan. DuckDB recomputes the same WHERE relationally;
    // the harvest is ASSERTED engaged so a silent fallback cannot pass.
    "q77_filtered_columnar" -> { (s, dir) =>
      import graft.agg.ColumnarCofactor
      import graft.agg.ColumnarCofactor._
      import org.apache.spark.sql.functions.{col => c}
      val filtered = li(s, dir).filter(
        c("l_shipdate") >= "1996-01-01" && c("l_shipdate") < "1997-01-01" &&
        c("l_discount") >= 0.02 && c("l_quantity") < 30 &&
        (c("l_returnflag") === "R" || c("l_linenumber").isin(1, 2, 3)))
      val t = ColumnarCofactor.cofactor(
        filtered,
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice"),
          NumDerived(Seq("l_extendedprice", "l_discount"), "disc_price", discPriceKernel)),
        Seq(CatYear("l_shipdate"))
      ).getOrElse(throw new IllegalStateException(
        "q77: the columnar harvest must engage on the filtered scan — " +
        "the oracle certifies the compiled filter mask"))
      val n = t.n.toDouble
      val row = Row(
        t.n,
        dround(t.lin(0), 2),          // sum_qty
        dround(t.lin(1) / n, 2),      // avg_price
        dround(t.lin(2), 2),          // revenue = Σ price·(1-disc)
        t.linCat(0).size.toLong)      // n_years (should be 1: the range)
      val schema = StructType(Seq(
        StructField("n_rows", LongType), StructField("sum_qty", DoubleType),
        StructField("avg_price", DoubleType), StructField("revenue", DoubleType),
        StructField("n_years", LongType)))
      s.createDataFrame(java.util.Arrays.asList(row), schema)
    },

    // Grouped cofactor through the PUBLIC grouped API
    // (Graft.cofactorGrouped): the group key (a LONG column — the
    // kernel's guarded long→int label decode) rides as the per-class
    // label, and the route is asserted LIVE so a silent fallback to the
    // row aggregate cannot pass. Per-group scalars AND a per-group
    // categorical cardinality are read back out of the returned
    // (key, t) DataFrame — the same downstream access pattern q03 uses
    // on the row aggregate's output.
    "q78_grouped_columnar" -> { (s, dir) =>
      val g = Graft.cofactorGrouped(li(s, dir), "l_suppkey",
        Seq("l_quantity", "l_extendedprice"), Seq("l_linenumber"))
      require(Graft.lastGroupedRoute() == "columnar",
        "q78: the grouped harvest must engage — the oracle certifies the grouped kernel route")
      g.select(
        col("l_suppkey"),
        col("t.n").as("n_rows"),
        round(col("t.lin")(0), 2).as("sum_qty"),
        round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"),
        size(col("t.lin_cat")(0)).cast("long").as("n_lines"))
        .orderBy(col("l_suppkey"))
    },
    // q78's discipline for a STRING dimension key: l_returnflag rides
    // the kernel as a CatShortString label (the shape probe verifies
    // max packable key width ≤ 4 before routing), and the route is ASSERTED so a
    // silent fallback to the row aggregate cannot pass as green
    "q79_grouped_string" -> { (s, dir) =>
      val g = Graft.cofactorGrouped(li(s, dir), "l_returnflag",
        Seq("l_quantity", "l_extendedprice"), Seq("l_linenumber"))
      require(Graft.lastGroupedRoute() == "columnar",
        "q79: the string-keyed grouped harvest must engage — the oracle certifies the packed-label route")
      g.select(
        col("l_returnflag"),
        col("t.n").as("n_rows"),
        round(col("t.lin")(0), 2).as("sum_qty"),
        round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"),
        size(col("t.lin_cat")(0)).cast("long").as("n_lines"))
        .orderBy(col("l_returnflag"))
    },
    // q79's discipline at the WIDE string width: documents.source holds
    // 4- AND 5-byte keys (src0..src19), past the old 4-byte int-label
    // gate — the key packs into the kernel's LONG label channel
    // (CatShortString in label position, ≤8 UTF-8 bytes), and the route
    // is ASSERTED so a silent fallback to the row aggregate cannot pass
    "q80_grouped_string_wide" -> { (s, dir) =>
      val g = Graft.cofactorGrouped(
        Tables.load(s, dir, "documents"), "source", Seq("n_chars"), Seq())
      require(Graft.lastGroupedRoute() == "columnar",
        "q80: the wide-string grouped harvest must engage — the oracle certifies the Long-label route")
      g.select(
        col("source"),
        col("t.n").as("n_rows"),
        round(col("t.lin")(0), 2).as("sum_chars"),
        round(col("t.quad")(0) / col("t.n"), 2).as("avg_sq_chars"))
        .orderBy(col("source"))
    },
    // the SQL surface on the grouped kernel: spark.sql GROUP BY +
    // sum_to_triple plans as GroupedCofactorKernelExec through the
    // opt-in planner strategy (GroupedCofactorStrategy — installed via
    // experimental.extraStrategies, the q67 convention), giving SQL the
    // same columnar route the Scala API (q78/q79) rides. The plan is
    // ASSERTED to carry the kernel exec node, and rows are COLLECTED
    // while the strategy is installed so the driver hashes the kernel's
    // own output (the q67 lesson: a later re-planning without the
    // strategy would silently certify the default plan).
    "q81_grouped_sql_kernel" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir).createOrReplaceTempView("lineitem_q81")
      val saved = s.experimental.extraStrategies
      s.experimental.extraStrategies = saved :+ graft.plans.GroupedCofactorStrategy(s)
      try {
        val q = s.sql(
          """SELECT l_suppkey,
            |       sum_to_triple(l_quantity, l_extendedprice, l_linenumber) AS t
            |FROM lineitem_q81 GROUP BY l_suppkey""".stripMargin)
        require(q.queryExecution.executedPlan.toString.contains("GroupedCofactorKernel"),
          "q81: the SQL grouped aggregate must plan through the kernel strategy")
        val out = q.select(
          col("l_suppkey"),
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"),
          size(col("t.lin_cat")(0)).cast("long").as("n_lines"))
          .orderBy(col("l_suppkey"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally s.experimental.extraStrategies = saved
    },
    // token-budget document chunking (context-window prep): 64-token
    // windows overlapping by 8, each re-joined with single spaces —
    // the oracle recomputes every window verbatim via list_slice +
    // array_to_string over the same trim/split-\s+ tokens, so chunk
    // text, index, and coverage-stop rule are all hash-checked. The
    // chunking expression rides ALONE under posexplode (the
    // generator-sibling lesson: a sibling lands in the Project above
    // the Generate and re-runs per element).
    "q82_chunk_text" -> { (s, dir) =>
      Graft.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          posexplode(graft.functions.TextFunctions.chunkText(col("text"), 64, 8)))
        .select(col("doc_id"),
          col("pos").cast("long").as("chunk_idx"),
          col("col").as("chunk"),
          length(col("col")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    // NULL-bearing data on the SQL grouped-kernel route: ~2.7% NULL
    // keys + ~2.4% NULL inputs (injected deterministically, written
    // to a scratch parquet so the scan is harvestable). The strategy
    // keeps the kernel for the clean rows and ring-merges a
    // row-aggregate SIDE CHANNEL over exactly the NULL-bearing
    // remainder — the NULL-key group and null-skipped rows must match
    // plain SQL semantics byte-for-byte. Route REQUIRED in-query.
    "q83_grouped_sql_nulls" -> { (s, dir) =>
      Graft.register(s)
      // FIXED per-user scratch path + overwrite, not a fresh temp dir
      // per invocation: repeated bench/correctness runs would
      // otherwise accumulate full lineitem copies in /tmp (tens of GB
      // per run at sf100)
      val scratch = new java.io.File(
        new java.io.File(System.getProperty("java.io.tmpdir")),
        s"graft_q83_scratch_${System.getProperty("user.name", "u")}").getAbsolutePath
      li(s, dir).select(
        when(col("l_orderkey") % 37 === 0, lit(null).cast("long"))
          .otherwise(col("l_suppkey")).as("k"),
        when(col("l_partkey") % 41 === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity").cast("double")).as("x"))
        .write.mode("overwrite").parquet(scratch)
      s.read.parquet(scratch).createOrReplaceTempView("lineitem_q83")
      val saved = s.experimental.extraStrategies
      s.experimental.extraStrategies = saved :+ graft.plans.GroupedCofactorStrategy(s)
      try {
        val q = s.sql("SELECT k, sum_to_triple(x) AS t FROM lineitem_q83 GROUP BY k")
        require(q.queryExecution.executedPlan.toString.contains("GroupedCofactorKernel"),
          "q83: NULL-bearing data within the bound must keep the kernel route")
        // the NULL-key group is presented as the -1 sentinel: a NULL
        // in a key column round-trips as NaN through the driver's
        // pandas-tuple compare, where NaN != NaN would flag identical
        // results as a mismatch; the group itself still flows through
        // the side channel (k >= 0 everywhere else, so -1 is unique)
        val out = q.select(
          coalesce(col("k"), lit(-1L)).as("k"),
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.quad")(0), 2).as("sum_sq"))
          .orderBy(col("k"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally s.experimental.extraStrategies = saved
    },
    // GROUP BY k1, k2 on the SQL surface: both 1-byte flag columns pack
    // into the kernel's Long label channel with probed byte budgets
    // (CatPackedKeys) — the same zero-shuffle scan+treeReduce physical
    // route as the single-key strategy. Route REQUIRED in-query.
    "q84_grouped_sql_twokeys" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir).createOrReplaceTempView("lineitem_q84")
      val saved = s.experimental.extraStrategies
      s.experimental.extraStrategies = saved :+ graft.plans.GroupedCofactorStrategy(s)
      try {
        val q = s.sql(
          """SELECT l_returnflag, l_linestatus,
            |       sum_to_triple(l_quantity, l_extendedprice, l_linenumber) AS t
            |FROM lineitem_q84 GROUP BY l_returnflag, l_linestatus""".stripMargin)
        require(q.queryExecution.executedPlan.toString.contains("GroupedCofactorKernel"),
          "q84: GROUP BY k1, k2 must plan through the packed-label kernel strategy")
        val out = q.select(
          col("l_returnflag"), col("l_linestatus"),
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"),
          size(col("t.lin_cat")(0)).cast("long").as("n_lines"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally s.experimental.extraStrategies = saved
    },
    // the curation cut itself — GROUP BY source, lang over documents on
    // the DataFrame surface (cofactorGroupedMulti): probed widths 5 + 2
    // pack into one Long label, one columnar scan, no shuffle. Route
    // REQUIRED after the call (lastGroupedRoute).
    "q85_grouped_multi_docs" -> { (s, dir) =>
      Graft.register(s)
      val docs = Tables.load(s, dir, "documents")
      val grouped = Graft.cofactorGroupedMulti(docs, Seq("source", "lang"),
        Seq("n_chars"), Seq())
      require(Graft.lastGroupedRoute() == "columnar",
        "q85: source × lang must ride the packed-label kernel")
      grouped.select(
        col("source"), col("lang"),
        col("t.n").as("n_rows"),
        round(col("t.lin")(0), 2).as("sum_chars"),
        round(col("t.quad")(0), 2).as("sum_sq_chars"))
        .orderBy(col("source"), col("lang"))
    },
    // deterministic engine-portable split assignment (train/val/test):
    // the pinned plain-arithmetic hash spec is recomputed verbatim by
    // DuckDB over HUGEINT, so every per-row bucket is hash-checked —
    // the reproducibility contract (same row, same split, any engine)
    // IS the thing under test
    "q86_stable_split" -> { (s, dir) =>
      Graft.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.StableSplit.stableSplit(col("doc_id"), Seq(0.8, 0.1, 0.1))
            .cast("long").as("split"))
        .orderBy(col("doc_id"))
    },
    // Okapi BM25 keyword scoring (corpus mining / decontamination
    // probe): the oracle recomputes the full formula — N, avgdl, per-
    // (doc, term) tf, df, idf, saturated sum — from the same pinned
    // token contract; scores rounded to 4 decimals on both engines to
    // absorb summation-order ulps
    "q87_bm25_scores" -> { (s, dir) =>
      Graft.register(s)
      val docs = Tables.load(s, dir, "documents")
      graft.operators.TextRank.bm25(docs, "doc_id", "text",
          Seq("hash", "join", "vector"), k1 = 1.2, b = 0.75)
        .select(col("doc_id"), round(col("score"), 4).as("score"))
        .orderBy(col("doc_id"))
    },
    // THREE grouping keys on the SQL surface (flag 1B + status 1B +
    // linenumber 1B pack into 3 of the Long label's 8 bytes) — the
    // deepest curation cut still rides the one-scan kernel route
    "q88_grouped_sql_threekeys" -> { (s, dir) =>
      Graft.register(s)
      li(s, dir).createOrReplaceTempView("lineitem_q88")
      val saved = s.experimental.extraStrategies
      s.experimental.extraStrategies = saved :+ graft.plans.GroupedCofactorStrategy(s)
      try {
        val q = s.sql(
          """SELECT l_returnflag, l_linestatus, l_linenumber,
            |       sum_to_triple(l_quantity, l_extendedprice) AS t
            |FROM lineitem_q88 GROUP BY l_returnflag, l_linestatus, l_linenumber""".stripMargin)
        require(q.queryExecution.executedPlan.toString.contains("GroupedCofactorKernel"),
          "q88: GROUP BY k1, k2, k3 must plan through the packed-label kernel strategy")
        val out = q.select(
          col("l_returnflag"), col("l_linestatus"), col("l_linenumber"),
          col("t.n").as("n_rows"),
          round(col("t.lin")(0), 2).as("sum_qty"),
          round(col("t.quad")(1) / col("t.n"), 2).as("avg_qty_price"))
          .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
        val rows = out.collect()
        s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
      } finally s.experimental.extraStrategies = saved
    },
    // blocklist filtering (the filter-list pass): hashed term-SET
    // membership per token, one byte walk — every per-document
    // (n_matched, n_tokens) pair hash-checked against DuckDB's
    // list_filter + list_contains recompute
    "q89_blocklist_stats" -> { (s, dir) =>
      Graft.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.blocklistStats(col("text"),
            Seq("hash", "join", "slow", "customer", "zzz_never")).as("b"))
        .select(col("doc_id"),
          col("b.n_matched").cast("long").as("n_matched"),
          col("b.n_tokens").cast("long").as("n_tokens"))
        .orderBy(col("doc_id"))
    },
    // vocabulary mining: top-25 corpus tokens with the deterministic
    // (count DESC, term ASC) tie-break — plans as TakeOrderedAndProject
    // (bounded heap per partition), recomputed by DuckDB verbatim
    "q90_top_terms" -> { (s, dir) =>
      Graft.register(s)
      graft.operators.TextRank.topTerms(Tables.load(s, dir, "documents"), "text", 25)
    },

    // the real training-data flow COMPOSED over chunks, not docs:
    // chunk_text → exact dedup of the chunk text (the corpus has many
    // duplicate docs, so their chunks collapse; earliest
    // (doc_id, chunk_idx) survives) → pack_sequences over the
    // SURVIVORS per language at a 256-token budget. Pins chunk_idx
    // stability under the dedup shuffle and the token counts the
    // packer sees. The chunking expression rides alone under
    // posexplode (generator-sibling rule, see q82).
    "q91_chunk_pipeline" -> { (s, dir) =>
      Graft.register(s)
      val chunks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          posexplode(graft.functions.TextFunctions.chunkText(col("text"), 64, 8)))
        .select(col("doc_id"), col("lang"),
          col("pos").cast("long").as("chunk_idx"), col("col").as("chunk"))
      // one arithmetic order key: chunk_idx < 1e6 at every SF (56-token
      // stride over ≤ a few hundred tokens/doc), so the key is unique
      val ord = col("doc_id") * lit(1000000L) + col("chunk_idx")
      val uniq = graft.operators.Dedup.exact(chunks, Seq(col("chunk")), ord)
      val withTc = uniq.withColumn("n_tokens",
        graft.functions.TextFunctions.tokenCount(col("chunk")).cast("long"))
      graft.operators.Pack.assign(withTc, col("lang"),
          col("doc_id") * lit(1000000L) + col("chunk_idx"), col("n_tokens"), budget = 256L)
        .select(col("doc_id"), col("chunk_idx"), col("n_tokens"), col("pack"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // duplicated n-gram mining (the boilerplate survey): 3-grams in
    // ≥ 2 documents, top 50 by document frequency, gram-ASC tie-break
    // (the total order is unique, so the LIMIT boundary is stable).
    // One fused byte walk per doc (distinct_ngrams) feeding the
    // spill-safe hash aggregate — no token arrays, no per-partition
    // vocabulary map (the n-gram space is corpus-sized, not
    // vocab-sized).
    "q92_dup_ngrams" -> { (s, dir) =>
      Graft.register(s)
      graft.operators.TextRank.duplicatedNgrams(
        Tables.load(s, dir, "documents"), "text", n = 3, minDocs = 2L, k = 50)
    },

    // deterministic downsampling, fixed-rate AND quality-weighted: the
    // kept sets are re-derived bit-for-bit by DuckDB from the pinned
    // plain-arithmetic hash (q86's recipe). keep10 ⊂ keep50 by
    // construction (same hash, bigger threshold) — rerunning with a
    // larger budget only ADDS documents; keep_w uses a token-count
    // quality weight both engines compute from the text.
    "q93_stable_sample" -> { (s, dir) =>
      Graft.register(s)
      val d = Tables.load(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("double").as("tc"))
      val w = least(lit(1.0), col("tc") / 256.0)
      val out = d.select(col("doc_id"),
          graft.operators.StableSplit.stableSample(col("doc_id"), 0.1).as("keep10"),
          graft.operators.StableSplit.stableSample(col("doc_id"), 0.5).as("keep50"),
          graft.operators.StableSplit.stableSampleWeighted(col("doc_id"), w).as("keep_w"))
        .orderBy(col("doc_id"))
      // the budget-growth subset law, asserted in-query
      require(out.filter(col("keep10") && !col("keep50")).count() == 0,
        "q93: the 10% sample must be a subset of the 50% sample")
      out
    },

    // exact-substring dedup, REMOVAL step (Lee et al. ACL 2022 at
    // 3-gram granularity): mine every 3-gram in ≥2 documents (q92's
    // counting pass without the top-k), broadcast the set, and strip
    // every covered token in one byte walk per document. DuckDB
    // recomputes the whole pipeline — mining, window coverage with
    // overlap union, and the space-rejoined rebuild — verbatim.
    "q94_dup_span_removal" -> { (s, dir) =>
      Graft.register(s)
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.TextRank.removeDuplicatedSpans(docs, "text", n = 3, minDocs = 2L)
        .select(col("doc_id"), col("text").as("clean_text"),
          col("n_removed_tokens"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // q80's discipline for a string key TOO WIDE to base-256 pack:
    // c_mktsegment is 10 bytes ('AUTOMOBILE'), past the Long label's 8,
    // so the kernel rides the DICTIONARY label (one memoized distinct
    // scan → broadcast value↔index map, one hash probe per row) — the
    // route that removes the row-aggregate cliff for URL/dataset-name
    // cut keys. Route ASSERTED as 'columnar-dict' so neither a silent
    // row fallback NOR an impossible packed route can pass as green.
    "q95_grouped_dict" -> { (s, dir) =>
      val g = Graft.cofactorGrouped(Tables.load(s, dir, "customer"),
        "c_mktsegment", Seq("c_acctbal"), Seq("c_nationkey"))
      require(Graft.lastGroupedRoute() == "columnar-dict",
        "q95: the wide-string key must ride the dictionary kernel route")
      g.select(
        col("c_mktsegment"),
        col("t.n").as("n_rows"),
        round(col("t.lin")(0), 2).as("sum_bal"),
        round(col("t.quad")(0) / col("t.n"), 2).as("avg_sq_bal"),
        size(col("t.lin_cat")(0)).cast("long").as("n_nations"))
        .orderBy(col("c_mktsegment"))
    },

    // deterministic source-weighted mixture composition (the data-mixing
    // step of a training run): src0 ×2.5, src1 ×1.0, src2 ×0.25 — full
    // epochs + the fractional-hash epoch, all re-derived bit-for-bit by
    // DuckDB from the q86 pinned-hash recipe; unlisted sources drop.
    // mix_key is the companion deterministic global-shuffle key.
    "q96_corpus_mix" -> { (s, dir) =>
      graft.operators.CorpusMix.compose(
          Tables.load(s, dir, "documents").select(col("doc_id"), col("source")),
          "source", "doc_id",
          Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25))
        .select(col("doc_id"), col("source"), col("epoch"),
          graft.operators.CorpusMix.mixKey(col("doc_id"), col("epoch")).as("mix_key"))
        .orderBy(col("doc_id"), col("epoch"))
    },

    // line-level corpus dedup (the C4 line filter) over a DERIVED
    // multi-line corpus: each document becomes its 4-token chunks
    // newline-joined (the synthetic docs have no newlines), then every
    // line appearing ≥2 times corpus-wide strips and the documents
    // rebuild in order with audit counters. DuckDB recomputes the
    // derivation (q82's chunk recipe at width 4, overlap 0) AND the
    // whole dedup pipeline.
    "q97_dedup_lines" -> { (s, dir) =>
      Graft.register(s)
      val corpus = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          array_join(graft.functions.TextFunctions.chunkText(col("text"), 4, 0), "\n").as("text"))
      graft.operators.Dedup.dedupLines(corpus, "doc_id", "text", minCount = 2L)
        .orderBy(col("doc_id"))
    },

    // corpus-trained bigram-LM quality score (the CCNet signal, n-gram
    // model in place of its KenLM): train add-1 statistics on the whole
    // documents table, score every document by negative mean bigram
    // log-likelihood. DuckDB retrains the identical model in SQL; both
    // sides grid-round (floor(s·10⁴ + 0.5)/10⁴ — q12's cross-engine
    // float discipline) because ln() may differ in the last ulp.
    "q98_lm_score" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val lm = graft.operators.LmQuality.train(docs, "text")
      docs.select(col("doc_id"),
          floor(graft.operators.LmQuality.score(lm, col("text")) * 10000.0 + 0.5) / 10000.0)
        .toDF("doc_id", "lm_score")
        .orderBy(col("doc_id"))
    },

    // Gopher word-level quality rules (Rae et al. 2021 Table A1), the
    // fused one-byte-walk kernel: raw metrics + the composed keep
    // decision at thresholds fitted to the synthetic corpus (minWords
    // 10, minStopHits 1 — the word-soup vocabulary carries 'the').
    "q99_gopher_rules" -> { (s, dir) =>
      Graft.register(s)
      // one byte walk: the keep decision derives from the projected
      // struct (gopherKeepFromStats), never a second gopher_stats
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.gopherStats(col("text")).as("g"))
        .select(col("doc_id"), col("g"),
          graft.functions.TextFunctions.gopherKeepFromStats(col("g"),
            minWords = 10, maxWords = 100000, minMeanLen = 3.0, maxMeanLen = 10.0,
            maxSymbolRatio = 0.1, minAlphaRatio = 0.8, minStopHits = 1).as("keep"))
        .select(col("doc_id"),
          col("g.n_tokens").as("n_tokens"),
          floor(col("g.n_token_chars").cast("double") / col("g.n_tokens").cast("double") * 10000.0 + 0.5) / 10000.0,
          floor(col("g.n_alpha_tokens").cast("double") / col("g.n_tokens").cast("double") * 10000.0 + 0.5) / 10000.0,
          col("g.n_stop_hits").as("n_stop_hits"),
          col("g.n_symbols").as("n_symbols"),
          col("keep"))
        .toDF("doc_id", "n_tokens", "mean_word_len", "alpha_ratio",
          "n_stop_hits", "n_symbols", "keep")
        .orderBy(col("doc_id"))
    },

    // incremental-ingest dedup (today's crawl vs all of history): a
    // derived new batch of verbatim copies (%7=0), last-word-truncated
    // near-dups (%7=1, jaccard ≈ (n-3)/(n-2)), and word-reversed fresh
    // docs (%7=2, shared ordered trigrams ≈ none) flags against the
    // corpus through the asymmetric exact-hash + banded-LSH passes.
    // DuckDB recomputes ground truth EXHAUSTIVELY (all new × corpus
    // string-shingle jaccard) — the oracle row therefore also pins the
    // 64-hash/32-band S-curve at full recall on this corpus, q14's
    // discipline for the asymmetric path.
    "q100_dedup_incremental" -> { (s, dir) =>
      Graft.register(s)
      val corpus = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val newBatch = corpus.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 20000000L).as("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") % 7 === 1)
          .select((col("doc_id") + 20000000L).as("doc_id"),
            regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text")))
        .unionByName(corpus.filter(col("doc_id") % 7 === 2)
          .select((col("doc_id") + 20000000L).as("doc_id"),
            concat_ws(" ", reverse(split(col("text"), " "))).as("text")))
      graft.operators.Dedup.dedupAgainstCorpus(newBatch, corpus, "doc_id", "text",
          threshold = 0.8)
        .select(col("doc_id"), col("dup_exact"), col("dup_near"))
        .orderBy(col("doc_id"))
    },

    // the two halves of the library composed: the cofactor RING trains
    // an LDA quality classifier over TEXT-KERNEL features (word count
    // and token character mass from one gopher_stats byte walk),
    // labeled by the Gopher keep decision — the FastText/fineweb-edu
    // "model-based quality filter" shape with the reference's factorized
    // training math. One scan lifts features straight into the triple;
    // DuckDB retrains the closed-form 2-feature LDA from scratch
    // (q27's oracle algebra over q99's feature algebra). Feature choice
    // is numeric-deliberate: integer-backed counts with real within-
    // class variance — the ratio features (mean length, alpha ratio)
    // and the stopword count are class-determined or near-constant on
    // this corpus, and a near-singular pooled
    // covariance diverges between the library's SVD pinv (regularizes)
    // and a closed-form SQL inverse (explodes).
    "q101_quality_classifier" -> { (s, dir) =>
      Graft.register(s)
      val g = graft.functions.TextFunctions.gopherStats(col("text"))
      val feats = Tables.load(s, dir, "documents")
        .select(g.as("g"))
        .select(
          col("g.n_tokens").cast("double").as("f1"),
          col("g.n_token_chars").cast("double").as("f2"),
          graft.functions.TextFunctions.gopherKeepFromStats(col("g"),
            minWords = 10, maxWords = 100000, minMeanLen = 3.0, maxMeanLen = 10.0,
            maxSymbolRatio = 0.1, minAlphaRatio = 0.8, minStopHits = 1)
            .cast("int").as("cls"))
      val t = Graft.cofactor(feats, Seq("f1", "f2"), Seq("cls"))
      val m = graft.ml.Lda.train(t, label = 0)
      import s.implicits._
      m.classes.indices.map(i =>
          (m.classes(i), m.coef(i)(0), m.coef(i)(1), m.intercepts(i)))
        .toDF("class", "coef_len", "coef_chars", "icpt")
        .select(col("class"),
          round(col("coef_len"), 5).as("coef_len"),
          round(col("coef_chars"), 5).as("coef_chars"),
          round(col("icpt"), 5).as("icpt"))
        .orderBy(col("class"))
    },

    // q97's pipeline under C4's EXACT rule (keepFirst): remove all but
    // one occurrence of each duplicated line — the canonical survivor
    // is the globally smallest (doc_id, pos). DuckDB re-derives the
    // canonical pick with a row_number window over the same order.
    "q102_dedup_lines_keepone" -> { (s, dir) =>
      Graft.register(s)
      val corpus = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          array_join(graft.functions.TextFunctions.chunkText(col("text"), 4, 0), "\n").as("text"))
      graft.operators.Dedup.dedupLines(corpus, "doc_id", "text",
          minCount = 2L, keepFirst = true)
        .orderBy(col("doc_id"))
    },

    // per-source document cap (the "≤ N pages per domain" curation
    // rule): survivors = the cap smallest (stableHash32(doc_id),
    // doc_id) per source, ranked by the bounded map-side k-heap, ids
    // semi-joined back. DuckDB re-derives the identical survivor set
    // from the HUGEINT hash recompute + a row_number window; the
    // budget subset law (cap=3 ⊂ cap=7) is asserted in-query.
    "q103_source_cap" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val out = graft.operators.CorpusMix.capPerSource(docs, "source", "doc_id", 7)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
      val tight = graft.operators.CorpusMix.capPerSource(docs, "source", "doc_id", 3)
      require(tight.join(out, Seq("doc_id"), "left_anti").count() == 0,
        "q103: the cap=3 survivors must be a subset of the cap=7 survivors")
      out
    },

    // exact top-fraction quality cut without a global sort: the
    // threshold is the rank n−ceil(0.1·n)+1 element found by 4 radix
    // histogram passes over the order-preserving double bit key
    // (Quantiles.keepTopFraction); survivors = score ≥ threshold, ties
    // included. DuckDB re-derives the identical cut from a window rank.
    "q104_quantile_filter" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val score = col("n_chars").cast("double")
      // the discrete-quantile contract itself, pinned in-query against
      // the selection's own count-free rank rule
      val th = graft.operators.Quantiles.topFractionThreshold(docs, score, 0.1)
      val out = graft.operators.Quantiles.keepTopFraction(docs, score, 0.1)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
      require(out.filter(col("n_chars").cast("double") < th).count() == 0,
        "q104: every survivor must clear the threshold")
      out
    },

    // BPE tokenizer TRAINING (Sennrich ACL 2016): distributed word
    // counts (one shuffle), then the exact driver merge loop with
    // incremental pair counts. Output = the 8-merge table with counts.
    // DuckDB replays training verbatim: 8 unrolled rounds, each
    // counting symbol pairs over the dict and applying the argmax via
    // a boundary-anchored replace (ties by count DESC, pair ASC in
    // binary collation — the trainer pins UTF-8 byte order to match).
    "q105_bpe_train" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val model = graft.operators.Bpe.train(docs, "text", 8)
      import s.implicits._
      model.merges.zipWithIndex.map { case ((l, r), i) =>
        (i + 1, l, r, model.counts(i))
      }.toDF("rank", "left", "right", "cnt").orderBy(col("rank"))
    },

    // BPE ENCODING with the same-corpus 8-merge model: every word
    // replays the merge list in rank order (left-to-right
    // non-overlapping passes), token arrays concatenate in word order.
    // DuckDB re-derives the model AND the per-document token sequence
    // (joined by 0x01) — a byte-exact oracle over the full tokenizer.
    "q106_bpe_encode" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val model = graft.operators.Bpe.train(docs, "text", 8)
      val enc = graft.operators.Bpe.encode(docs, "text", model)
      enc.select(col("doc_id"),
          when(col("tokens").isNull, lit(null).cast("string"))
            .otherwise(array_join(col("tokens"), "\u0001")).as("tokens_str"), // 0x01 joiner = the oracle's chr(1)
          when(col("tokens").isNull, lit(null).cast("int"))
            .otherwise(size(col("tokens"))).as("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // per-group exact quantile cut (the FineWeb per-language threshold
    // shape): every source keeps its own top 20% by length — all 20
    // groups selected in the SAME 4 radix passes (histograms keyed by
    // (group, digit), prefixes applied through one literal map).
    // DuckDB re-derives each group's threshold with a partitioned
    // window rank.
    "q107_group_quantile_cut" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.operators.Quantiles.keepTopFractionByGroup(
          docs, col("source"), col("n_chars").cast("double"), 0.2)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // token IDS — the tokenizer's actual deliverable: alphabet symbols
    // id 0..|A|−1 in UTF-8 order, merge products |A|+rank (first id
    // owns a repeated product string), out-of-vocab −1. DuckDB
    // rebuilds the numbering from the replayed model alone and
    // re-derives every document's id sequence.
    "q111_bpe_token_ids" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val model = graft.operators.Bpe.train(docs, "text", 8)
      val enc = graft.operators.Bpe.encodeIds(docs, "text", model)
      enc.select(col("doc_id"),
          when(col("token_ids").isNull, lit(null).cast("string"))
            .otherwise(array_join(transform(col("token_ids"),
              _.cast("string")), ",")).as("ids_str"),
          when(col("token_ids").isNull, lit(null).cast("int"))
            .otherwise(size(filter(col("token_ids"), _ === lit(-1)))).as("n_unk"))
        .orderBy(col("doc_id"))
    },

    // token-mass budget cut: keep the documents carrying the TOP 25%
    // of total TOKEN mass by length score — the budget curation is
    // actually denominated in (a document-count cut over-admits short
    // docs). Threshold = the value at mass rank W − ceil(0.25·W) + 1,
    // found by the same radix passes with mass-summing histograms.
    // DuckDB re-derives it from a value-grouped cumulative-mass walk.
    "q110_mass_quantile_cut" -> { (s, dir) =>
      import s.implicits._
      // two SYNTHETIC zero-mass docs (empty / whitespace-only text,
      // n_chars above any real doc) unioned into BOTH engines' input:
      // the round-17 empty-text weight guard (zero-mass rows carry no
      // selection mass but still pass the value filter) is exercised on
      // every run instead of depending on the generated corpus
      // containing such a doc (round-18 verdict item 6)
      val synth = Seq((900000001L, "", 1000000L), (900000002L, " \t\n ", 1000001L))
        .toDF("doc_id", "text", "n_chars")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars"))
        .unionByName(synth)
      val w = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
      graft.operators.Quantiles.keepTopFractionByMass(
          docs, col("n_chars").cast("double"), w, 0.25)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Tukey-fence outlier gate with EXACT quartiles: drop documents
    // whose length lies outside [q1 − 1.5·IQR, q3 + 1.5·IQR] — the
    // robust fence a mean±σ rule can't give (outliers drag the mean).
    // DuckDB re-derives both quartiles by window rank and re-applies
    // the same fence arithmetic.
    "q115_iqr_fence" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.operators.Quantiles.keepWithinIqrFence(
          docs, col("n_chars").cast("double"), 1.5)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // batch ≡ streaming parity, CERTIFIED (round-17 verdict item 5):
    // the STREAMING cofactor runs over lineitem chopped into 8 real
    // file-source micro-batches, the final ring state projects exactly
    // like q02 — and the q02 oracle SQL grades it. Triples are
    // mergeable; this row is the proof the driver can check.
    "q116_streaming_cofactor" -> { (s, dir) =>
      Graft.register(s)
      graft.streaming.StreamingParity.cofactorFlat(s, dir)
    },

    // streaming sessionize (flatMapGroupsWithState + event-time
    // timeout) over the events table in 8 ordered event-time-range
    // micro-batches + a watermark fencepost, aggregated to q33's
    // summary shape — q33's oracle SQL grades it.
    "q117_streaming_sessionize" -> { (s, dir) =>
      graft.streaming.StreamingParity.sessionSummary(s, dir, eventsSchema)
    },

    // multimodal decode, CERTIFIED (round-17 verdict item 4): real BMP
    // payloads built from pinned pixel formulas (MediaFixtures), decoded
    // back through the REAL ImageIO path, reduced to per-cell INTEGER
    // luminance sums; the oracle re-derives every value arithmetically —
    // a drift in writer, JDK decode, or grid reduction breaks the hash.
    "q118_image_grid" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
      val media = graft.operators.MediaFixtures.withBmp(docs, "doc_id")
      graft.operators.Multimodal.imageGridStats(media, "doc_id", "img", 3)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("cell"))
    },

    // real RIFF/WAVE PCM payloads → javax.sound decode → per-window
    // INTEGER sample sums + header metadata, against the same formulas.
    "q119_audio_windows" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
      val media = graft.operators.MediaFixtures.withWav(docs, "doc_id")
      graft.operators.Multimodal.audioWindowStats(media, "doc_id", "audio", 4)
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"), col("win"))
    },

    // real ISO-BMFF box structure → the pure-JVM MP4 chunk walk →
    // (format, dimensions, duration) against the pinned formulas.
    "q120_video_meta" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
      val media = graft.operators.MediaFixtures.withMp4(docs, "doc_id")
      graft.operators.Multimodal.videoMetaStats(media, "doc_id", "video")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // the RIFF/AVI side of the same walk (little-endian chunk list +
    // avih main header) — distinct formulas so a dispatch bug between
    // the MP4 and AVI parsers cannot alias into a green row.
    "q121_video_meta_avi" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
      val media = graft.operators.MediaFixtures.withAvi(docs, "doc_id")
      graft.operators.Multimodal.videoMetaStats(media, "doc_id", "video")
        .withColumnRenamed("id", "doc_id")
        .orderBy(col("doc_id"))
    },

    // streaming curation (quality gate → lang tag → watermark-bounded
    // fingerprint dedup) over 4 real micro-batches, summarized
    // arrival-order-free (duplicates share text, so per-language counts
    // and char sums are deterministic); the oracle recomputes the whole
    // pipeline from the q12 quality and q13 language formulas with
    // text-keyed dedup. Threshold 0.1 sits 8e-4 from the nearest score
    // on this corpus — no ulp hazard.
    "q122_streaming_curation" -> { (s, dir) =>
      graft.streaming.StreamingParity.curationSummary(s, dir)
    },

    // streaming SEMANTIC dedup over ascending-id micro-batches: greedy
    // first-arrival survivors (pairwise vs already-kept — deliberately
    // NOT q60's transitive connected-components contract; see
    // StreamingParity.semanticDedupSurvivors). The oracle replays the
    // greedy scan with a recursive CTE over the exact-integer SDC pair
    // list (the q60 code/pair derivation).
    "q123_streaming_semantic_dedup" -> { (s, dir) =>
      graft.streaming.StreamingParity.semanticDedupSurvivors(s, dir, synthCb, 0.55)
    },

    // streaming as-of join over both sides' ordered micro-batches
    // (dual fenceposts — the union's global watermark is the min of
    // the two sides'), projected to q44's shape and graded by q44's
    // oracle verbatim: the last streaming operator without a certified
    // row.
    "q124_streaming_asof" -> { (s, dir) =>
      graft.streaming.StreamingParity.asofSummary(s, dir, eventsSchema)
    },

    // UNGROUPED scan summary — the flat SUM/AVG/COUNT moments shape.
    // Under the Verify session's installed strategies this plans as
    // FlatMomentsKernelExec (one flat kernel scan, the single summary
    // row folded driver-side), so the oracle certifies the ROUTED
    // plan; without strategies it is the stock codegen aggregate —
    // identical answer either way is exactly the claim.
    "q125_flat_moments" -> { (s, dir) =>
      li(s, dir).agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("avg_disc_price"),
        count(lit(1)).as("cnt"))
    },

    // the extractFeatures embedding PLUMBING, certified (r19 verdict
    // gap 2): pinned BMP payloads decode through the REAL ImageIO path
    // inside extractFeatures' mapPartitions batch shape, with the
    // exact-integer grid decoder (per-cell milli-luminance sums mod
    // 2^24 — bit-exact as Float on any engine), exploded to one row
    // per (doc, cell). The oracle re-derives every float arithmetically
    // from the fixture pixel formulas — a drift in the BMP writer, the
    // JDK decode, the cell math, or the mapPartitions schema/null
    // plumbing breaks the hash. StubDecoder stays the documented
    // stand-in for codecs with no JVM decode; the plumbing it rides is
    // what this row grades.
    "q126_extract_features" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
      val media = graft.operators.MediaFixtures.withBmp(docs, "doc_id")
      graft.operators.Multimodal.extractFeatures(media, "img", 9,
          graft.operators.Multimodal.ExactGridDecoder)
        .select(col("doc_id"), posexplode(col("features")))
        .select(col("doc_id"), col("pos").as("cell"), col("col").as("feat"))
        .orderBy(col("doc_id"), col("cell"))
    },

    // the reproducible dataset-card pipeline, end to end: per-source
    // caps → source-weighted mixture → deterministic train/val/test
    // split → the per-(split, source) card counts. Every stage keys
    // off the same pinned portable hash, so DuckDB re-derives the
    // ENTIRE funnel — survivor set, epoch copies, split buckets, and
    // the final counts — from doc_id alone.
    "q114_dataset_card" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val capped = graft.operators.CorpusMix.capPerSource(docs, "source", "doc_id", 15)
      val mixed = graft.operators.CorpusMix.compose(capped, "source", "doc_id",
        Map("src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.25, "src3" -> 1.5,
            "src4" -> 0.5, "src5" -> 3.0))
      mixed
        .withColumn("split", graft.operators.StableSplit.stableSplit(
          col("doc_id"), Seq(0.8, 0.1, 0.1)))
        .groupBy(col("split"), col("source"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_chars")).as("chars"))
        .orderBy(col("split"), col("source"))
    },

    // the reference's IMPUTATION applied to pipeline metadata: docs
    // with doc_id % 5 == 0 "lose" their lang tag; a ring-trained LDA
    // over two text-kernel features (token count, token byte mass)
    // fills them in — cofactor lift on the observed stratum, pure-
    // Column predict on the missing one, exactly the MICE column-
    // update shape. The string class rides as an arithmetic int code
    // (ascii·256+ascii), decoded back with char() — both engines
    // re-derive the same coding, so DuckDB retrains the closed-form
    // LDA from scratch and re-predicts every missing row.
    "q113_impute_lang" -> { (s, dir) =>
      Graft.register(s)
      val g = graft.functions.TextFunctions.gopherStats(col("text"))
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), g.as("g"))
        .select(col("doc_id"), col("lang"),
          col("g.n_tokens").cast("double").as("f1"),
          col("g.n_token_chars").cast("double").as("f2"),
          (ascii(substring(col("lang"), 1, 1)) * 256 +
            ascii(substring(col("lang"), 2, 1))).as("cls"))
      val observed = docs.filter(col("doc_id") % 5 =!= 0)
      val t = Graft.cofactor(observed.select(col("f1"), col("f2"), col("cls")),
        Seq("f1", "f2"), Seq("cls"))
      val m = graft.ml.Lda.train(t, label = 0)
      docs
        .withColumn("p", graft.ml.Lda.predict(m, Seq(col("f1"), col("f2")), Seq()))
        .select(col("doc_id"),
          when(col("doc_id") % 5 =!= 0, col("lang"))
            .otherwise(concat(expr("char(p div 256)"), expr("char(p % 256)")))
            .as("lang_filled"),
          (col("doc_id") % 5 === 0).as("was_imputed"))
        .orderBy(col("doc_id"))
    },

    // per-source token-mass budget: EVERY source keeps the documents
    // carrying its own top 30% of token mass by length score — the
    // group and mass axes composed in the same 4 radix passes.
    "q112_group_mass_cut" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val w = graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
      graft.operators.Quantiles.keepTopMassFractionByGroup(
          docs, col("source"), col("n_chars").cast("double"), w, 0.3)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    },

    // quality-stratified mixture (the DoReMi-lite shape): per-source
    // exact QUARTILE thresholds (the 4-scan radix selection — 0.25 and
    // 0.75 are FP-exact, so both engines bucket identically) stratify
    // documents lo / mid / hi, and the mixture composes per stratum
    // (lo ×0.25, mid ×1.0, hi ×2.5). DuckDB re-derives the thresholds
    // with window ranks and replays the HUGEINT mixture rule.
    "q109_quality_mixture" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val score = col("n_chars").cast("double")
      val q = graft.operators.Quantiles
      val t1 = q.quantileDiscByGroup(docs, col("source"), score, 0.25)
      val t2 = q.quantileDiscByGroup(docs, col("source"), score, 0.75)
      def litMap(m: Map[String, Double]) = map(m.toSeq.sortBy(_._1)
        .flatMap { case (g, v) => Seq(lit(g), lit(v)) }: _*)
      val bucket = when(score <= element_at(litMap(t1), col("source")), "lo")
        .when(score <= element_at(litMap(t2), col("source")), "mid")
        .otherwise("hi")
      val mixed = graft.operators.CorpusMix.compose(
        docs.withColumn("bucket", bucket), "bucket", "doc_id",
        Map("lo" -> 0.25, "mid" -> 1.0, "hi" -> 2.5))
      mixed.select(col("doc_id"), col("source"), col("bucket"), col("epoch"))
        .orderBy(col("doc_id"), col("epoch"))
    },

    // the full tokenize → pack flow: BPE token counts (the q106 model)
    // feed per-language sequence packing — pack k = the documents
    // whose cumulative BPE token count lands in [k·256, (k+1)·256).
    // DuckDB replays the tokenizer for the counts, then the window
    // cumsum integer-division.
    "q108_bpe_pack" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val model = graft.operators.Bpe.train(docs, "text", 8)
      val enc = graft.operators.Bpe.encode(docs, "text", model)
        .select(col("doc_id"), col("lang"),
          // a NULL-text doc packs as 0 tokens (it still occupies a row)
          coalesce(size(col("tokens")).cast("long"), lit(0L)).as("n_tokens"))
      graft.operators.Pack.assign(enc, col("lang"), col("doc_id"),
          col("n_tokens"), budget = 256L)
        .orderBy(col("doc_id"))
    }
  )

  /** The q105/q106 BPE oracle's unrolled training rounds. `words` must
    * already be bound (word, cnt). Representation: a word's symbols
    * joined by DOUBLED 0x01 separators and wrapped in one more pair —
    * `replace(sp, chr(1)·a·chr(1)chr(1)·b·chr(1), chr(1)·ab·chr(1))`
    * is then exactly a left-to-right non-overlapping merge pass (the
    * single anchor seps keep symbol boundaries exact, the doubled
    * interior means consuming one sep never starves the next match —
    * `a a a a` → `aa aa`, not `aa a a`). Round r: count symbol pairs
    * over w(r−1), argmax by (count DESC, a, b) in binary collation,
    * apply. */
  private def bpeOracleRounds(rounds: Int, carryWord: Boolean): String = {
    val wordSel = if (carryWord) "word, " else ""
    val w0 =
      s"""w0 AS (
         |  SELECT ${wordSel}cnt,
         |         chr(1)||chr(1) || array_to_string(string_split(word, ''), chr(1)||chr(1)) || chr(1)||chr(1) AS sp
         |  FROM words)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT pr[1] AS a, pr[2] AS b, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt, unnest(list_zip(syms[1:len(syms)-1], syms[2:len(syms)])) AS pr
         |    FROM (SELECT cnt, list_filter(string_split(sp, chr(1)), x -> x <> '') AS syms FROM w${r - 1})
         |    WHERE len(syms) >= 2)
         |  GROUP BY 1, 2),
         |b$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |w$r AS (
         |  SELECT ${wordSel}cnt,
         |         replace(sp, chr(1)||a||chr(1)||chr(1)||b||chr(1), chr(1)||a||b||chr(1)) AS sp
         |  FROM w${r - 1}, b$r)""".stripMargin
    }
    (w0 +: rs).mkString(",\n")
  }

  /** The pinned whitespace class as LITERAL backslashes (this is a
    * plain triple-quote, not an interpolator — `\t` here is two
    * characters for DuckDB's regex engine, never a real tab). */
  private val bpeWsClass: String = """[\t\n\x0B\f\r ]+"""

  /** Shared words CTE for the BPE oracles: whitespace-split word
    * counts over non-NULL documents (the trainer's exact contract). */
  private val bpeWordsCte: String =
    """words AS (
      |  SELECT word, count(*) AS cnt FROM (
      |    SELECT unnest(list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
      |                              x -> x <> '')) AS word
      |    FROM documents WHERE text IS NOT NULL)
      |  GROUP BY word)""".stripMargin

  /** `out(r) = price(r) * (1 - discount(r))` — the shared derived-column
    * kernel for the columnar cofactor oracle rows. */
  private val discPriceKernel: (Array[Array[Double]], Array[Double], Int) => Unit =
    (in, out, n) => {
      val e = in(0); val dsc = in(1)
      var r = 0
      while (r < n) { out(r) = e(r) * (1.0 - dsc(r)); r += 1 }
    }

  /** DuckDB-compatible HALF_UP rounding for driver-side computed moments. */
  private def dround(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Drop a MANAGED bucketed scratch table AND its warehouse directory.
    * A fresh session's catalog does not know tables a previous session
    * created, but their warehouse directories persist — saveAsTable then
    * fails with LOCATION_ALREADY_EXISTS. DROP alone is not enough (it is
    * a no-op in the fresh session), so the location is deleted too. */
  private def dropBucketedTable(s: SparkSession, table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    val wh = new java.net.URI(s.conf.get("spark.sql.warehouse.dir"))
    val dir = new java.io.File(
      if (wh.getScheme == "file") wh.getPath
      else s.conf.get("spark.sql.warehouse.dir"), table)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (dir.exists()) rm(dir)
  }

  /** Closed-form integer codebook shared by q55/q56 (m=8, ksub=16,
    * dsub=8 over dim 64): cb[(j·16+k)·8+t] = ((k·5 + t·3 + j·2) mod 17) − 8.
    * 5 is invertible mod 17, so all 16 codewords are distinct within
    * every subspace. The DuckDB oracles regenerate it from the same
    * formula — the codebook is never shipped between the engines. */
  private def synthCb: graft.operators.Pq.PqCodebook = {
    val (m, ksub, dsub) = (8, 16, 8)
    val flat = new Array[Double](m * ksub * dsub)
    for (j <- 0 until m; k <- 0 until ksub; t <- 0 until dsub)
      flat((j * ksub + k) * dsub + t) = ((k * 5 + t * 3 + j * 2) % 17) - 8
    graft.operators.Pq.PqCodebook(m, ksub, dsub, flat)
  }

  /** q31/q42/q43 output shape: per-class NB model parameters, rounded. */
  private def nbTrainOut(s: SparkSession, m: graft.ml.NaiveBayes.Model): DataFrame = {
    import s.implicits._
    m.classes.indices.map(i =>
        (m.classes(i), m.priors(i), m.means(i)(0), m.vars(i)(0),
         m.means(i)(1), m.vars(i)(1), m.catFreq(i)(0).getOrElse(1995, 0.0)))
      .toDF("class", "prior", "mean_qty", "var_qty", "mean_disc", "var_disc", "freq_1995")
      .select(col("class"),
        round(col("prior"), 6).as("prior"),
        round(col("mean_qty"), 5).as("mean_qty"), round(col("var_qty"), 5).as("var_qty"),
        round(col("mean_disc"), 5).as("mean_disc"), round(col("var_disc"), 5).as("var_disc"),
        round(col("freq_1995"), 6).as("freq_1995"))
      .orderBy(col("class"))
  }

  /** Fixture for the categorical-predict oracles: the class-shifted
    * numeric feature of [[mlPredictData]] plus a binary categorical
    * `c = (l_orderkey % 3 + l_linenumber) % 2` — exact integer
    * arithmetic both engines compute identically, class-informative,
    * and with both levels present inside every class (so per-class
    * covariances stay nonsingular for QDA). */
  private def mlCatPredictData(s: SparkSession, dir: String): DataFrame =
    li(s, dir).select(col("l_linenumber"),
      (col("l_quantity") / 10 + col("l_linenumber") * 6).as("x1"),
      ((col("l_orderkey") % 3 + col("l_linenumber")) % 2).cast("int").as("c"))

  private def mlCatPredictOut(data: DataFrame, pred: Column): DataFrame =
    data.groupBy(col("l_linenumber"), col("x1"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("l_linenumber"),
        round(col("x1") * 10).cast("long").as("ix1"),
        col("c").cast("long").as("c"),
        col("cnt"), pred.as("pred"))
      .orderBy(col("l_linenumber"), col("ix1"), col("c"))

  /** Shared fixture for the predict-oracle queries: class-shifted features
    * (margin O(σ) ⇒ argmax robust to float divergence) over lineitem. */
  private def mlPredictData(s: SparkSession, dir: String): DataFrame =
    li(s, dir).select(col("l_linenumber"),
      (col("l_quantity") / 10 + col("l_linenumber") * 6).as("x1"),
      (col("l_discount") * 20 + col("l_linenumber")).as("x2"))

  /** Predictions per distinct feature combination, integer-coded: both
    * engines group on bit-identical doubles (same arithmetic on the same
    * inputs) and emit exact-integer codes, so output order and values are
    * fully deterministic. */
  private def mlPredictOut(data: DataFrame, pred: Column): DataFrame =
    data.groupBy(col("l_linenumber"), col("x1"), col("x2"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("l_linenumber"),
        round(col("x1") * 10).cast("long").as("ix1"),
        round(col("x2") * 50).cast("long").as("ix2"),
        col("cnt"), pred.as("pred"))
      .orderBy(col("l_linenumber"), col("ix1"), col("ix2"))

  /** DuckDB-equivalent SQL per query (same aliases, same rounding).
    * q39/q40/q41 deliberately REUSE the q28/q02/q24 oracles: the SQL
    * surface and the unfused lifts must reproduce the fused/Scala
    * results bit-for-bit, so the same oracle is the correct check. */
  def oracleSql: Map[String, String] = baseOracleSql ++ Map(
    "q39_lda_sql_surface" -> baseOracleSql("q28_lda_predict"),
    "q40_unfused_lift" -> baseOracleSql("q02_cofactor_flat"),
    "q41_unfused_nb_lift" -> baseOracleSql("q24_nb_agg_moments"),
    // ring add over disjoint halves ≡ the whole (q31's oracle verbatim)
    "q42_nb_ring_add" -> baseOracleSql("q31_nb_train"),
    // ring subtract: whole − odd half ≡ direct aggregation of the even half
    "q43_nb_ring_subtract" -> baseOracleSql("q31_nb_train").replace(
      "FROM lineitem),", "FROM lineitem WHERE l_orderkey % 2 = 0),"))

  private val baseOracleSql: Map[String, String] = Map(
    // exact all-pairs shingle-Jaccard ground truth over the SAME corpus
    // construction (docs ∪ last-word-dropped copies): the oracle builds
    // shingle STRING sets — whole-text shingle when fewer than 3 tokens,
    // mirroring graft.functions.Shingling — and asserts LSH recall 1
    // (found == true), which holds deterministically at r = 2 bands.
    // The Jaccard test is the identical float expression (i/u >= 0.8
    // after DOUBLE division, never i >= 0.8*u) to dodge boundary drift.
    "q14_minhash_neardup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000000 AS doc_id,
        |         regexp_replace(text, '\s+\S+\s*$', '') AS text
        |  FROM documents WHERE doc_id % 10 = 0),
        |tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
        |        FROM all_docs),
        |sh AS (SELECT doc_id,
        |              list_distinct(CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
        |                ELSE list_transform(generate_series(1, len(t) - 2),
        |                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |              END) AS s
        |       FROM tok),
        |truth AS (
        |  SELECT count(*) AS n_true FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND (CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 0.0
        |         ELSE len(list_intersect(a.s, b.s))::DOUBLE
        |              / len(list_distinct(list_concat(a.s, b.s)))::DOUBLE END) >= 0.8)
        |SELECT (SELECT count(*) FROM all_docs) AS n_input,
        |       n_true, n_true AS n_found, 10000::BIGINT AS recall_x1e4
        |FROM truth""".stripMargin,
    // n_input/n_planted computed; the three pair counts are frozen golden
    // values of the library-defined hash family at sf0.01 (reference
    // discipline test/python/test_sum.py:22-52). n_banded ==
    // n_bruteforce additionally holds by pigeonhole (Hamming ≤ 3 over
    // four disjoint 16-bit chunks forces one equal chunk).
    "q15_simhash" ->
      """SELECT (SELECT count(*) FROM documents)
        |         + (SELECT count(*) FROM documents WHERE doc_id % 10 = 0) AS n_input,
        |       (SELECT count(*) FROM documents WHERE doc_id % 10 = 0) AS n_planted,
        |       75::BIGINT AS n_bruteforce,
        |       75::BIGINT AS n_banded,
        |       38::BIGINT AS n_planted_found""".stripMargin,
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_extendedprice * (1 - l_discount)), 2) AS avg_disc_price,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_cofactor_flat" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_quantity * l_quantity), 2) AS avg_qty_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       round(avg(l_extendedprice * l_extendedprice), 2) AS avg_price_price
        |FROM lineitem""".stripMargin,
    "q03_cofactor_grouped" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q04_cofactor_cat_counts" ->
      """SELECT l_linenumber, count(*) AS cnt
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,
    "q05_cofactor_numcat" ->
      """SELECT l_linenumber, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,
    "q06_cofactor_cat_pairs" ->
      """SELECT l_linenumber, year(l_shipdate) AS shipyear, count(*) AS cnt
        |FROM lineitem GROUP BY l_linenumber, year(l_shipdate)
        |ORDER BY l_linenumber, shipyear""".stripMargin,
    "q07_linreg_train" ->
      """SELECT round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icpt
        |FROM lineitem""".stripMargin,
    "q08_linreg_predict" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(r.s * l_quantity + r.i, 2) AS pred
        |FROM lineitem,
        |     (SELECT regr_slope(l_extendedprice, l_quantity) AS s,
        |             regr_intercept(l_extendedprice, l_quantity) AS i
        |      FROM lineitem) r
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q09_factorized_join" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(o_totalprice), 2) AS avg_total,
        |       round(avg(l_quantity * o_totalprice), 2) AS avg_qty_total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    "q10_token_stats" ->
      """SELECT doc_id,
        |       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |       len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_distinct,
        |       length(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q11_dedup_exact" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |         row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "q12_quality_score" ->
      """SELECT doc_id,
        |       floor(least(1.0, length(text) / 500.0)
        |             * (len(list_distinct(string_split_regex(trim(text), '\s+')))::DOUBLE
        |                / len(string_split_regex(trim(text), '\s+')))
        |             * greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::DOUBLE
        |                                    / length(text)) * 4.0)
        |             * 10000 + 0.5) / 10000 AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q16_knn_bruteforce" ->
      """SELECT qId, cId, rank, cos FROM (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank,
        |         round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 3) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 20) t
        |WHERE rank <= 3 ORDER BY qId, rank""".stripMargin,
    "q17_embedding_neardup" ->
      """SELECT a.vec_id AS idA, b.vec_id AS idB,
        |       round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 3) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 2000 AND b.vec_id < 2000
        |  AND list_cosine_similarity(a.embedding, b.embedding) >= 0.35
        |ORDER BY idA, idB""".stripMargin,
    "q19_window_running" ->
      """SELECT l_suppkey, rn, run_qty FROM (
        |  SELECT l_suppkey,
        |         row_number() OVER w AS rn,
        |         round(sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_qty
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber)) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q20_setops" ->
      """SELECT DISTINCT nk FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey AS nk FROM supplier) t
        |ORDER BY nk""".stripMargin,
    "q21_antijoin" ->
      """SELECT o_orderkey FROM orders
        |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q22_topk_orders" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q23_star_join" ->
      """SELECT n_name, count(*) AS cnt,
        |       round(avg(l_extendedprice * (1 - l_discount)), 2) AS avg_rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q13_langid_counts" ->
      """WITH langs(lang, words) AS (VALUES
        |  ('de', ['der','die','das','und','ist','nicht','ein','eine','mit','für','auf','von']),
        |  ('en', ['the','a','of','and','to','in','is','it','that','for','on','with','as']),
        |  ('es', ['el','la','los','las','y','es','un','una','para','en','que','de']),
        |  ('fr', ['le','la','les','et','est','un','une','pour','dans','que','des','du']),
        |  ('it', ['il','lo','la','e','è','un','una','per','che','di','non','con'])),
        |tok AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
        |        FROM documents),
        |scored AS (SELECT doc_id, lang,
        |                  len(list_filter(ts, t -> list_contains(words, t))) AS score
        |           FROM tok, langs),
        |best AS (SELECT doc_id, lang, score,
        |                row_number() OVER (PARTITION BY doc_id
        |                  ORDER BY score DESC, lang DESC) AS rn
        |         FROM scored)
        |SELECT CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
        |       count(*) AS cnt
        |FROM best WHERE rn = 1
        |GROUP BY 1 ORDER BY lang_pred""".stripMargin,
    "q18_mice_impute" ->
      """WITH d AS (
        |  SELECT l_quantity AS q, l_discount AS d0,
        |         ((l_orderkey*2654435761 + l_linenumber*40503) % 1000) < 150 AS miss
        |  FROM lineitem),
        |r AS (SELECT regr_slope(d0, q) AS s, regr_intercept(d0, q) AS i
        |      FROM d WHERE NOT miss)
        |SELECT count(*) AS n_rows,
        |       count(CASE WHEN miss THEN 1 END) AS n_imputed,
        |       round(sqrt(avg(CASE WHEN miss
        |         THEN (r.s*q + r.i - d0)*(r.s*q + r.i - d0) END)), 4) AS rmse
        |FROM d, r""".stripMargin,
    "q24_nb_agg_moments" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(sum(l_quantity*l_quantity), 2) AS sum_qty_sq,
        |       round(avg(l_extendedprice*l_extendedprice), 2) AS avg_price_sq,
        |       count(DISTINCT l_linenumber) AS n_classes
        |FROM lineitem""".stripMargin,
    "q25_nb_agg_grouped" ->
      """SELECT l_returnflag, l_linenumber, count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linenumber
        |ORDER BY l_returnflag, l_linenumber""".stripMargin,
    "q26_nb_factorized" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(p_retailprice), 2) AS avg_retail,
        |       round(sum(l_quantity*l_quantity), 2) AS sum_qty_sq,
        |       round(avg(p_retailprice*p_retailprice), 2) AS avg_retail_sq
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
    "q27_lda_train" ->
      """WITH cls AS (
        |  SELECT l_linenumber AS class, count(*)::DOUBLE AS nc,
        |         sum(l_quantity) AS s1, sum(l_discount*100) AS s2
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT count(*)::DOUBLE FROM lineitem) AS n,
        |         (SELECT sum(l_quantity*l_quantity) FROM lineitem) AS q11,
        |         (SELECT sum(l_quantity*(l_discount*100)) FROM lineitem) AS q12,
        |         (SELECT sum((l_discount*100)*(l_discount*100)) FROM lineitem) AS q22,
        |         sum(s1*s1/nc) AS w11, sum(s1*s2/nc) AS w12, sum(s2*s2/nc) AS w22
        |  FROM cls),
        |sm AS (SELECT n, (q11-w11)/n AS v11, (q12-w12)/n AS v12, (q22-w22)/n AS v22 FROM tot),
        |inv AS (SELECT n, v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |               v11/(v11*v22-v12*v12) AS i22 FROM sm)
        |SELECT cls.class,
        |       round(i11*(s1/nc) + i12*(s2/nc), 5) AS coef_qty,
        |       round(i12*(s1/nc) + i22*(s2/nc), 5) AS coef_disc,
        |       round(-0.5*((s1/nc)*(i11*(s1/nc)+i12*(s2/nc))
        |                   + (s2/nc)*(i12*(s1/nc)+i22*(s2/nc))) + ln(nc/n), 5) AS icpt
        |FROM cls, inv ORDER BY class""".stripMargin,
    "q28_lda_predict" ->
      """WITH d AS (
        |  SELECT l_linenumber,
        |         l_quantity/10 + l_linenumber*6 AS x1,
        |         l_discount*20 + l_linenumber AS x2
        |  FROM lineitem),
        |cls AS (SELECT l_linenumber AS cls, count(*)::DOUBLE AS nc,
        |               sum(x1) AS s1, sum(x2) AS s2
        |        FROM d GROUP BY 1),
        |tot AS (SELECT (SELECT count(*)::DOUBLE FROM d) AS n,
        |               (SELECT sum(x1*x1) FROM d) AS q11,
        |               (SELECT sum(x1*x2) FROM d) AS q12,
        |               (SELECT sum(x2*x2) FROM d) AS q22,
        |               sum(s1*s1/nc) AS w11, sum(s1*s2/nc) AS w12, sum(s2*s2/nc) AS w22
        |        FROM cls),
        |sm AS (SELECT n, (q11-w11)/n AS v11, (q12-w12)/n AS v12, (q22-w22)/n AS v22 FROM tot),
        |inv AS (SELECT n, v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |               v11/(v11*v22-v12*v12) AS i22 FROM sm),
        |coefs AS (SELECT cls, i11*(s1/nc)+i12*(s2/nc) AS w1, i12*(s1/nc)+i22*(s2/nc) AS w2,
        |                 -0.5*((s1/nc)*(i11*(s1/nc)+i12*(s2/nc))
        |                       + (s2/nc)*(i12*(s1/nc)+i22*(s2/nc))) + ln(nc/n) AS b
        |          FROM cls, inv),
        |g AS (SELECT l_linenumber, x1, x2, count(*) AS cnt FROM d GROUP BY 1, 2, 3),
        |scored AS (SELECT g.l_linenumber, g.x1, g.x2, g.cnt, c.cls,
        |                  row_number() OVER (PARTITION BY g.l_linenumber, g.x1, g.x2
        |                    ORDER BY c.w1*g.x1 + c.w2*g.x2 + c.b DESC, c.cls) AS rn
        |           FROM g, coefs c)
        |SELECT l_linenumber, CAST(round(x1*10) AS BIGINT) AS ix1,
        |       CAST(round(x2*50) AS BIGINT) AS ix2, cnt, cls AS pred
        |FROM scored WHERE rn = 1
        |ORDER BY l_linenumber, ix1, ix2""".stripMargin,
    "q29_qda_train" ->
      """WITH d AS (SELECT l_linenumber AS class, l_quantity AS x1, l_discount*100 AS x2
        |           FROM lineitem),
        |nt AS (SELECT count(*)::DOUBLE AS n FROM d),
        |c AS (SELECT class, count(*)::DOUBLE AS nc, avg(x1) AS m1, avg(x2) AS m2,
        |             sum(x1*x1)/count(*) - avg(x1)*avg(x1) AS v11,
        |             sum(x1*x2)/count(*) - avg(x1)*avg(x2) AS v12,
        |             sum(x2*x2)/count(*) - avg(x2)*avg(x2) AS v22
        |      FROM d GROUP BY 1),
        |i AS (SELECT class, nc, m1, m2, v11*v22 - v12*v12 AS det,
        |             v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |             v11/(v11*v22-v12*v12) AS i22
        |      FROM c)
        |SELECT class,
        |       round(-0.5*i11, 5) AS q11, round(-0.5*i12, 5) AS q12, round(-0.5*i22, 5) AS q22,
        |       round(i11*m1 + i12*m2, 5) AS l1, round(i12*m1 + i22*m2, 5) AS l2,
        |       round(-0.5*(m1*(i11*m1+i12*m2) + m2*(i12*m1+i22*m2)) - 0.5*ln(det)
        |             + ln(nc/(SELECT n FROM nt)), 5) AS cst
        |FROM i ORDER BY class""".stripMargin,
    "q30_qda_predict" ->
      """WITH d AS (SELECT l_linenumber,
        |                  l_quantity/10 + l_linenumber*6 AS x1,
        |                  l_discount*20 + l_linenumber AS x2 FROM lineitem),
        |nt AS (SELECT count(*)::DOUBLE AS n FROM d),
        |c AS (SELECT l_linenumber AS cls, count(*)::DOUBLE AS nc, avg(x1) AS m1, avg(x2) AS m2,
        |             sum(x1*x1)/count(*) - avg(x1)*avg(x1) AS v11,
        |             sum(x1*x2)/count(*) - avg(x1)*avg(x2) AS v12,
        |             sum(x2*x2)/count(*) - avg(x2)*avg(x2) AS v22
        |      FROM d GROUP BY 1),
        |i AS (SELECT cls, nc, m1, m2, v11*v22-v12*v12 AS det,
        |             v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |             v11/(v11*v22-v12*v12) AS i22 FROM c),
        |g AS (SELECT l_linenumber, x1, x2, count(*) AS cnt FROM d GROUP BY 1, 2, 3),
        |scored AS (SELECT g.l_linenumber, g.x1, g.x2, g.cnt, i.cls,
        |  row_number() OVER (PARTITION BY g.l_linenumber, g.x1, g.x2 ORDER BY
        |    -0.5*(i.i11*g.x1*g.x1 + 2*i.i12*g.x1*g.x2 + i.i22*g.x2*g.x2)
        |    + (i.i11*i.m1 + i.i12*i.m2)*g.x1 + (i.i12*i.m1 + i.i22*i.m2)*g.x2
        |    - 0.5*(i.m1*(i.i11*i.m1+i.i12*i.m2) + i.m2*(i.i12*i.m1+i.i22*i.m2))
        |    - 0.5*ln(i.det) + ln(i.nc/(SELECT n FROM nt)) DESC, i.cls) AS rn
        |  FROM g, i)
        |SELECT l_linenumber, CAST(round(x1*10) AS BIGINT) AS ix1,
        |       CAST(round(x2*50) AS BIGINT) AS ix2, cnt, cls AS pred
        |FROM scored WHERE rn = 1
        |ORDER BY l_linenumber, ix1, ix2""".stripMargin,
    "q31_nb_train" ->
      """WITH d AS (SELECT l_linenumber AS class, l_quantity AS x1, l_discount*100 AS x2,
        |                  year(l_shipdate) AS sy FROM lineitem),
        |nt AS (SELECT count(*)::DOUBLE AS n FROM d)
        |SELECT class,
        |       round(count(*)/(SELECT n FROM nt), 6) AS prior,
        |       round(avg(x1), 5) AS mean_qty,
        |       round(sum(x1*x1)/count(*) - avg(x1)*avg(x1) + 1e-9, 5) AS var_qty,
        |       round(avg(x2), 5) AS mean_disc,
        |       round(sum(x2*x2)/count(*) - avg(x2)*avg(x2) + 1e-9, 5) AS var_disc,
        |       round((count(*) FILTER (WHERE sy = 1995))::DOUBLE / count(*), 6) AS freq_1995
        |FROM d GROUP BY class ORDER BY class""".stripMargin,
    "q34_semijoin" ->
      """SELECT o_orderkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "q35_rollup" ->
      """SELECT coalesce(l_returnflag, '<all>') AS rf,
        |       coalesce(l_linestatus, '<all>') AS ls,
        |       count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "q33_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
        |m AS (SELECT user_id, event_id, t,
        |        CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS ns_flag
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id,
        |        sum(ns_flag) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM m),
        |sessions AS (SELECT user_id, sess, count(*) AS cnt FROM s GROUP BY user_id, sess)
        |SELECT user_id, count(*) AS n_sessions, sum(cnt)::BIGINT AS n_events,
        |       max(cnt) AS max_sess_events
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q32_nb_predict" ->
      """WITH d AS (SELECT l_linenumber,
        |                  l_quantity/10 + l_linenumber*6 AS x1,
        |                  l_discount*20 + l_linenumber AS x2 FROM lineitem),
        |nt AS (SELECT count(*)::DOUBLE AS n FROM d),
        |c AS (SELECT l_linenumber AS cls, count(*)::DOUBLE AS nc,
        |             avg(x1) AS m1, sum(x1*x1)/count(*) - avg(x1)*avg(x1) + 1e-9 AS v1,
        |             avg(x2) AS m2, sum(x2*x2)/count(*) - avg(x2)*avg(x2) + 1e-9 AS v2
        |      FROM d GROUP BY 1),
        |g AS (SELECT l_linenumber, x1, x2, count(*) AS cnt FROM d GROUP BY 1, 2, 3),
        |scored AS (SELECT g.l_linenumber, g.x1, g.x2, g.cnt, c.cls,
        |  row_number() OVER (PARTITION BY g.l_linenumber, g.x1, g.x2 ORDER BY
        |    ln(c.nc/(SELECT n FROM nt)) - 0.5*ln(2*pi()*c.v1)
        |      - (g.x1-c.m1)*(g.x1-c.m1)/(2*c.v1)
        |    - 0.5*ln(2*pi()*c.v2) - (g.x2-c.m2)*(g.x2-c.m2)/(2*c.v2) DESC, c.cls) AS rn
        |  FROM g, c)
        |SELECT l_linenumber, CAST(round(x1*10) AS BIGINT) AS ix1,
        |       CAST(round(x2*50) AS BIGINT) AS ix2, cnt, cls AS pred
        |FROM scored WHERE rn = 1
        |ORDER BY l_linenumber, ix1, ix2""".stripMargin,
    // closed-form LDA on [x1, 1{c=1}] — affine-equivalent to the
    // library's full-one-hot + pinv model, so predictions coincide
    "q36_lda_predict_cat" ->
      """WITH d AS (
        |  SELECT l_linenumber,
        |         l_quantity/10 + l_linenumber*6 AS x1,
        |         (l_orderkey % 3 + l_linenumber) % 2 AS c,
        |         CASE WHEN (l_orderkey % 3 + l_linenumber) % 2 = 1
        |              THEN 1.0 ELSE 0.0 END AS h
        |  FROM lineitem),
        |cls AS (SELECT l_linenumber AS cls, count(*)::DOUBLE AS nc,
        |               sum(x1) AS s1, sum(h) AS s2
        |        FROM d GROUP BY 1),
        |tot AS (SELECT (SELECT count(*)::DOUBLE FROM d) AS n,
        |               (SELECT sum(x1*x1) FROM d) AS q11,
        |               (SELECT sum(x1*h) FROM d) AS q12,
        |               (SELECT sum(h*h) FROM d) AS q22,
        |               sum(s1*s1/nc) AS w11, sum(s1*s2/nc) AS w12, sum(s2*s2/nc) AS w22
        |        FROM cls),
        |sm AS (SELECT n, (q11-w11)/n AS v11, (q12-w12)/n AS v12, (q22-w22)/n AS v22 FROM tot),
        |inv AS (SELECT n, v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |               v11/(v11*v22-v12*v12) AS i22 FROM sm),
        |coefs AS (SELECT cls, i11*(s1/nc)+i12*(s2/nc) AS w1, i12*(s1/nc)+i22*(s2/nc) AS w2,
        |                 -0.5*((s1/nc)*(i11*(s1/nc)+i12*(s2/nc))
        |                       + (s2/nc)*(i12*(s1/nc)+i22*(s2/nc))) + ln(nc/n) AS b
        |          FROM cls, inv),
        |g AS (SELECT l_linenumber, x1, c, h, count(*) AS cnt FROM d GROUP BY 1, 2, 3, 4),
        |scored AS (SELECT g.l_linenumber, g.x1, g.c, g.cnt, co.cls,
        |                  row_number() OVER (PARTITION BY g.l_linenumber, g.x1, g.c
        |                    ORDER BY co.w1*g.x1 + co.w2*g.h + co.b DESC, co.cls) AS rn
        |           FROM g, coefs co)
        |SELECT l_linenumber, CAST(round(x1*10) AS BIGINT) AS ix1,
        |       c::BIGINT AS c, cnt, cls AS pred
        |FROM scored WHERE rn = 1
        |ORDER BY l_linenumber, ix1, c""".stripMargin,
    // per-class 2×2 QDA on [x1, 1{c=1}] — the library's drop-first
    // one-hot yields exactly these features
    "q37_qda_predict_cat" ->
      """WITH d AS (
        |  SELECT l_linenumber,
        |         l_quantity/10 + l_linenumber*6 AS x1,
        |         (l_orderkey % 3 + l_linenumber) % 2 AS c,
        |         CASE WHEN (l_orderkey % 3 + l_linenumber) % 2 = 1
        |              THEN 1.0 ELSE 0.0 END AS h
        |  FROM lineitem),
        |nt AS (SELECT count(*)::DOUBLE AS n FROM d),
        |c AS (SELECT l_linenumber AS cls, count(*)::DOUBLE AS nc, avg(x1) AS m1, avg(h) AS m2,
        |             sum(x1*x1)/count(*) - avg(x1)*avg(x1) AS v11,
        |             sum(x1*h)/count(*) - avg(x1)*avg(h) AS v12,
        |             sum(h*h)/count(*) - avg(h)*avg(h) AS v22
        |      FROM d GROUP BY 1),
        |i AS (SELECT cls, nc, m1, m2, v11*v22-v12*v12 AS det,
        |             v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |             v11/(v11*v22-v12*v12) AS i22 FROM c),
        |g AS (SELECT l_linenumber, x1, c, h, count(*) AS cnt FROM d GROUP BY 1, 2, 3, 4),
        |scored AS (SELECT g.l_linenumber, g.x1, g.c, g.cnt, i.cls,
        |  row_number() OVER (PARTITION BY g.l_linenumber, g.x1, g.c ORDER BY
        |    -0.5*(i.i11*g.x1*g.x1 + 2*i.i12*g.x1*g.h + i.i22*g.h*g.h)
        |    + (i.i11*i.m1 + i.i12*i.m2)*g.x1 + (i.i12*i.m1 + i.i22*i.m2)*g.h
        |    - 0.5*(i.m1*(i.i11*i.m1+i.i12*i.m2) + i.m2*(i.i12*i.m1+i.i22*i.m2))
        |    - 0.5*ln(i.det) + ln(i.nc/(SELECT n FROM nt)) DESC, i.cls) AS rn
        |  FROM g, i)
        |SELECT l_linenumber, CAST(round(x1*10) AS BIGINT) AS ix1,
        |       c::BIGINT AS c, cnt, cls AS pred
        |FROM scored WHERE rn = 1
        |ORDER BY l_linenumber, ix1, c""".stripMargin,
    // quantization grid replicated verbatim; the quantized values are
    // exact small integers (|q| ≤ 127, dim 64), so the dot/norm sums are
    // exact in ANY accumulator and hash bit-identically — no rounding,
    // no -0.0 vs +0.0 representational divergence
    "q47_quantized_cosine" ->
      """WITH qz AS (
        |  SELECT vec_id, q, CAST(list_inner_product(q, q) AS BIGINT) AS n2
        |  FROM (
        |    SELECT vec_id,
        |           list_transform(embedding, x ->
        |             floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END) + 0.5)) AS q
        |    FROM (SELECT vec_id, embedding,
        |                 list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |          FROM embeddings WHERE vec_id < 100)))
        |SELECT a.vec_id AS idA, b.vec_id AS idB,
        |       CAST(list_inner_product(a.q, b.q) AS BIGINT) AS dot,
        |       a.n2 AS na2, b.n2 AS nb2
        |FROM qz a JOIN qz b ON a.vec_id < b.vec_id
        |ORDER BY idA, idB""".stripMargin,
    // n_true recomputed by DuckDB's own brute force; int8_hit is the
    // frozen outcome of the deterministic quantized search (integer
    // arrays → bit-exact cosines; golden discipline, see q15/q45).
    // Near-total recall is the point: the 4× memory cut costs almost
    // nothing in ranking quality.
    "q48_quantized_knn" ->
      """WITH bf AS (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT (SELECT count(*) FROM bf WHERE rank <= 3) AS n_true,
        |       148::BIGINT AS int8_hit, 9866::BIGINT AS int8_recall_x1e4""".stripMargin,
    // the identical grid arithmetic, bound checked in grid units; the
    // HUGEINT sum is cast back to BIGINT (column-hash discipline)
    "q49_dequantize_bound" ->
      """WITH qz AS (
        |  SELECT vec_id, embedding,
        |         CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END AS s
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |        FROM embeddings)),
        |e AS (
        |  SELECT vec_id,
        |         list_max(list_transform(embedding, x ->
        |           abs(x::DOUBLE * s - floor(x::DOUBLE * s + 0.5)))) AS gridErr
        |  FROM qz)
        |SELECT count(*) AS n_vectors,
        |       CAST(sum(CASE WHEN gridErr > 0.5 + 1e-9 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
        |FROM e""".stripMargin,
    // DuckDB evaluates the inequality join natively — independent ground
    // truth for the bucketized formulation
    "q46_range_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
        |err AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'error'),
        |c AS (SELECT user_id, t FROM e WHERE event_type = 'click')
        |SELECT err.event_id, count(c.t) AS n_clicks
        |FROM err LEFT JOIN c
        |  ON c.user_id = err.user_id AND c.t BETWEEN err.t - 300000000 AND err.t
        |GROUP BY err.event_id ORDER BY err.event_id""".stripMargin,
    // n_true recomputed by DuckDB's own brute-force top-3; hit counts
    // are frozen outcomes of the seeded centroids/hyperplanes (golden
    // discipline, see q15; refined centroids are bit-deterministic via
    // ivfBuild's fixed-point mean sums). The synthetic embeddings are
    // near-uniform — the worst case for space partitioning — so recall
    // is expectedly far below 1 and PINNED rather than hidden: IVF at
    // nProbe/nCentroids = 25% of the corpus recovers 41% of true
    // neighbors unrefined, 57% after 3 Lloyd iterations; one LSH table
    // recovers 13%, three seeded tables 29% (the geometric-recall lever).
    "q45_ann_recall" ->
      """WITH bf AS (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT (SELECT count(*) FROM bf WHERE rank <= 3) AS n_true,
        |       61::BIGINT AS ivf_hit, 4066::BIGINT AS ivf_recall_x1e4,
        |       86::BIGINT AS ivf_ref_hit, 5733::BIGINT AS ivf_ref_recall_x1e4,
        |       20::BIGINT AS lsh_hit, 1333::BIGINT AS lsh_recall_x1e4,
        |       44::BIGINT AS lshm_hit, 2933::BIGINT AS lshm_recall_x1e4""".stripMargin,
    // DuckDB's native ASOF JOIN is the independent ground truth for the
    // union+window formulation (same µs-truncated integer timestamps)
    "q44_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
        |c AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
        |v AS (SELECT user_id, t AS vt, max(event_id) AS v_eid
        |      FROM e WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id,
        |       coalesce(v.v_eid, -1) AS view_eid,
        |       coalesce(c.t - v.vt, -1) AS dt_us
        |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.vt <= c.t
        |ORDER BY c.event_id""".stripMargin,
    // Gaussian NB on x1 + conditional-frequency lookup on c
    "q38_nb_predict_cat" ->
      """WITH d AS (
        |  SELECT l_linenumber,
        |         l_quantity/10 + l_linenumber*6 AS x1,
        |         (l_orderkey % 3 + l_linenumber) % 2 AS c
        |  FROM lineitem),
        |nt AS (SELECT count(*)::DOUBLE AS n FROM d),
        |cl AS (SELECT l_linenumber AS cls, count(*)::DOUBLE AS nc,
        |              avg(x1) AS m1, sum(x1*x1)/count(*) - avg(x1)*avg(x1) + 1e-9 AS v1
        |       FROM d GROUP BY 1),
        |fr AS (SELECT l_linenumber AS cls, c, count(*)::DOUBLE AS cnt_c
        |       FROM d GROUP BY 1, 2),
        |g AS (SELECT l_linenumber, x1, c, count(*) AS cnt FROM d GROUP BY 1, 2, 3),
        |scored AS (SELECT g.l_linenumber, g.x1, g.c, g.cnt, cl.cls,
        |  row_number() OVER (PARTITION BY g.l_linenumber, g.x1, g.c ORDER BY
        |    ln(cl.nc/(SELECT n FROM nt)) - 0.5*ln(2*pi()*cl.v1)
        |      - (g.x1-cl.m1)*(g.x1-cl.m1)/(2*cl.v1)
        |      + ln(fr.cnt_c/cl.nc) DESC, cl.cls) AS rn
        |  FROM g
        |  JOIN cl ON true
        |  JOIN fr ON fr.cls = cl.cls AND fr.c = g.c)
        |SELECT l_linenumber, CAST(round(x1*10) AS BIGINT) AS ix1,
        |       c::BIGINT AS c, cnt, cls AS pred
        |FROM scored WHERE rn = 1
        |ORDER BY l_linenumber, ix1, c""".stripMargin,

    // connected components by recursive reachability: comp(id) =
    // min(id) over everything reachable from id — exactly the fixpoint
    // the Spark side's min-label propagation converges to. The UNION
    // (not UNION ALL) dedups (id, comp) states, so the CTE terminates.
    "q50_neardup_components" ->
      """WITH RECURSIVE
        |p AS (SELECT a.doc_id AS ida, b.doc_id AS idb
        |      FROM documents a JOIN documents b
        |        ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang),
        |edges AS (SELECT ida AS src, idb AS dst FROM p
        |          UNION SELECT idb, ida FROM p),
        |reach(id, comp) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id, min(comp) AS component FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,
    // shingles as n-gram strings; docs shorter than n contribute their
    // whole token sequence as one shingle (mirrors Shingling's max(1, ...))
    "q51_decontaminate" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(toks) - 4, 1) + 1),
        |    i -> array_to_string(toks[i:least(i + 4, len(toks))], ' ')))) AS g
        |  FROM tok),
        |bad AS (
        |  SELECT DISTINCT c.doc_id
        |  FROM sh c JOIN (SELECT DISTINCT g FROM sh WHERE doc_id % 37 = 0) b USING (g))
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,
    "q52_pack_sequences" ->
      """SELECT doc_id, lang, tc,
        |       CAST((sum(tc) OVER (PARTITION BY lang ORDER BY doc_id
        |                      ROWS UNBOUNDED PRECEDING) - tc) // 512 AS BIGINT) AS pack
        |FROM (SELECT doc_id, lang,
        |             len(string_split_regex(trim(text), '\s+')) AS tc
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "q53_pii_redaction" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |         || '@example.com or +1 (555) 010-' || CAST(doc_id AS VARCHAR)
        |         || ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 now',
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d[\d\s()-]{7,}\d', '<PHONE>', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q54_repetition_score" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(1, greatest(len(toks) - 1, 1) + 1),
        |    i -> array_to_string(toks[i:least(i + 1, len(toks))], ' '))) AS g
        |  FROM tok),
        |c AS (SELECT doc_id, g, count(*) AS cnt FROM g GROUP BY doc_id, g)
        |SELECT doc_id, round(max(cnt)::DOUBLE / sum(cnt), 6) AS rep
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // independent recompute of the pq_encode argmin: the q47 int8 grid,
    // the closed-form codebook ((k*5 + t*3 + j*2) % 17 - 8), and a
    // row_number argmin with the same lowest-id tie-break as the kernel.
    // All distances are exact integers — no float divergence possible.
    "q55_pq_encode" ->
      """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END) + 0.5)) AS q
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |        FROM embeddings WHERE vec_id < 100)),
        |d AS (
        |  SELECT vec_id, j, k,
        |         list_sum(list_transform(range(0, 8), t ->
        |           (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8))
        |           * (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8)))) AS d2
        |  FROM qz, range(0, 8) js(j), range(0, 16) ks(k))
        |SELECT vec_id, j, k AS code FROM (
        |  SELECT vec_id, j, k,
        |         row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, k) AS rn
        |  FROM d)
        |WHERE rn = 1 ORDER BY vec_id, j""".stripMargin,
    // ADC ≡ dot(query, reconstruction) in exact integers: codes are
    // recomputed as in q55, the reconstruction is reassembled from the
    // codebook formula, and the pair score + (adc DESC, cId) ranking is
    // recomputed natively — checking encode, LUT, ADC, and the top-k
    // window in one query with zero frozen values.
    "q56_pq_adc_topk" ->
      """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END) + 0.5)) AS q
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |        FROM embeddings)),
        |d AS (
        |  SELECT vec_id, j, k,
        |         list_sum(list_transform(range(0, 8), t ->
        |           (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8))
        |           * (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8)))) AS d2
        |  FROM qz, range(0, 8) js(j), range(0, 16) ks(k)),
        |codes AS (
        |  SELECT vec_id, j, k AS code FROM (
        |    SELECT vec_id, j, k,
        |           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, k) AS rn
        |    FROM d)
        |  WHERE rn = 1),
        |rec AS (
        |  SELECT vec_id, flatten(list(sub ORDER BY j)) AS recon
        |  FROM (SELECT vec_id, j, list_transform(range(0, 8), t ->
        |          CAST(((code*5 + t*3 + j*2) % 17) - 8 AS DOUBLE)) AS sub
        |        FROM codes)
        |  GROUP BY vec_id),
        |pairs AS (
        |  SELECT q.vec_id AS qId, c.vec_id AS cId,
        |         CAST(list_inner_product(q.q, c.recon) AS BIGINT) AS adc
        |  FROM (SELECT vec_id, q FROM qz WHERE vec_id < 20) q
        |  JOIN rec c ON c.vec_id <> q.vec_id)
        |SELECT qId, cId, adc, rank FROM (
        |  SELECT qId, cId, adc,
        |         row_number() OVER (PARTITION BY qId ORDER BY adc DESC, cId) AS rank
        |  FROM pairs)
        |WHERE rank <= 3 ORDER BY qId, rank""".stripMargin,
    // n_true recomputed by DuckDB's own brute force (q45 pattern); the
    // hit counts are frozen outcomes of bit-deterministic training
    // (fixed-point Lloyd sums, seeded samples — probed at two
    // parallelism settings). Compare q45: IVF-flat refined = 86/150 at
    // nProbe=4; IVFADC m=16 ksub=128 (18× smaller corpus bytes) = 84 at
    // nProbe=8 with O(m) per-pair work; m=32 (9×) = 108, beating every
    // float path pinned in q45.
    "q57_ivfadc_recall" ->
      """WITH bf AS (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT (SELECT count(*) FROM bf WHERE rank <= 3) AS n_true,
        |       69::BIGINT AS ivfadc4_hit, 4600::BIGINT AS ivfadc4_recall_x1e4,
        |       84::BIGINT AS ivfadc8_hit, 5600::BIGINT AS ivfadc8_recall_x1e4,
        |       108::BIGINT AS ivfadc_wide_hit, 7200::BIGINT AS ivfadc_wide_recall_x1e4,
        |       87::BIGINT AS pqfull_hit, 5800::BIGINT AS pqfull_recall_x1e4""".stripMargin,
    // q57/q45 golden discipline: n_true recomputed by DuckDB, hit
    // counts frozen outcomes of the bit-deterministic seeded build
    // (partition-independence probed at local[32]/32 and local[5]/7).
    // The residual story vs q57's flat rows: 27 > 20 at m=8/nProbe=4
    // (the small-bit-budget lever), 84 = 84 at m=16/ksub=128 (residual
    // ≈ flat when the coarse cells are weak — pinned, not hidden).
    "q58_residual_ivfadc_recall" ->
      """WITH bf AS (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT (SELECT count(*) FROM bf WHERE rank <= 3) AS n_true,
        |       27::BIGINT AS res8p4_hit, 1800::BIGINT AS res8p4_recall_x1e4,
        |       29::BIGINT AS res8p8_hit, 1933::BIGINT AS res8p8_recall_x1e4,
        |       84::BIGINT AS res16p8_hit, 5600::BIGINT AS res16p8_recall_x1e4""".stripMargin,
    // SDC ≡ dot(reconstruction, reconstruction) in exact integers: the
    // q55 argmin recompute feeding a pairwise inner product — no
    // frozen values
    "q59_pq_sdc_pairs" ->
      """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END) + 0.5)) AS q
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |        FROM embeddings WHERE vec_id < 40)),
        |d AS (
        |  SELECT vec_id, j, k,
        |         list_sum(list_transform(range(0, 8), t ->
        |           (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8))
        |           * (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8)))) AS d2
        |  FROM qz, range(0, 8) js(j), range(0, 16) ks(k)),
        |codes AS (
        |  SELECT vec_id, j, k AS code FROM (
        |    SELECT vec_id, j, k,
        |           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, k) AS rn
        |    FROM d)
        |  WHERE rn = 1),
        |rec AS (
        |  SELECT vec_id, flatten(list(sub ORDER BY j)) AS recon
        |  FROM (SELECT vec_id, j, list_transform(range(0, 8), t ->
        |          CAST(((code*5 + t*3 + j*2) % 17) - 8 AS DOUBLE)) AS sub
        |        FROM codes)
        |  GROUP BY vec_id)
        |SELECT a.vec_id AS idA, b.vec_id AS idB,
        |       CAST(list_inner_product(a.recon, b.recon) AS BIGINT) AS sdc
        |FROM rec a JOIN rec b ON a.vec_id < b.vec_id
        |ORDER BY idA, idB""".stripMargin,
    // full pipeline recompute: q55 argmin codes → reconstructions →
    // SDC cosine (identical IEEE sequence: int dot / (sqrt·sqrt)) →
    // recursive-CTE components (q50 pattern) → min-id survivors
    "q60_semantic_dedup" ->
      """WITH RECURSIVE qz AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END) + 0.5)) AS q
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |        FROM embeddings WHERE vec_id < 300)),
        |d AS (
        |  SELECT vec_id, j, k,
        |         list_sum(list_transform(range(0, 8), t ->
        |           (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8))
        |           * (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8)))) AS d2
        |  FROM qz, range(0, 8) js(j), range(0, 16) ks(k)),
        |codes AS (
        |  SELECT vec_id, j, k AS code FROM (
        |    SELECT vec_id, j, k,
        |           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, k) AS rn
        |    FROM d)
        |  WHERE rn = 1),
        |rec AS (
        |  SELECT vec_id, flatten(list(sub ORDER BY j)) AS recon
        |  FROM (SELECT vec_id, j, list_transform(range(0, 8), t ->
        |          CAST(((code*5 + t*3 + j*2) % 17) - 8 AS DOUBLE)) AS sub
        |        FROM codes)
        |  GROUP BY vec_id),
        |n2 AS (SELECT vec_id, recon, list_inner_product(recon, recon) AS na2 FROM rec),
        |p AS (SELECT a.vec_id AS ida, b.vec_id AS idb
        |      FROM n2 a JOIN n2 b ON a.vec_id < b.vec_id
        |      WHERE list_inner_product(a.recon, b.recon)
        |            / (sqrt(a.na2) * sqrt(b.na2)) >= 0.55),
        |edges AS (SELECT ida AS src, idb AS dst FROM p
        |          UNION SELECT idb, ida FROM p),
        |reach(id, comp) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.id),
        |c AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |SELECT vec_id FROM qz
        |WHERE vec_id NOT IN (SELECT id FROM c WHERE id <> comp)
        |ORDER BY vec_id""".stripMargin,
    // all-pairs SDC cosine ranking recomputed natively; only exact
    // integers emitted (sdc, rank); ranking doubles are bit-identical
    // (same IEEE division sequence on both engines)
    "q61_knn_graph" ->
      """WITH qz AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END) + 0.5)) AS q
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |        FROM embeddings WHERE vec_id < 60)),
        |d AS (
        |  SELECT vec_id, j, k,
        |         list_sum(list_transform(range(0, 8), t ->
        |           (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8))
        |           * (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8)))) AS d2
        |  FROM qz, range(0, 8) js(j), range(0, 16) ks(k)),
        |codes AS (
        |  SELECT vec_id, j, k AS code FROM (
        |    SELECT vec_id, j, k,
        |           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, k) AS rn
        |    FROM d)
        |  WHERE rn = 1),
        |rec AS (
        |  SELECT vec_id, flatten(list(sub ORDER BY j)) AS recon
        |  FROM (SELECT vec_id, j, list_transform(range(0, 8), t ->
        |          CAST(((code*5 + t*3 + j*2) % 17) - 8 AS DOUBLE)) AS sub
        |        FROM codes)
        |  GROUP BY vec_id),
        |n2 AS (SELECT vec_id, recon, list_inner_product(recon, recon) AS na2 FROM rec),
        |scored AS (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         CAST(list_inner_product(a.recon, b.recon) AS BIGINT) AS sdc,
        |         row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |           list_inner_product(a.recon, b.recon)
        |             / (sqrt(a.na2) * sqrt(b.na2)) DESC, b.vec_id) AS rank
        |  FROM n2 a JOIN n2 b ON a.vec_id <> b.vec_id)
        |SELECT qId, cId, sdc, rank FROM scored
        |WHERE rank <= 3 ORDER BY qId, rank""".stripMargin,
    // q58 discipline: n_true recomputed, rotated-residual hit counts
    // frozen from the bit-deterministic seeded build. The story these
    // pin vs q58's unrotated rows: 29 > 27 @nProbe=4 and 34 > 29
    // @nProbe=8 at the SAME 32 bits/vector — the OPQ-lite rotation is
    // a free recall lever on the small-bit-budget geometry.
    "q63_opq_rotation_recall" ->
      """WITH bf AS (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT (SELECT count(*) FROM bf WHERE rank <= 3) AS n_true,
        |       29::BIGINT AS rot8p4_hit, 1933::BIGINT AS rot8p4_recall_x1e4,
        |       34::BIGINT AS rot8p8_hit, 2266::BIGINT AS rot8p8_recall_x1e4""".stripMargin,
    // 2-regressor least squares over the join, solved closed-form by
    // Cramer's rule on the 3x3 normal equations — the independent
    // ground truth for the factorized-join trained model (q18's
    // regr_slope discipline, one regressor up)
    "q62_flight_mice_join" ->
      """WITH d AS (
        |  SELECT l_quantity::DOUBLE AS x1, o_totalprice::DOUBLE AS x2,
        |         l_discount::DOUBLE AS y,
        |         ((l_orderkey*2654435761 + l_linenumber*40503) % 1000) < 150 AS miss
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |m AS (
        |  SELECT count(*)::DOUBLE AS n, sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
        |         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
        |         sum(x1*y) AS s1y, sum(x2*y) AS s2y
        |  FROM d WHERE NOT miss),
        |b AS (
        |  SELECT
        |    (sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS b0,
        |    (n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS b1,
        |    (n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS b2
        |  FROM m)
        |SELECT count(*) AS n_rows,
        |       count(CASE WHEN miss THEN 1 END) AS n_imputed,
        |       round(sqrt(avg(CASE WHEN miss THEN
        |         (b.b0 + b.b1*x1 + b.b2*x2 - y)*(b.b0 + b.b1*x1 + b.b2*x2 - y) END)), 4) AS rmse
        |FROM d, b""".stripMargin,
    // one chained round, closed-form: step 1 imputes l_discount from
    // (mean-initialized l_tax, o_totalprice); step 2 imputes l_tax from
    // (step-1-imputed l_discount, o_totalprice) — the second Cramer
    // solve's training moments read the first's predictions, which is
    // exactly the chain the Spark side runs (q62's 3x3 template, twice)
    "q64_chained_mice_join" ->
      """WITH f AS (
        |  SELECT l_discount::DOUBLE AS d_true, l_tax::DOUBLE AS t_true,
        |         o_totalprice::DOUBLE AS p,
        |         ((l_orderkey*2654435761 + l_linenumber*40503) % 1000) < 150 AS miss_d,
        |         ((l_orderkey*7919 + l_linenumber*104729) % 1000) < 150 AS miss_t
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |d0 AS (
        |  SELECT f.*, CASE WHEN miss_t THEN
        |      (SELECT avg(CASE WHEN NOT miss_t THEN t_true END) FROM f)
        |    ELSE t_true END AS t0 FROM f),
        |m1 AS (
        |  SELECT count(*)::DOUBLE AS n, sum(t0) AS sx1, sum(p) AS sx2, sum(d_true) AS sy,
        |         sum(t0*t0) AS s11, sum(t0*p) AS s12, sum(p*p) AS s22,
        |         sum(t0*d_true) AS s1y, sum(p*d_true) AS s2y
        |  FROM d0 WHERE NOT miss_d),
        |cf1 AS (
        |  SELECT
        |    (sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS a0,
        |    (n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS a1,
        |    (n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS a2
        |  FROM m1),
        |d1 AS (
        |  SELECT d0.*, CASE WHEN miss_d THEN cf1.a0 + cf1.a1*t0 + cf1.a2*p
        |    ELSE d_true END AS dd FROM d0, cf1),
        |m2 AS (
        |  SELECT count(*)::DOUBLE AS n, sum(dd) AS sx1, sum(p) AS sx2, sum(t_true) AS sy,
        |         sum(dd*dd) AS s11, sum(dd*p) AS s12, sum(p*p) AS s22,
        |         sum(dd*t_true) AS s1y, sum(p*t_true) AS s2y
        |  FROM d1 WHERE NOT miss_t),
        |cf2 AS (
        |  SELECT
        |    (sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS c0,
        |    (n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS c1,
        |    (n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS c2
        |  FROM m2),
        |o AS (
        |  SELECT d1.*, CASE WHEN miss_t THEN cf2.c0 + cf2.c1*dd + cf2.c2*p
        |    ELSE t_true END AS tt FROM d1, cf2)
        |SELECT count(*) AS n_rows,
        |       count(CASE WHEN miss_d THEN 1 END) AS n_imputed_d,
        |       count(CASE WHEN miss_t THEN 1 END) AS n_imputed_t,
        |       round(sqrt(avg(CASE WHEN miss_d THEN (dd - d_true)*(dd - d_true) END)), 4) AS rmse_d,
        |       round(sqrt(avg(CASE WHEN miss_t THEN (tt - t_true)*(tt - t_true) END)), 4) AS rmse_t
        |FROM o""".stripMargin,
    // q63 discipline: n_true recomputed, OPQ hit counts frozen from the
    // bit-deterministic build (driver-side alternation over the seeded
    // sample; GoldenProbe 32-vs-5 partition-independence). 36 > 29 and
    // 39 > 34 vs q63's random rotation at the SAME 32 bits/vector.
    "q65_opq_nonparametric_recall" ->
      """WITH bf AS (
        |  SELECT a.vec_id AS qId, b.vec_id AS cId,
        |         row_number() OVER (PARTITION BY a.vec_id
        |           ORDER BY list_cosine_similarity(a.embedding, b.embedding) DESC, b.vec_id) AS rank
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 50)
        |SELECT (SELECT count(*) FROM bf WHERE rank <= 3) AS n_true,
        |       36::BIGINT AS opqp4_hit, 2400::BIGINT AS opqp4_recall_x1e4,
        |       39::BIGINT AS opqp8_hit, 2600::BIGINT AS opqp8_recall_x1e4""".stripMargin,
    // q62's 3x3 Cramer template over the MATERIALIZED 2-dim star join —
    // the independent ground truth for the chained-ring-product star
    // cofactor (x1 = dim1 feature, x2 = dim2 feature)
    "q66_star_mice_join" ->
      """WITH d AS (
        |  SELECT o_totalprice::DOUBLE AS x1, p_retailprice::DOUBLE AS x2,
        |         l_discount::DOUBLE AS y,
        |         ((l_orderkey*2654435761 + l_linenumber*40503) % 1000) < 150 AS miss
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey),
        |m AS (
        |  SELECT count(*)::DOUBLE AS n, sum(x1) AS sx1, sum(x2) AS sx2, sum(y) AS sy,
        |         sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x2*x2) AS s22,
        |         sum(x1*y) AS s1y, sum(x2*y) AS s2y
        |  FROM d WHERE NOT miss),
        |b AS (
        |  SELECT
        |    (sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS b0,
        |    (n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS b1,
        |    (n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2))
        |      / (n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)) AS b2
        |  FROM m)
        |SELECT count(*) AS n_rows,
        |       count(CASE WHEN miss THEN 1 END) AS n_imputed,
        |       round(sqrt(avg(CASE WHEN miss THEN
        |         (b.b0 + b.b1*x1 + b.b2*x2 - y)*(b.b0 + b.b1*x1 + b.b2*x2 - y) END)), 4) AS rmse
        |FROM d, b""".stripMargin,
    // plain grouped averages over the join — the independent ground
    // truth for the GROUPED auto-factorized triple's per-group moments
    "q67_grouped_rule_factorized" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       round(avg(l_quantity), 5) AS avg_qty,
        |       round(avg(o_totalprice), 2) AS avg_price,
        |       round(avg(l_quantity*o_totalprice), 2) AS avg_qp
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the materialized skewed join's aggregate — ground truth for the
    // salted SHJ tier (every probe-build pair exactly once)
    "q68_salted_skew_join" ->
      """SELECT count(*) AS n_rows,
        |       round(avg(x), 5) AS avg_x,
        |       round(avg(y), 2) AS avg_y,
        |       round(avg(x*y), 2) AS avg_xy
        |FROM (SELECT l_orderkey % 20 AS k, l_quantity::DOUBLE AS x FROM lineitem) f
        |JOIN (SELECT o_orderkey % 20 AS k, o_totalprice::DOUBLE AS y
        |      FROM orders WHERE o_orderkey < 1000) d USING (k)""".stripMargin,
    // the mixed-route star cofactor's moments vs the materialized
    // 3-way join — ground truth for the fold/aggregate split AND the
    // permute-back of the interleaved block order
    "q69_star_mixed_route" ->
      """SELECT count(*) AS n_rows,
        |       round(avg(o_totalprice), 2) AS avg_price,
        |       round(avg(l_quantity), 5) AS avg_qty,
        |       round(avg(c_acctbal), 2) AS avg_bal,
        |       round(avg(o_totalprice * l_quantity), 2) AS avg_pq,
        |       round(avg(l_quantity * c_acctbal), 2) AS avg_qb
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin,
    // categorical-dim star MICE: least squares with one numeric + one
    // categorical regressor == ANCOVA closed form (per-category
    // intercept ȳ_g − b·x̄_g, shared within-group slope b), so the
    // imputation is recomputed exactly without any matrix inverse
    "q70_star_mice_cat_dim" ->
      """WITH d AS (
        |  SELECT o_totalprice::DOUBLE AS x, (p_size % 5) AS c,
        |         l_discount::DOUBLE AS y,
        |         ((l_orderkey*2654435761 + l_linenumber*40503) % 1000) < 150 AS miss
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey),
        |g AS (SELECT c, avg(x) AS xg, avg(y) AS yg FROM d WHERE NOT miss GROUP BY c),
        |s AS (SELECT sum((d.x - g.xg)*(d.y - g.yg)) / sum((d.x - g.xg)*(d.x - g.xg)) AS b
        |      FROM d JOIN g USING (c) WHERE NOT miss),
        |o AS (SELECT d.y, d.miss,
        |             CASE WHEN d.miss THEN g.yg + s.b*(d.x - g.xg) ELSE d.y END AS yy
        |      FROM d JOIN g USING (c), s)
        |SELECT count(*) AS n_rows,
        |       count(CASE WHEN miss THEN 1 END) AS n_imputed,
        |       round(sqrt(avg(CASE WHEN miss THEN (yy - y)*(yy - y) END)), 4) AS rmse
        |FROM o""".stripMargin,

    "q71_topk_ties" ->
      """SELECT qId, cId, COALESCE(cos, -1.0) AS cos, rank FROM (
        |  SELECT doc_id % 5 AS qId, doc_id AS cId,
        |         CASE WHEN doc_id % 11 = 0 OR doc_id % 5 = 4 THEN NULL
        |              ELSE (doc_id % 7)::DOUBLE END AS cos,
        |         row_number() OVER (PARTITION BY doc_id % 5
        |           ORDER BY (CASE WHEN doc_id % 11 = 0 OR doc_id % 5 = 4 THEN NULL
        |                          ELSE (doc_id % 7)::DOUBLE END) DESC NULLS LAST,
        |                    doc_id) AS rank
        |  FROM documents WHERE doc_id < 50) t
        |WHERE rank <= 4 ORDER BY qId, rank""".stripMargin,
    // q72 reads bucketized COPIES of lineitem/orders (same rows, different
    // physical layout) — the oracle runs over the originals, so a layout
    // bug that drops or duplicates rows cannot hash-match
    "q72_bucketed_join_cofactor" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(o_totalprice), 2) AS avg_total,
        |       round(avg(l_quantity * o_totalprice), 2) AS avg_qty_total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    // q73 joins bucketized copies at MISMATCHED counts (128 vs 64)
    // through the engine's coalescing; the oracle runs over the
    // originals — a coalesce bug that merges the wrong buckets (or
    // drops/duplicates matches) cannot hash-match
    "q73_bucket_coalesced_join" ->
      """SELECT count(*) AS n_rows,
        |       round(avg(l_quantity), 5) AS avg_qty,
        |       round(sum(o_totalprice), 2) AS sum_total,
        |       round(avg(l_quantity * o_totalprice), 2) AS avg_qty_total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,
    // ground truth for the columnar-batch kernel's moments: continuous
    // sums/products, the derived disc-price column, the int categorical
    // slice, and the year-of-timestamp categorical recomputed
    // relationally
    "q74_columnar_cofactor" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       round(avg(l_extendedprice * (1 - l_discount)), 2) AS avg_disc_price,
        |       round(sum(CASE WHEN l_linenumber = 1 THEN l_quantity END), 2) AS sum_qty_line1,
        |       count(DISTINCT year(l_shipdate)) AS n_years,
        |       min(year(l_shipdate)) AS min_year,
        |       count(*) FILTER (WHERE year(l_shipdate) =
        |         (SELECT min(year(l_shipdate)) FROM lineitem)) AS cnt_min_year
        |FROM lineitem""".stripMargin,
    // q01's GROUP BY as the ground truth for the packed-strings
    // categorical route through the same kernel
    "q75_columnar_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_extendedprice * (1 - l_discount)), 2) AS avg_disc_price,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // per-class ground truth: full per-group moments incl. the quad
    // term and a per-group categorical cardinality
    "q76_perclass_columnar" ->
      """SELECT l_linenumber, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       count(DISTINCT year(l_shipdate)) AS n_years
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // filtered-scan ground truth: DuckDB applies the same WHERE the
    // kernel's compiled mask evaluates per batch
    "q77_filtered_columnar" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       count(DISTINCT year(l_shipdate)) AS n_years
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount >= 0.02 AND l_quantity < 30
        |  AND (l_returnflag = 'R' OR l_linenumber IN (1, 2, 3))""".stripMargin,
    // grouped ground truth for the public grouped API's kernel route:
    // per-group moments + a per-group categorical cardinality
    "q78_grouped_columnar" ->
      """SELECT l_suppkey, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       count(DISTINCT l_linenumber) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q79_grouped_string" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       count(DISTINCT l_linenumber) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q80_grouped_string_wide" ->
      """SELECT source, count(*) AS n_rows,
        |       round(CAST(sum(n_chars) AS DOUBLE), 2) AS sum_chars,
        |       round(CAST(avg(n_chars * n_chars) AS DOUBLE), 2) AS avg_sq_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q81_grouped_sql_kernel" ->
      """SELECT l_suppkey, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       count(DISTINCT l_linenumber) AS n_lines
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // chunking: starts are 1, 57, 113, … (step = 64 − 8 = 56); a start
    // past the previous window's end (s + 64 − 56 − 1 = s + 7 ≥ len)
    // would emit a window fully contained in it — the WHERE's
    // coverage-stop rule mirrors ChunkText's. The split class is
    // spelled out because RE2's \s is [\t\n\f\r ] while the library's
    // pinned contract (Java \s, ChunkText.isWs) also includes vertical
    // tab 0x0B — a VT-bearing document must tokenize identically here
    "q82_chunk_text" ->
      """WITH tok AS (
        |  SELECT doc_id, string_split_regex(trim(text), '[\t\n\x0B\f\r ]+') AS ts
        |  FROM documents WHERE length(trim(text)) > 0),
        |chunks AS (
        |  SELECT doc_id,
        |         CAST((s - 1) / 56 AS BIGINT) AS chunk_idx,
        |         array_to_string(list_slice(ts, CAST(s AS BIGINT), least(s + 63, len(ts))), ' ') AS chunk
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1, 56)) AS s FROM tok)
        |  WHERE s = 1 OR s + 7 < len(ts))
        |SELECT doc_id, chunk_idx, chunk, CAST(length(chunk) AS BIGINT) AS n_chars
        |FROM chunks ORDER BY doc_id, chunk_idx""".stripMargin,
    // mirrors q83's deterministic NULL injection; count(x)/sum skip the
    // NULL inputs exactly as the triple's skip-any-NULL-row contract
    // does, the NULL-key group survives GROUP BY on both engines, and
    // coalesce(…, 0) matches the triple's zero moments should a group
    // ever consist of NULL inputs only
    "q83_grouped_sql_nulls" ->
      """WITH t AS (
        |  SELECT CASE WHEN l_orderkey % 37 = 0 THEN NULL ELSE l_suppkey END AS k,
        |         CASE WHEN l_partkey % 41 = 0 THEN NULL
        |              ELSE CAST(l_quantity AS DOUBLE) END AS x
        |  FROM lineitem)
        |SELECT coalesce(k, -1) AS k, count(x) AS n_rows,
        |       coalesce(round(sum(x), 2), 0) AS sum_qty,
        |       coalesce(round(sum(x * x), 2), 0) AS sum_sq
        |FROM t GROUP BY t.k ORDER BY 1""".stripMargin,
    "q84_grouped_sql_twokeys" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       count(DISTINCT l_linenumber) AS n_lines
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q85_grouped_multi_docs" ->
      """SELECT source, lang, count(*) AS n_rows,
        |       round(CAST(sum(n_chars) AS DOUBLE), 2) AS sum_chars,
        |       round(CAST(sum(CAST(n_chars AS DOUBLE) * n_chars) AS DOUBLE), 2) AS sum_sq_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the pinned StableSplit hash spec in plain DuckDB arithmetic:
    // HUGEINT keeps the two multiplications exact, xor/>> match the
    // sub-2^32 Long ops bit-for-bit; thresholds are the same
    // round(cum * 2^32) integers the Column builds
    "q86_stable_split" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        |  FROM (
        |    SELECT doc_id,
        |           CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
        |                % 4294967296 AS BIGINT) AS h2
        |    FROM (
        |      SELECT doc_id,
        |             CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
        |                    % 4294967296 * 2654435761)
        |                  % 4294967296 AS BIGINT) AS h1
        |      FROM documents)))
        |SELECT doc_id,
        |       CASE WHEN hash < 3435973837 THEN 0
        |            WHEN hash < 3865470566 THEN 1
        |            ELSE 2 END AS split
        |FROM h ORDER BY doc_id""".stripMargin,
    "q87_bm25_scores" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                     x -> x <> '') AS ts
        |  FROM documents),
        |dl AS (SELECT doc_id, len(ts) AS dl, ts FROM d),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |tf AS (
        |  SELECT doc_id, dl, term, CAST(count(*) AS DOUBLE) AS tf
        |  FROM (SELECT doc_id, dl, unnest(ts) AS term FROM dl)
        |  WHERE term IN ('hash', 'join', 'vector') GROUP BY 1, 2, 3),
        |idf AS (
        |  SELECT term, ln((stats.n - dft + 0.5) / (dft + 0.5) + 1) AS idf
        |  FROM (SELECT term, count(DISTINCT doc_id) AS dft FROM tf GROUP BY 1), stats)
        |SELECT tf.doc_id,
        |       round(sum(idf.idf * tf.tf * 2.2
        |                 / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / stats.avgdl))), 4) AS score
        |FROM tf JOIN idf USING (term), stats
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q88_grouped_sql_threekeys" ->
      """SELECT l_returnflag, l_linestatus, l_linenumber, count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price
        |FROM lineitem GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q89_blocklist_stats" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                     x -> x <> '') AS ts
        |  FROM documents)
        |SELECT doc_id,
        |       len(list_filter(ts, t -> list_contains(
        |         ['hash', 'join', 'slow', 'customer', 'zzz_never'], t))) AS n_matched,
        |       len(ts) AS n_tokens
        |FROM d ORDER BY doc_id""".stripMargin,
    "q90_top_terms" ->
      """SELECT term, count(*) AS n FROM (
        |  SELECT unnest(list_filter(
        |    string_split_regex(text, '[	

 ]+'), x -> x <> '')) AS term
        |  FROM documents)
        |GROUP BY 1 ORDER BY n DESC, term ASC LIMIT 25""".stripMargin,
    // q82's verbatim chunk recompute, then dedup (row_number over the
    // same (doc_id, chunk_idx) order the Spark side's min_by key
    // encodes) and the q52 running-sum pack formulation over survivors
    "q91_chunk_pipeline" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, string_split_regex(trim(text), '[\t\n\x0B\f\r ]+') AS ts
        |  FROM documents WHERE length(trim(text)) > 0),
        |chunks AS (
        |  SELECT doc_id, lang,
        |         CAST((s - 1) / 56 AS BIGINT) AS chunk_idx,
        |         array_to_string(list_slice(ts, CAST(s AS BIGINT), least(s + 63, len(ts))), ' ') AS chunk
        |  FROM (SELECT doc_id, lang, ts, unnest(range(1, len(ts) + 1, 56)) AS s FROM tok)
        |  WHERE s = 1 OR s + 7 < len(ts)),
        |uniq AS (
        |  SELECT doc_id, lang, chunk_idx, chunk FROM (
        |    SELECT *, row_number() OVER (PARTITION BY chunk
        |                                 ORDER BY doc_id, chunk_idx) AS rn
        |    FROM chunks) WHERE rn = 1),
        |tc AS (SELECT doc_id, lang, chunk_idx,
        |              CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens
        |       FROM uniq)
        |SELECT doc_id, chunk_idx, n_tokens,
        |       CAST((sum(n_tokens) OVER (PARTITION BY lang
        |                  ORDER BY doc_id, chunk_idx
        |                  ROWS UNBOUNDED PRECEDING) - n_tokens) // 256 AS BIGINT) AS pack
        |FROM tc ORDER BY doc_id, chunk_idx""".stripMargin,
    // q51's shingle construction kept as TEXT: per-doc distinct
    // 3-grams (short docs → one whole-sequence gram, the Shingling
    // rule), doc-frequency count, ≥2 filter, deterministic top-50
    "q92_dup_ngrams" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                             x -> x <> '') AS ts
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(ts) - 2, 1) + 1),
        |    i -> array_to_string(ts[i:least(i + 2, len(ts))], ' ')))) AS ngram
        |  FROM tok WHERE len(ts) > 0)
        |SELECT ngram, CAST(count(*) AS BIGINT) AS n_docs
        |FROM g GROUP BY 1 HAVING count(*) >= 2
        |ORDER BY n_docs DESC, ngram ASC LIMIT 50""".stripMargin,
    // q86's HUGEINT hash recompute, then the three keep rules: fixed
    // integer thresholds (round(f·2^32)) and the weighted double
    // comparison (hash < 2^32 is double-exact; both engines evaluate
    // w·2^32 in IEEE doubles)
    "q93_stable_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(trim(text), '[\t\n\x0B\f\r ]+')) AS DOUBLE) AS tc
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, tc,
        |         CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        |  FROM (
        |    SELECT doc_id, tc,
        |           CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
        |                % 4294967296 AS BIGINT) AS h2
        |    FROM (
        |      SELECT doc_id, tc,
        |             CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
        |                    % 4294967296 * 2654435761)
        |                  % 4294967296 AS BIGINT) AS h1
        |      FROM t)))
        |SELECT doc_id,
        |       hash < 429496730 AS keep10,
        |       hash < 2147483648 AS keep50,
        |       CAST(hash AS DOUBLE) < least(1.0, tc / 256.0) * 4294967296.0 AS keep_w
        |FROM h ORDER BY doc_id""".stripMargin,
    // q92's mining pass (no top-k), then window coverage: every token
    // position inside an occurrence of a duplicated gram is covered
    // (DISTINCT unions the overlaps), survivors rejoin with single
    // spaces in token order. NULL text propagates NULL; a fully-covered
    // or empty document rebuilds to ''.
    "q94_dup_span_removal" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                             x -> x <> '') AS ts
        |  FROM documents WHERE text IS NOT NULL),
        |dup AS (
        |  SELECT ngram FROM (
        |    SELECT doc_id, unnest(list_distinct(list_transform(
        |      range(1, greatest(len(ts) - 2, 1) + 1),
        |      i -> array_to_string(ts[i:least(i + 2, len(ts))], ' ')))) AS ngram
        |    FROM tok WHERE len(ts) > 0)
        |  GROUP BY 1 HAVING count(*) >= 2),
        |w AS (
        |  SELECT doc_id, i, least(i + 2, len(ts)) AS e,
        |         array_to_string(ts[i:least(i + 2, len(ts))], ' ') AS ngram
        |  FROM (SELECT doc_id, ts, unnest(range(1, greatest(len(ts) - 2, 1) + 1)) AS i
        |        FROM tok WHERE len(ts) > 0)),
        |cov AS (
        |  SELECT DISTINCT doc_id, pos FROM (
        |    SELECT w.doc_id, unnest(range(w.i, w.e + 1)) AS pos
        |    FROM w JOIN dup USING (ngram))),
        |pos AS (
        |  SELECT doc_id, pos, ts[pos] AS tok
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos
        |        FROM tok WHERE len(ts) > 0)),
        |clean AS (
        |  SELECT p.doc_id,
        |         coalesce(string_agg(CASE WHEN c.pos IS NULL THEN p.tok END,
        |                             ' ' ORDER BY p.pos), '') AS clean_text,
        |         CAST(count(c.pos) AS INT) AS n_removed_tokens,
        |         CAST(count(*) AS INT) AS n_tokens
        |  FROM pos p LEFT JOIN cov c ON p.doc_id = c.doc_id AND p.pos = c.pos
        |  GROUP BY p.doc_id)
        |SELECT d.doc_id,
        |       CASE WHEN d.text IS NULL THEN NULL
        |            ELSE coalesce(c.clean_text, '') END AS clean_text,
        |       CASE WHEN d.text IS NULL THEN NULL
        |            ELSE coalesce(c.n_removed_tokens, 0) END AS n_removed_tokens,
        |       CASE WHEN d.text IS NULL THEN NULL
        |            ELSE coalesce(c.n_tokens, 0) END AS n_tokens
        |FROM documents d LEFT JOIN clean c USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    "q95_grouped_dict" ->
      """SELECT c_mktsegment, count(*) AS n_rows,
        |       round(sum(c_acctbal), 2) AS sum_bal,
        |       round(avg(c_acctbal * c_acctbal), 2) AS avg_sq_bal,
        |       count(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    // the q86 HUGEINT hash recompute + the mixture rule: per-source
    // floor epochs from a VALUES join, epoch list via range(fl + 1),
    // the last (fractional) epoch kept iff hash < round(frac·2^32);
    // mix_key re-derives the same hash of doc_id XOR (epoch+1)·PRIME
    "q96_corpus_mix" ->
      """WITH w AS (
        |  SELECT * FROM (VALUES ('src0', 2, 2147483648),
        |                        ('src1', 1, 0),
        |                        ('src2', 0, 1073741824)) AS t(source, fl, th)),
        |h AS (
        |  SELECT doc_id, source, CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        |  FROM (
        |    SELECT doc_id, source,
        |           CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
        |                % 4294967296 AS BIGINT) AS h2
        |    FROM (
        |      SELECT doc_id, source,
        |             CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
        |                    % 4294967296 * 2654435761)
        |                  % 4294967296 AS BIGINT) AS h1
        |      FROM documents))),
        |e AS (
        |  SELECT h.doc_id, h.source, ep.epoch, w.fl, w.th, h.hash
        |  FROM h JOIN w USING (source)
        |  JOIN (SELECT CAST(unnest([0, 1, 2]) AS INT) AS epoch) ep
        |    ON ep.epoch <= w.fl),
        |kept AS (
        |  SELECT doc_id, source, epoch,
        |         xor(doc_id, (CAST(epoch AS BIGINT) + 1) * 2654435761) AS mk
        |  FROM e WHERE epoch < fl OR hash < th)
        |SELECT doc_id, source, epoch,
        |       CAST(xor(k2, k2 >> 13) AS BIGINT) AS mix_key
        |FROM (
        |  SELECT doc_id, source, epoch,
        |         CAST((CAST(xor(k1, k1 >> 16) AS HUGEINT) * 2246822519)
        |              % 4294967296 AS BIGINT) AS k2
        |  FROM (
        |    SELECT doc_id, source, epoch,
        |           CAST((((CAST(mk AS HUGEINT) % 4294967296) + 4294967296)
        |                  % 4294967296 * 2654435761)
        |                % 4294967296 AS BIGINT) AS k1
        |    FROM kept))
        |ORDER BY doc_id, epoch""".stripMargin,
    // derive the multi-line corpus (q82's chunk recipe, width 4 overlap
    // 0, newline-joined), then the C4 line filter: count every line
    // corpus-wide, strip lines with count >= 2, rebuild in line order
    // with the audit counters
    "q97_dedup_lines" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                             x -> x <> '') AS ts
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (
        |  SELECT doc_id, CAST((s - 1) / 4 AS BIGINT) AS pos,
        |         array_to_string(list_slice(ts, CAST(s AS BIGINT), least(s + 3, len(ts))), ' ') AS line
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1, 4)) AS s
        |        FROM tok WHERE len(ts) > 0)
        |  UNION ALL
        |  SELECT doc_id, 0 AS pos, '' AS line FROM tok WHERE len(ts) = 0),
        |dup AS (
        |  SELECT line FROM lines GROUP BY 1 HAVING count(*) >= 2),
        |agg AS (
        |  SELECT l.doc_id,
        |         coalesce(string_agg(CASE WHEN d.line IS NULL THEN l.line END,
        |                             chr(10) ORDER BY l.pos), '') AS clean,
        |         CAST(count(d.line) AS INT) AS n_removed,
        |         CAST(count(*) AS INT) AS n_lines
        |  FROM lines l LEFT JOIN dup d USING (line)
        |  GROUP BY l.doc_id)
        |SELECT doc.doc_id,
        |       CASE WHEN doc.text IS NULL THEN NULL ELSE a.clean END AS text,
        |       CASE WHEN doc.text IS NULL THEN NULL ELSE a.n_removed END AS n_removed_lines,
        |       CASE WHEN doc.text IS NULL THEN NULL ELSE a.n_lines END AS n_lines
        |FROM documents doc LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc.doc_id""".stripMargin,
    // retrain the identical add-1 bigram model in SQL (full-vocab V,
    // no pruning) and score: -avg ln((c(big)+1)/(c(prev)+V)); both
    // engines grid-round (floor(s·10⁴ + 0.5)/10⁴) — ln() ulp discipline
    "q98_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                             x -> x <> '') AS ts
        |  FROM documents WHERE text IS NOT NULL),
        |uni AS (
        |  SELECT t AS w, count(*) AS c
        |  FROM (SELECT unnest(ts) AS t FROM tok) GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS DOUBLE) AS nv FROM uni),
        |pairs AS (
        |  SELECT doc_id, ts[i] AS pw, ts[i + 1] AS w
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i
        |        FROM tok WHERE len(ts) >= 2)),
        |big AS (
        |  SELECT pw, w, count(*) AS c FROM pairs GROUP BY 1, 2),
        |sc AS (
        |  SELECT p.doc_id,
        |         avg(-ln((coalesce(b.c, 0) + 1.0) / (u.c + v.nv))) AS s
        |  FROM pairs p
        |  JOIN uni u ON u.w = p.pw
        |  LEFT JOIN big b ON b.pw = p.pw AND b.w = p.w
        |  CROSS JOIN v
        |  GROUP BY p.doc_id)
        |SELECT d.doc_id,
        |       CASE WHEN d.text IS NULL THEN NULL
        |            ELSE floor(sc.s * 10000.0 + 0.5) / 10000.0 END AS lm_score
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // the Gopher word rules recomputed compositionally: strlen-based
    // byte counts (the kernel counts bytes), distinct stop-octet
    // membership, '#' + non-overlapping '...' via replace-recount, and
    // the composed keep at the q99 thresholds
    "q99_gopher_rules" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |         list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                     x -> x <> '') AS ts
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, text,
        |         len(ts) AS n_tokens,
        |         CAST(coalesce(list_sum(list_transform(ts, x -> strlen(x))), 0) AS INT) AS n_chars,
        |         CAST(coalesce(list_sum(list_transform(ts,
        |           x -> CASE WHEN regexp_matches(x, '[A-Za-z]') THEN 1 ELSE 0 END)), 0) AS INT) AS n_alpha,
        |         CAST(len(list_intersect(list_distinct(ts),
        |           ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS INT) AS n_stop,
        |         CAST((strlen(text) - strlen(replace(text, '#', '')))
        |              + (strlen(text) - strlen(replace(text, '...', ''))) / 3 AS INT) AS n_sym
        |  FROM t)
        |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |       floor(CAST(n_chars AS DOUBLE) / n_tokens * 10000.0 + 0.5) / 10000.0 AS mean_word_len,
        |       floor(CAST(n_alpha AS DOUBLE) / n_tokens * 10000.0 + 0.5) / 10000.0 AS alpha_ratio,
        |       n_stop AS n_stop_hits,
        |       n_sym AS n_symbols,
        |       CASE WHEN text IS NULL THEN NULL ELSE
        |         n_tokens >= 10 AND n_tokens <= 100000 AND n_tokens > 0
        |         AND CAST(n_chars AS DOUBLE) / n_tokens >= 3.0
        |         AND CAST(n_chars AS DOUBLE) / n_tokens <= 10.0
        |         AND CAST(n_sym AS DOUBLE) / n_tokens < 0.1
        |         AND CAST(n_alpha AS DOUBLE) / n_tokens >= 0.8
        |         AND n_stop >= 1 END AS keep
        |FROM m ORDER BY doc_id""".stripMargin,
    // the same derived batch, then GROUND-TRUTH flags: exact via a text
    // equi-join, near via exhaustive new × corpus string-shingle
    // jaccard at the library's shingle semantics (lower + trim, token
    // 3-grams, whole-sequence short-doc rule) — q14's truth recipe,
    // asymmetric
    "q100_dedup_incremental" ->
      """WITH corpus AS (SELECT doc_id, text FROM documents),
        |newb AS (
        |  SELECT doc_id + 20000000 AS doc_id, text FROM corpus WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 20000000, regexp_replace(text, '\s+\S+\s*$', '')
        |  FROM corpus WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id + 20000000, array_to_string(list_reverse(string_split(text, ' ')), ' ')
        |  FROM corpus WHERE doc_id % 7 = 2),
        |csh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(generate_series(1, len(t) - 2),
        |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM corpus)),
        |nsh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(t) <= 3 THEN [array_to_string(t, ' ')]
        |    ELSE list_transform(generate_series(1, len(t) - 2),
        |                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) END) AS s
        |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM newb)),
        |near AS (
        |  SELECT DISTINCT n.doc_id FROM nsh n, csh c
        |  WHERE (CASE WHEN len(list_distinct(list_concat(n.s, c.s))) = 0 THEN 0.0
        |         ELSE len(list_intersect(n.s, c.s))::DOUBLE
        |              / len(list_distinct(list_concat(n.s, c.s)))::DOUBLE END) >= 0.8),
        |exact AS (SELECT DISTINCT n.doc_id FROM newb n JOIN corpus c ON n.text = c.text)
        |SELECT n.doc_id,
        |       e.doc_id IS NOT NULL AS dup_exact,
        |       r.doc_id IS NOT NULL AS dup_near
        |FROM newb n
        |LEFT JOIN exact e USING (doc_id)
        |LEFT JOIN near r ON n.doc_id = r.doc_id
        |ORDER BY n.doc_id""".stripMargin,
    // q99's feature algebra feeding q27's closed-form 2-feature LDA:
    // features (mean word length, alpha-token ratio) and the keep label
    // recomputed compositionally, then class means / pooled covariance
    // inverse / coefficients from scratch
    "q101_quality_classifier" ->
      """WITH t AS (
        |  SELECT list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                     x -> x <> '') AS ts, text
        |  FROM documents),
        |m AS (
        |  SELECT len(ts) AS n_tokens,
        |         coalesce(list_sum(list_transform(ts, x -> strlen(x))), 0) AS n_chars,
        |         coalesce(list_sum(list_transform(ts,
        |           x -> CASE WHEN regexp_matches(x, '[A-Za-z]') THEN 1 ELSE 0 END)), 0) AS n_alpha,
        |         len(list_intersect(list_distinct(ts),
        |           ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS n_stop,
        |         (strlen(text) - strlen(replace(text, '#', '')))
        |         + (strlen(text) - strlen(replace(text, '...', ''))) / 3 AS n_sym
        |  FROM t),
        |f AS (
        |  SELECT CAST(n_tokens AS DOUBLE) AS f1,
        |         CAST(n_chars AS DOUBLE) AS f2,
        |         CASE WHEN n_tokens >= 10 AND n_tokens <= 100000
        |               AND CAST(n_chars AS DOUBLE) / n_tokens >= 3.0
        |               AND CAST(n_chars AS DOUBLE) / n_tokens <= 10.0
        |               AND CAST(n_sym AS DOUBLE) / n_tokens < 0.1
        |               AND CAST(n_alpha AS DOUBLE) / n_tokens >= 0.8
        |               AND n_stop >= 1 THEN 1 ELSE 0 END AS cls
        |  FROM m),
        |cls AS (
        |  SELECT cls AS class, count(*)::DOUBLE AS nc,
        |         sum(f1) AS s1, sum(f2) AS s2
        |  FROM f GROUP BY 1),
        |tot AS (
        |  SELECT (SELECT count(*)::DOUBLE FROM f) AS n,
        |         (SELECT sum(f1*f1) FROM f) AS q11,
        |         (SELECT sum(f1*f2) FROM f) AS q12,
        |         (SELECT sum(f2*f2) FROM f) AS q22,
        |         sum(s1*s1/nc) AS w11, sum(s1*s2/nc) AS w12, sum(s2*s2/nc) AS w22
        |  FROM cls),
        |sm AS (SELECT n, (q11-w11)/n AS v11, (q12-w12)/n AS v12, (q22-w22)/n AS v22 FROM tot),
        |inv AS (SELECT n, v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |               v11/(v11*v22-v12*v12) AS i22 FROM sm)
        |SELECT cls.class,
        |       round(i11*(s1/nc) + i12*(s2/nc), 5) AS coef_len,
        |       round(i12*(s1/nc) + i22*(s2/nc), 5) AS coef_chars,
        |       round(-0.5*((s1/nc)*(i11*(s1/nc)+i12*(s2/nc))
        |                   + (s2/nc)*(i12*(s1/nc)+i22*(s2/nc))) + ln(nc/n), 5) AS icpt
        |FROM cls, inv ORDER BY class""".stripMargin,
    // q97's derivation + window-numbered removal: a duplicated line's
    // occurrences remove EXCEPT the row_number-1 canonical (ordered by
    // doc_id, pos — the same global order the operator's min(struct)
    // picks)
    "q102_dedup_lines_keepone" ->
      """WITH tok AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                             x -> x <> '') AS ts
        |  FROM documents WHERE text IS NOT NULL),
        |lines AS (
        |  SELECT doc_id, CAST((s - 1) / 4 AS BIGINT) AS pos,
        |         array_to_string(list_slice(ts, CAST(s AS BIGINT), least(s + 3, len(ts))), ' ') AS line
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1, 4)) AS s
        |        FROM tok WHERE len(ts) > 0)
        |  UNION ALL
        |  SELECT doc_id, 0 AS pos, '' AS line FROM tok WHERE len(ts) = 0),
        |w AS (
        |  SELECT doc_id, pos, line,
        |         count(*) OVER (PARTITION BY line) AS cnt,
        |         row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
        |  FROM lines),
        |agg AS (
        |  SELECT doc_id,
        |         coalesce(string_agg(CASE WHEN cnt < 2 OR rn = 1 THEN line END,
        |                             chr(10) ORDER BY pos), '') AS clean,
        |         CAST(sum(CASE WHEN cnt >= 2 AND rn > 1 THEN 1 ELSE 0 END) AS INT) AS n_removed,
        |         CAST(count(*) AS INT) AS n_lines
        |  FROM w GROUP BY doc_id)
        |SELECT doc.doc_id,
        |       CASE WHEN doc.text IS NULL THEN NULL ELSE a.clean END AS text,
        |       CASE WHEN doc.text IS NULL THEN NULL ELSE a.n_removed END AS n_removed_lines,
        |       CASE WHEN doc.text IS NULL THEN NULL ELSE a.n_lines END AS n_lines
        |FROM documents doc LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc.doc_id""".stripMargin,
    // the q86/q93 HUGEINT recompute of the pinned stable hash, then the
    // window formulation of the per-source cap: rank by (hash, doc_id)
    // within each source, keep rank ≤ 7.
    "q103_source_cap" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |         CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        |  FROM (
        |    SELECT doc_id, source, n_chars,
        |           CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
        |                % 4294967296 AS BIGINT) AS h2
        |    FROM (
        |      SELECT doc_id, source, n_chars,
        |             CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
        |                    % 4294967296 * 2654435761)
        |                  % 4294967296 AS BIGINT) AS h1
        |      FROM documents))),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY hash, doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, source, n_chars FROM r WHERE rn <= 7
        |ORDER BY doc_id""".stripMargin,
    // the top-10% cut re-derived by a window rank: threshold = the
    // rank n − ceil(0.1·n) + 1 value ascending, survivors ≥ threshold
    // (ties on the threshold included — same contract both sides).
    "q104_quantile_filter" ->
      """WITH r AS (
        |  SELECT n_chars,
        |         row_number() OVER (ORDER BY n_chars) AS rn,
        |         count(*) OVER () AS c
        |  FROM documents),
        |t AS (
        |  SELECT n_chars AS th FROM r
        |  WHERE rn = c - CAST(ceil(0.1 * c) AS BIGINT) + 1)
        |SELECT doc_id, n_chars FROM documents, t
        |WHERE n_chars >= th ORDER BY doc_id""".stripMargin,
    // full BPE training replay: 8 unrolled rounds over the word dict
    // (see bpeOracleRounds for the replace-as-merge-pass scheme).
    "q105_bpe_train" -> {
      val unions = (1 to 8).map { r =>
        s"""SELECT $r AS rank, a AS "left", b AS "right", c AS cnt FROM b$r"""
      }.mkString("\n  UNION ALL ")
      s"""WITH $bpeWordsCte,
         |${bpeOracleRounds(8, carryWord = false)}
         |SELECT rank, "left", "right", cnt FROM (
         |  $unions)
         |ORDER BY rank""".stripMargin
    },
    // full tokenizer replay: the same 8 training rounds carrying the
    // word through, so w8 IS the dict's encoded end state (encode =
    // replay merges in rank order = training's final spaced form);
    // per document, words join their final symbol lists in order.
    "q106_bpe_encode" -> {
      s"""WITH $bpeWordsCte,
         |${bpeOracleRounds(8, carryWord = true)},
         |final AS (
         |  SELECT word, list_filter(string_split(sp, chr(1)), x -> x <> '') AS syms
         |  FROM w8),
         |tok AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '$bpeWsClass'),
         |                             x -> x <> '') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |docw AS (
         |  SELECT doc_id, pos, ws[pos] AS word
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS pos
         |        FROM tok WHERE len(ws) > 0)),
         |agg AS (
         |  SELECT d.doc_id,
         |         string_agg(array_to_string(f.syms, chr(1)), chr(1) ORDER BY d.pos) AS tokens_str,
         |         CAST(sum(len(f.syms)) AS INT) AS n_tokens
         |  FROM docw d JOIN final f USING (word)
         |  GROUP BY d.doc_id)
         |SELECT doc.doc_id,
         |       CASE WHEN doc.text IS NULL THEN NULL
         |            ELSE coalesce(a.tokens_str, '') END AS tokens_str,
         |       CASE WHEN doc.text IS NULL THEN NULL
         |            ELSE coalesce(a.n_tokens, 0) END AS n_tokens
         |FROM documents doc LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc.doc_id""".stripMargin
    },
    // per-source top-20% cut re-derived with a partitioned window:
    // threshold(g) = the rank n_g − ceil(0.2·n_g) + 1 value ascending
    // within source g, survivors ≥ their own source's threshold.
    "q107_group_quantile_cut" ->
      """WITH r AS (
        |  SELECT source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |         count(*) OVER (PARTITION BY source) AS c
        |  FROM documents),
        |t AS (
        |  SELECT source, n_chars AS th FROM r
        |  WHERE rn = c - CAST(ceil(0.2 * c) AS BIGINT) + 1)
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d JOIN t USING (source)
        |WHERE d.n_chars >= t.th ORDER BY d.doc_id""".stripMargin,
    // q106's tokenizer replay for per-doc BPE token counts, then q52's
    // cumsum-div packing window per language.
    "q108_bpe_pack" -> {
      s"""WITH $bpeWordsCte,
         |${bpeOracleRounds(8, carryWord = true)},
         |final AS (
         |  SELECT word, len(list_filter(string_split(sp, chr(1)), x -> x <> '')) AS ntok
         |  FROM w8),
         |tok AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '$bpeWsClass'),
         |                             x -> x <> '') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |docw AS (
         |  SELECT doc_id, ws[pos] AS word
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS pos
         |        FROM tok WHERE len(ws) > 0)),
         |counts AS (
         |  SELECT doc.doc_id, doc.lang,
         |         coalesce(CAST(sum(t.ntok) AS BIGINT), 0) AS n_tokens
         |  FROM documents doc
         |  LEFT JOIN (SELECT dw.doc_id, f.ntok
         |             FROM docw dw JOIN final f USING (word)) t
         |    ON doc.doc_id = t.doc_id
         |  GROUP BY doc.doc_id, doc.lang)
         |SELECT doc_id, lang, n_tokens,
         |       CAST((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |                      ROWS UNBOUNDED PRECEDING) - n_tokens) // 256 AS BIGINT) AS pack
         |FROM counts ORDER BY doc_id""".stripMargin
    },
    // the q106 tokenizer replay + the model-intrinsic vocabulary:
    // alphabet ids by binary-collation row_number over the dict's
    // distinct characters, product ids |A|+rank with min(id) on a
    // repeated product string, per-doc ids ordered (word, symbol).
    "q111_bpe_token_ids" -> {
      val prodUnion = (1 to 8).map { r =>
        s"SELECT $r AS rank, a || b AS tok FROM b$r"
      }.mkString("\n  UNION ALL ")
      s"""WITH $bpeWordsCte,
         |${bpeOracleRounds(8, carryWord = true)},
         |final AS (
         |  SELECT word, list_filter(string_split(sp, chr(1)), x -> x <> '') AS syms
         |  FROM w8),
         |alpha AS (
         |  SELECT DISTINCT unnest(string_split(word, '')) AS tok FROM words),
         |alphaId AS (
         |  SELECT tok, CAST(row_number() OVER (ORDER BY tok) - 1 AS INT) AS id
         |  FROM alpha),
         |na AS (SELECT count(*) AS a FROM alpha),
         |prod AS (
         |  $prodUnion),
         |vocab AS (
         |  SELECT tok, min(id) AS id FROM (
         |    SELECT tok, id FROM alphaId
         |    UNION ALL
         |    SELECT prod.tok, CAST(na.a + prod.rank - 1 AS INT) AS id FROM prod, na)
         |  GROUP BY tok),
         |tok AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '$bpeWsClass'),
         |                             x -> x <> '') AS ws
         |  FROM documents WHERE text IS NOT NULL),
         |docw AS (
         |  SELECT doc_id, pos, ws[pos] AS word
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS pos
         |        FROM tok WHERE len(ws) > 0)),
         |dtok AS (
         |  SELECT d.doc_id, d.pos AS wpos, f.spos, f.tok
         |  FROM docw d JOIN (
         |    SELECT word, spos, syms[spos] AS tok
         |    FROM (SELECT word, syms, unnest(range(1, len(syms) + 1)) AS spos
         |          FROM final)) f USING (word)),
         |ids AS (
         |  SELECT t.doc_id, t.wpos, t.spos, coalesce(v.id, -1) AS id
         |  FROM dtok t LEFT JOIN vocab v ON v.tok = t.tok),
         |agg AS (
         |  SELECT doc_id,
         |         string_agg(CAST(id AS VARCHAR), ',' ORDER BY wpos, spos) AS ids_str,
         |         CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS INT) AS n_unk
         |  FROM ids GROUP BY doc_id)
         |SELECT doc.doc_id,
         |       CASE WHEN doc.text IS NULL THEN NULL
         |            ELSE coalesce(a.ids_str, '') END AS ids_str,
         |       CASE WHEN doc.text IS NULL THEN NULL
         |            ELSE coalesce(a.n_unk, 0) END AS n_unk
         |FROM documents doc LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc.doc_id""".stripMargin
    },
    // mass-weighted threshold re-derived from a value-grouped
    // cumulative token-mass walk: threshold = min value whose
    // cumulative mass reaches rank W − ceil(0.25·W) + 1; survivors
    // (every document, weight or not) ≥ threshold.
    "q110_mass_quantile_cut" ->
      """WITH docs_aug AS (
        |  SELECT doc_id, text, n_chars FROM documents
        |  UNION ALL SELECT 900000001, '', 1000000
        |  UNION ALL SELECT 900000002, ' ' || chr(9) || chr(10) || ' ', 1000001),
        |t AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE CAST(len(string_split_regex(trim(text), '[\t\n\x0B\f\r ]+')) AS BIGINT)
        |         END AS w
        |  FROM docs_aug),
        |tot AS (SELECT sum(w) AS tw FROM t WHERE w > 0),
        |g AS (SELECT n_chars AS v, sum(w) AS m FROM t WHERE w > 0 GROUP BY 1),
        |c AS (SELECT v, sum(m) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM g),
        |th AS (
        |  SELECT min(v) AS t FROM c, tot
        |  WHERE cum >= tw - CAST(ceil(0.25 * tw) AS BIGINT) + 1)
        |SELECT d.doc_id, d.n_chars FROM docs_aug d, th
        |WHERE d.n_chars >= th.t ORDER BY d.doc_id""".stripMargin,
    // quartiles at ranks ceil(0.25·n)/ceil(0.75·n) via window rank,
    // then the 1.5·IQR fence applied in the same double arithmetic.
    "q115_iqr_fence" ->
      """WITH r AS (
        |  SELECT n_chars,
        |         row_number() OVER (ORDER BY n_chars) AS rn,
        |         count(*) OVER () AS c
        |  FROM documents),
        |q AS (
        |  SELECT
        |    max(CASE WHEN rn = CAST(ceil(0.25 * c) AS BIGINT)
        |             THEN CAST(n_chars AS DOUBLE) END) AS q1,
        |    max(CASE WHEN rn = CAST(ceil(0.75 * c) AS BIGINT)
        |             THEN CAST(n_chars AS DOUBLE) END) AS q3
        |  FROM r)
        |SELECT d.doc_id, d.n_chars
        |FROM documents d, q
        |WHERE CAST(d.n_chars AS DOUBLE) >= q.q1 - 1.5 * (q.q3 - q.q1)
        |  AND CAST(d.n_chars AS DOUBLE) <= q.q3 + 1.5 * (q.q3 - q.q1)
        |ORDER BY d.doc_id""".stripMargin,
    // q116: the streaming cofactor must land on the BATCH answer — the
    // oracle is therefore q02's, verbatim.
    "q116_streaming_cofactor" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice), 2) AS avg_price,
        |       round(avg(l_quantity * l_quantity), 2) AS avg_qty_qty,
        |       round(avg(l_quantity * l_extendedprice), 2) AS avg_qty_price,
        |       round(avg(l_extendedprice * l_extendedprice), 2) AS avg_price_price
        |FROM lineitem""".stripMargin,
    // q117: streaming closed sessions ≡ the batch window walk — q33's
    // oracle, verbatim (same 30-min gap, same summary shape).
    "q117_streaming_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
        |m AS (SELECT user_id, event_id, t,
        |        CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 1800000000
        |             THEN 1 ELSE 0 END AS ns_flag
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        |s AS (SELECT user_id,
        |        sum(ns_flag) OVER (PARTITION BY user_id ORDER BY t, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM m),
        |sessions AS (SELECT user_id, sess, count(*) AS cnt FROM s GROUP BY user_id, sess)
        |SELECT user_id, count(*) AS n_sessions, sum(cnt)::BIGINT AS n_events,
        |       max(cnt) AS max_sess_events
        |FROM sessions GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q118-q120: the multimodal fixtures' pinned formulas, re-derived
    // arithmetically (MediaFixtures.scala documents the pinning).
    "q118_image_grid" ->
      """WITH d AS (SELECT doc_id,
        |                 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |          FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |lum AS (SELECT doc_id, w, h,
        |               ((y*3)//h)*3 + (x*3)//w AS cell,
        |               ((doc_id*7  + x*13 + y*31) % 256) * 299
        |             + ((doc_id*11 + x*3  + y*17) % 256) * 587
        |             + ((doc_id*5  + x*23 + y*29) % 256) * 114 AS lm
        |        FROM px)
        |SELECT doc_id, 'bmp' AS format,
        |       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
        |       CAST(cell AS INTEGER) AS cell,
        |       CAST(sum(lm) AS BIGINT) AS lum_milli,
        |       CAST(count(*) AS BIGINT) AS n_pix
        |FROM lum GROUP BY doc_id, w, h, cell
        |ORDER BY doc_id, cell""".stripMargin,
    "q119_audio_windows" ->
      """WITH d AS (SELECT doc_id, 400 + (doc_id % 100) * 4 AS n FROM documents),
        |sm AS (SELECT doc_id, n, unnest(range(n)) AS i FROM d),
        |s AS (SELECT doc_id, n, (i*4)//n AS win,
        |             ((doc_id*31 + i*7919) % 65536) - 32768 AS v
        |      FROM sm)
        |SELECT doc_id, 'wave' AS format,
        |       CAST(8000 AS INTEGER) AS sample_rate,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST((n*1000)//8000 AS BIGINT) AS duration_ms,
        |       CAST(win AS INTEGER) AS win,
        |       CAST(sum(v) AS BIGINT) AS sample_sum,
        |       CAST(count(*) AS BIGINT) AS n_samples
        |FROM s GROUP BY doc_id, n, win
        |ORDER BY doc_id, win""".stripMargin,
    "q120_video_meta" ->
      """SELECT doc_id, 'isom' AS format,
        |       CAST(320 + (doc_id % 16) * 8 AS INTEGER) AS width,
        |       CAST(240 + (doc_id % 9) * 8 AS INTEGER) AS height,
        |       CAST(1000 + doc_id % 5000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q121_video_meta_avi" ->
      """SELECT doc_id, 'avi' AS format,
        |       CAST(160 + (doc_id % 12) * 16 AS INTEGER) AS width,
        |       CAST(120 + (doc_id % 7) * 16 AS INTEGER) AS height,
        |       CAST(40000 * (25 + doc_id % 500) // 1000 AS BIGINT) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q122_streaming_curation" ->
      """WITH qd AS (
        |  SELECT doc_id, text, n_chars,
        |         least(1.0, length(text) / 500.0)
        |         * (len(list_distinct(string_split_regex(trim(text), '\s+')))::DOUBLE
        |            / len(string_split_regex(trim(text), '\s+')))
        |         * greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::DOUBLE
        |                                / length(text)) * 4.0) AS quality
        |  FROM documents),
        |p AS (SELECT * FROM qd WHERE quality >= 0.1),
        |surv AS (SELECT text, min(n_chars) AS n_chars FROM p GROUP BY text),
        |langs(lang, words) AS (VALUES
        |  ('de', ['der','die','das','und','ist','nicht','ein','eine','mit','für','auf','von']),
        |  ('en', ['the','a','of','and','to','in','is','it','that','for','on','with','as']),
        |  ('es', ['el','la','los','las','y','es','un','una','para','en','que','de']),
        |  ('fr', ['le','la','les','et','est','un','une','pour','dans','que','des','du']),
        |  ('it', ['il','lo','la','e','è','un','una','per','che','di','non','con'])),
        |tok AS (SELECT text, string_split_regex(trim(lower(text)), '\s+') AS ts FROM surv),
        |scored AS (SELECT text, lang,
        |                  len(list_filter(ts, t -> list_contains(words, t))) AS score
        |           FROM tok, langs),
        |best AS (SELECT text, lang, score,
        |                row_number() OVER (PARTITION BY text
        |                  ORDER BY score DESC, lang DESC) AS rn
        |         FROM scored),
        |lg AS (SELECT s.text,
        |              CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END AS lang,
        |              s.n_chars
        |       FROM surv s JOIN best b ON s.text = b.text AND b.rn = 1)
        |SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM lg GROUP BY lang ORDER BY lang""".stripMargin,
    // q123: the q60 code/pair derivation, finished by a GREEDY
    // ascending-id scan (recursive CTE, one id per iteration) instead
    // of connected components — the streaming operator's keep rule.
    "q123_streaming_semantic_dedup" ->
      """WITH RECURSIVE qz AS (
        |  SELECT vec_id, list_transform(embedding, x ->
        |    floor(x::DOUBLE * (CASE WHEN mx > 1e-300 THEN 127.0 / mx ELSE 0.0 END) + 0.5)) AS q
        |  FROM (SELECT vec_id, embedding,
        |               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS mx
        |        FROM embeddings WHERE vec_id < 300)),
        |d AS (
        |  SELECT vec_id, j, k,
        |         list_sum(list_transform(range(0, 8), t ->
        |           (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8))
        |           * (q[j*8 + t + 1] - (((k*5 + t*3 + j*2) % 17) - 8)))) AS d2
        |  FROM qz, range(0, 8) js(j), range(0, 16) ks(k)),
        |codes AS (
        |  SELECT vec_id, j, k AS code FROM (
        |    SELECT vec_id, j, k,
        |           row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, k) AS rn
        |    FROM d)
        |  WHERE rn = 1),
        |rec AS (
        |  SELECT vec_id, flatten(list(sub ORDER BY j)) AS recon
        |  FROM (SELECT vec_id, j, list_transform(range(0, 8), t ->
        |          CAST(((code*5 + t*3 + j*2) % 17) - 8 AS DOUBLE)) AS sub
        |        FROM codes)
        |  GROUP BY vec_id),
        |n2 AS (SELECT vec_id, recon, list_inner_product(recon, recon) AS na2 FROM rec),
        |p AS (SELECT a.vec_id AS ida, b.vec_id AS idb
        |      FROM n2 a JOIN n2 b ON a.vec_id < b.vec_id
        |      WHERE list_inner_product(a.recon, b.recon)
        |            / (sqrt(a.na2) * sqrt(b.na2)) >= 0.55),
        |nbr AS (SELECT idb AS vec_id, list(ida) AS smaller FROM p GROUP BY idb),
        |ids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) AS rn FROM qz),
        |g(rn, kept) AS (
        |  SELECT 0, CAST([] AS BIGINT[])
        |  UNION ALL
        |  SELECT g.rn + 1,
        |         CASE WHEN len(list_intersect(coalesce(n.smaller, []), g.kept)) = 0
        |              THEN list_append(g.kept, i.vec_id) ELSE g.kept END
        |  FROM g
        |  JOIN ids i ON i.rn = g.rn + 1
        |  LEFT JOIN nbr n ON n.vec_id = i.vec_id)
        |SELECT unnest(kept) AS vec_id
        |FROM g WHERE rn = (SELECT max(rn) FROM ids)
        |ORDER BY vec_id""".stripMargin,
    // q124: the streaming as-of must land on the batch answer — q44's
    // oracle, verbatim.
    "q124_streaming_asof" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS t FROM events),
        |c AS (SELECT event_id, user_id, t FROM e WHERE event_type = 'click'),
        |v AS (SELECT user_id, t AS vt, max(event_id) AS v_eid
        |      FROM e WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id,
        |       coalesce(v.v_eid, -1) AS view_eid,
        |       coalesce(c.t - v.vt, -1) AS dt_us
        |FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND v.vt <= c.t
        |ORDER BY c.event_id""".stripMargin,
    "q125_flat_moments" ->
      """SELECT round(sum(l_quantity), 2) AS sum_qty,
        |       round(avg(l_extendedprice * (1 - l_discount)), 2) AS avg_disc_price,
        |       count(*) AS cnt
        |FROM lineitem""".stripMargin,
    // q126: the q118 fixture pixel formulas re-summed per 3×3 cell and
    // reduced mod 2^24 — CAST to FLOAT is exact for integers < 2^24, so
    // the hash grades the decoder's float output bit-for-bit.
    "q126_extract_features" ->
      """WITH d AS (SELECT doc_id,
        |                 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        |          FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM d),
        |px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM xs),
        |lum AS (SELECT doc_id,
        |               ((y*3)//h)*3 + (x*3)//w AS cell,
        |               ((doc_id*7  + x*13 + y*31) % 256) * 299
        |             + ((doc_id*11 + x*3  + y*17) % 256) * 587
        |             + ((doc_id*5  + x*23 + y*29) % 256) * 114 AS lm
        |        FROM px)
        |SELECT doc_id, CAST(cell AS INTEGER) AS cell,
        |       CAST(sum(lm) % 16777216 AS FLOAT) AS feat
        |FROM lum GROUP BY doc_id, cell
        |ORDER BY doc_id, cell""".stripMargin,
    // the whole funnel from the HUGEINT hash: window-rank cap (≤15 per
    // source), mixture epochs (floor + fractional threshold), split
    // buckets at the 0.8/0.9 cumulative thresholds, then the card.
    "q114_dataset_card" ->
      """WITH h AS (
        |  SELECT doc_id, CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        |  FROM (
        |    SELECT doc_id,
        |           CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
        |                % 4294967296 AS BIGINT) AS h2
        |    FROM (
        |      SELECT doc_id,
        |             CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
        |                    % 4294967296 * 2654435761)
        |                  % 4294967296 AS BIGINT) AS h1
        |      FROM documents))),
        |r AS (
        |  SELECT d.doc_id, d.source, d.n_chars, h.hash,
        |         row_number() OVER (PARTITION BY d.source
        |                            ORDER BY h.hash, d.doc_id) AS rn
        |  FROM documents d JOIN h USING (doc_id)),
        |capped AS (SELECT doc_id, source, n_chars, hash FROM r WHERE rn <= 15),
        |w AS (
        |  SELECT * FROM (VALUES ('src0', 2, 2147483648),
        |                        ('src1', 1, 0),
        |                        ('src2', 0, 1073741824),
        |                        ('src3', 1, 2147483648),
        |                        ('src4', 0, 2147483648),
        |                        ('src5', 3, 0)) AS t(source, fl, th)),
        |kept AS (
        |  SELECT c.doc_id, c.source, c.n_chars, c.hash
        |  FROM capped c JOIN w USING (source)
        |  JOIN (SELECT CAST(unnest([0, 1, 2, 3]) AS INT) AS epoch) ep
        |    ON ep.epoch <= w.fl
        |  WHERE ep.epoch < w.fl OR c.hash < w.th),
        |sp AS (
        |  SELECT *, CASE WHEN hash < 3435973837 THEN 0
        |                 WHEN hash < 3865470566 THEN 1
        |                 ELSE 2 END AS split
        |  FROM kept)
        |SELECT split, source, count(*) AS n_rows,
        |       count(DISTINCT doc_id) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the q28 LDA algebra retrained on the OBSERVED stratum's
    // text-kernel features, then argmax-predicted for every missing
    // row (score DESC, class ASC ties — the trainer's first-max rule
    // over ascending classes); the int class code decodes via chr.
    "q113_impute_lang" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         list_filter(string_split_regex(text, '[\t\n\x0B\f\r ]+'),
        |                     x -> x <> '') AS ts
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, lang,
        |         CAST(len(ts) AS DOUBLE) AS f1,
        |         CAST(coalesce(list_sum(list_transform(ts, x -> strlen(x))), 0) AS DOUBLE) AS f2,
        |         ascii(substr(lang, 1, 1)) * 256 + ascii(substr(lang, 2, 1)) AS lcls
        |  FROM t),
        |d AS (SELECT f1 AS x1, f2 AS x2, lcls AS cls FROM f WHERE doc_id % 5 <> 0),
        |cls AS (SELECT cls, count(*)::DOUBLE AS nc, sum(x1) AS s1, sum(x2) AS s2
        |        FROM d GROUP BY 1),
        |tot AS (SELECT (SELECT count(*)::DOUBLE FROM d) AS n,
        |               (SELECT sum(x1*x1) FROM d) AS q11,
        |               (SELECT sum(x1*x2) FROM d) AS q12,
        |               (SELECT sum(x2*x2) FROM d) AS q22,
        |               sum(s1*s1/nc) AS w11, sum(s1*s2/nc) AS w12, sum(s2*s2/nc) AS w22
        |        FROM cls),
        |sm AS (SELECT n, (q11-w11)/n AS v11, (q12-w12)/n AS v12, (q22-w22)/n AS v22 FROM tot),
        |inv AS (SELECT n, v22/(v11*v22-v12*v12) AS i11, -v12/(v11*v22-v12*v12) AS i12,
        |               v11/(v11*v22-v12*v12) AS i22 FROM sm),
        |coefs AS (SELECT cls.cls, i11*(s1/nc)+i12*(s2/nc) AS w1, i12*(s1/nc)+i22*(s2/nc) AS w2,
        |                 -0.5*((s1/nc)*(i11*(s1/nc)+i12*(s2/nc))
        |                       + (s2/nc)*(i12*(s1/nc)+i22*(s2/nc))) + ln(nc/n) AS b
        |          FROM cls, inv),
        |scored AS (
        |  SELECT f.doc_id, c.cls,
        |         row_number() OVER (PARTITION BY f.doc_id
        |           ORDER BY c.w1*f.f1 + c.w2*f.f2 + c.b DESC, c.cls) AS rn
        |  FROM f, coefs c WHERE f.doc_id % 5 = 0),
        |pred AS (SELECT doc_id, cls FROM scored WHERE rn = 1)
        |SELECT f.doc_id,
        |       CASE WHEN f.doc_id % 5 <> 0 THEN f.lang
        |            ELSE chr(p.cls // 256) || chr(p.cls % 256) END AS lang_filled,
        |       f.doc_id % 5 = 0 AS was_imputed
        |FROM f LEFT JOIN pred p USING (doc_id)
        |ORDER BY f.doc_id""".stripMargin,
    // per-source grouped cumulative-mass walk: threshold(g) = min value
    // whose cumulative token mass within source g reaches rank
    // W_g − ceil(0.3·W_g) + 1; survivors ≥ their own source's threshold.
    "q112_group_mass_cut" ->
      """WITH t AS (
        |  SELECT doc_id, source, n_chars,
        |         CASE WHEN length(trim(text)) = 0 THEN 0
        |              ELSE CAST(len(string_split_regex(trim(text), '[\t\n\x0B\f\r ]+')) AS BIGINT)
        |         END AS w
        |  FROM documents),
        |tot AS (SELECT source, sum(w) AS tw FROM t WHERE w > 0 GROUP BY source),
        |g AS (SELECT source, n_chars AS v, sum(w) AS m
        |      FROM t WHERE w > 0 GROUP BY source, n_chars),
        |c AS (SELECT source, v,
        |             sum(m) OVER (PARTITION BY source ORDER BY v
        |                          ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM g),
        |th AS (
        |  SELECT c.source, min(c.v) AS t
        |  FROM c JOIN tot USING (source)
        |  WHERE c.cum >= tot.tw - CAST(ceil(0.3 * tot.tw) AS BIGINT) + 1
        |  GROUP BY c.source)
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d JOIN th USING (source)
        |WHERE d.n_chars >= th.t ORDER BY d.doc_id""".stripMargin,
    // per-source quartile thresholds via window ranks (0.25/0.75 are
    // FP-exact), the lo/mid/hi CASE, then q96's HUGEINT mixture
    // replay keyed on the bucket (lo: fl=0 th=round(.25·2^32);
    // mid: fl=1 th=0; hi: fl=2 th=2^31).
    "q109_quality_mixture" ->
      """WITH r AS (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |         count(*) OVER (PARTITION BY source) AS c
        |  FROM documents),
        |t AS (
        |  SELECT source,
        |         max(CASE WHEN rn = CAST(ceil(0.25 * c) AS BIGINT) THEN n_chars END) AS t1,
        |         max(CASE WHEN rn = CAST(ceil(0.75 * c) AS BIGINT) THEN n_chars END) AS t2
        |  FROM r GROUP BY source),
        |b AS (
        |  SELECT d.doc_id, d.source,
        |         CASE WHEN d.n_chars <= t.t1 THEN 'lo'
        |              WHEN d.n_chars <= t.t2 THEN 'mid'
        |              ELSE 'hi' END AS bucket
        |  FROM documents d JOIN t USING (source)),
        |w AS (
        |  SELECT * FROM (VALUES ('lo', 0, 1073741824),
        |                        ('mid', 1, 0),
        |                        ('hi', 2, 2147483648)) AS t(bucket, fl, th)),
        |h AS (
        |  SELECT doc_id, source, bucket, CAST(xor(h2, h2 >> 13) AS BIGINT) AS hash
        |  FROM (
        |    SELECT doc_id, source, bucket,
        |           CAST((CAST(xor(h1, h1 >> 16) AS HUGEINT) * 2246822519)
        |                % 4294967296 AS BIGINT) AS h2
        |    FROM (
        |      SELECT doc_id, source, bucket,
        |             CAST((((CAST(doc_id AS HUGEINT) % 4294967296) + 4294967296)
        |                    % 4294967296 * 2654435761)
        |                  % 4294967296 AS BIGINT) AS h1
        |      FROM b))),
        |kept AS (
        |  SELECT h.doc_id, h.source, h.bucket, ep.epoch
        |  FROM h JOIN w USING (bucket)
        |  JOIN (SELECT CAST(unnest([0, 1, 2]) AS INT) AS epoch) ep
        |    ON ep.epoch <= w.fl
        |  WHERE ep.epoch < w.fl OR h.hash < w.th)
        |SELECT doc_id, source, bucket, epoch FROM kept
        |ORDER BY doc_id, epoch""".stripMargin
  )
}
