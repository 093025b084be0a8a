package graft

import graft.ml.LinReg
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
      Tables.load(s, dir, "documents").select(
          col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          size(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).cast("long").as("n_distinct"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("doc_id"))
    },

    // exact deduplication: keep smallest doc_id per (lang, source) key
    "q11_dedup_exact" -> { (s, dir) =>
      graft.operators.Dedup.exact(
          Tables.load(s, dir, "documents"), Seq(col("lang"), col("source")), col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },

    // quality scoring (length saturation × lexical diversity × punct penalty)
    "q12_quality_score" -> { (s, dir) =>
      Tables.load(s, dir, "documents").select(
          col("doc_id"),
          graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    },

    // language-id heuristic (rows-only: stopword tables are library-defined)
    "q13_langid_counts" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(graft.functions.TextFunctions.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang_pred"))
    },

    // MinHash+LSH near-dedup on documents ∪ perturbed copies (rows-only)
    "q14_minhash_neardup" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
      val mangled = docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + lit(10000000L)).as("doc_id"),
          // drop the last word ⇒ high-jaccard near-duplicate
          regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
      val all = docs.unionByName(mangled).cache()
      val kept = graft.operators.Dedup.dedupNear(all, "doc_id", "text", threshold = 0.8)
      import s.implicits._
      Seq((all.count(), kept.count())).toDF("n_input", "n_kept")
    },

    // SimHash fingerprints (rows-only: hash family is library-defined)
    "q15_simhash" -> { (s, dir) =>
      Graft.register(s)
      Tables.load(s, dir, "documents").select(
          col("doc_id"),
          graft.functions.SimHash64.simhash64(
            graft.functions.TextFunctions.tokens(lower(col("text")))).as("fp"))
        .orderBy(col("doc_id"))
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

    // MICE imputation summary (rows-only: iterative, not SQL-expressible)
    "q18_mice_impute" -> { (s, dir) =>
      val base = li(s, dir)
        .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_linenumber"))
        .withColumn("miss", rand(7) < 0.15)
        .withColumn("l_discount", when(col("miss"), lit(null)).otherwise(col("l_discount")))
      val cfg = graft.mice.Mice.Config(
        contCols = Seq("l_quantity", "l_extendedprice", "l_discount"),
        catCols = Seq("l_linenumber"),
        imputeCont = Seq("l_discount"), imputeCat = Seq(), iterations = 2)
      val done = graft.mice.Mice.partitioned(base, cfg)
      done.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("miss"), 1L).otherwise(0L)).as("n_imputed"),
        sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("n_null_after"))
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
    }
  )

  /** DuckDB-equivalent SQL per query (same aliases, same rounding). */
  def oracleSql: Map[String, String] = Map(
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
        |       round(least(1.0, length(text) / 500.0)
        |             * (len(list_distinct(string_split_regex(trim(text), '\s+')))::DOUBLE
        |                / len(string_split_regex(trim(text), '\s+')))
        |             * greatest(0.0, 1.0 - (len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))::DOUBLE
        |                                    / length(text)) * 4.0),
        |             4) AS quality
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
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
