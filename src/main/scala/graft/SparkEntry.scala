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
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin
  )
}
