package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scan-aggregate endpoint probe behind BENCH_CONTEXT's sf100
  * numbers: q01 / cofactor / factorized over a 600M-row lineitem
  * (generate with the gen_sf1.py machinery at rep=1000 into
  * /root/repo/testdata-sf100 — relational tables only). 4 passes each;
  * quote the steady-state median of the last 3.
  *
  * Usage: runMain graft.tools.Sf100Probe [dataDir] — any tier with
  * lineitem+orders works (the sf10 factorized ratio is probed this way). */
object Sf100Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled","false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    def li = spark.read.parquet(s"$dir/lineitem.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      for (i <- 1 to 4) {
        val t0 = System.nanoTime()
        f
        println(f"$name pass$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    time("q01_pricing") {
      noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")),2), round(avg(col("l_extendedprice")),2),
          round(avg(col("l_extendedprice")*(lit(1)-col("l_discount"))),2), count(lit(1))))
    }
    time("cofactor_full") {
      noop(li.withColumn("shipyear", year(col("l_shipdate")))
        .agg(graft.Graft.sumTriple(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_linenumber"), col("shipyear")).as("t")))
    }
    time("factorized_adaptive") {
      graft.ml.Factorized.cofactorOverJoinAdaptive(
        li.select(col("l_orderkey").as("k"), col("l_quantity")),
        spark.read.parquet(s"$dir/orders.parquet").select(col("o_orderkey").as("k"), col("o_totalprice")),
        "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
      ()
    }
    spark.stop()
  }
}
