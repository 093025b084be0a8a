package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Isolated re-timing of `sf100_factorized_bucketed`, the one BENCH_r14
  * row (+345%, 4.20 -> 19.47 s) that exceeded the certified contention
  * band and was never covered by Sf100RowCheck's scan-row isolation.
  * Fresh JVM, nothing else first, exact Bench shapes (same bucketed
  * attach, same adaptive call, same 256 buckets). If passes land at the
  * committed ~4.2 s the row is certified ENVIRONMENTAL; if not, bisect
  * b7a12d4/5afee47/b6206c7.
  * Usage: runMain graft.tools.FactBucketedCheck [sf100Dir] [passes] */
object FactBucketedCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    val li = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/lineitem.parquet",
      "li_bkt_check", "l_orderkey", Seq("l_orderkey", "l_quantity"),
      s"$dir-bucketed/lineitem", 256)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val ord = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/orders.parquet",
      "ord_bkt_check", "o_orderkey", Seq("o_orderkey", "o_totalprice"),
      s"$dir-bucketed/orders", 256)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      graft.ml.Factorized.cofactorOverJoinAdaptive(
        li, ord, "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
      println(f"pass$p: factorized_bucketed=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
