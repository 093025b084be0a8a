package graft.tools

import graft.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Microbenchmark for the cofactor aggregate hot path (rows/s). */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.register(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("shipyear", year(col("l_shipdate")))
      .cache()
    val n = li.count()
    def run(name: String, f: () => Unit, reps: Int = 5): Unit = {
      f() // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f())
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$name: $sec%.3f s/run  (${n / sec / 1e6}%.2f M rows/s)")
    }
    run("cofactor 4num+2cat", () =>
      li.agg(Graft.sumTriple(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linenumber"), col("shipyear")).as("t")).head)
    run("cofactor 2num", () =>
      li.agg(Graft.sumTriple(col("l_quantity"), col("l_extendedprice")).as("t")).head)
    run("plain sum x6 (codegen reference)", () =>
      li.agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_quantity") * col("l_quantity")),
        sum(col("l_quantity") * col("l_extendedprice")),
        sum(col("l_discount")), sum(col("l_tax"))).head)
    run("grouped cofactor by returnflag", () =>
      li.groupBy(col("l_returnflag")).agg(Graft.sumTriple(col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"), col("l_linenumber")).as("t")).head)
    spark.stop()
  }
}
