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
        col("l_tax"), col("l_linenumber"), col("shipyear")).as("t")).head())
    run("cofactor 2num", () =>
      li.agg(Graft.sumTriple(col("l_quantity"), col("l_extendedprice")).as("t")).head())
    run("plain sum x6 (codegen reference)", () =>
      li.agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_quantity") * col("l_quantity")),
        sum(col("l_quantity") * col("l_extendedprice")),
        sum(col("l_discount")), sum(col("l_tax"))).head())
    run("grouped cofactor by returnflag", () =>
      li.groupBy(col("l_returnflag")).agg(Graft.sumTriple(col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"), col("l_linenumber")).as("t")).head())

    // 5M-row synthetic stress (no parquet IO; pure aggregate throughput)
    val big = spark.range(0, 5000000, 1, 32)
      .select(
        (col("id") % 97).cast("double").as("x1"),
        (col("id") % 1009).cast("double").as("x2"),
        (col("id") % 31).cast("double").as("x3"),
        (col("id") % 7).cast("int").as("c1"),
        (col("id") % 13).cast("int").as("c2"))
      .cache()
    val bn = big.count()
    def runBig(name: String, f: () => Unit, reps: Int = 3): Unit = {
      f()
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f())
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$name: $sec%.3f s/run  (${bn / sec / 1e6}%.2f M rows/s)")
    }
    runBig("cofactor 3num+2cat on 5M rows", () =>
      big.agg(Graft.sumTriple(col("x1"), col("x2"), col("x3"), col("c1"), col("c2")).as("t")).head())
    runBig("grouped (1009 keys) cofactor on 5M rows", () =>
      big.groupBy(col("c2")).agg(Graft.sumTriple(col("x1"), col("x2"), col("c1")).as("t")).head())
    spark.stop()
  }
}
