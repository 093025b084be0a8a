package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the grouped cofactor (Graft.cofactorGrouped, kernel route
  * REQUIRED) on a tier dir — the vs-DuckDB context row for the grouped
  * family (DuckDB equivalent: per-group count + 4 sums + 10 pairwise
  * products grouped by l_linenumber; tools/bench_duckdb.py
  * `cofactor_grouped_equivalent`).
  *
  * Usage: runMain graft.tools.GroupedProbe [dir] [passes]
  */
object GroupedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val g = graft.Graft.cofactorGrouped(
        spark.read.parquet(s"$dir/lineitem.parquet"), "l_linenumber",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), Seq())
      require(graft.Graft.lastGroupedRoute() == "columnar", "kernel route required")
      val n = g.count()
      println(f"grouped_columnar pass$p: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n groups)")
    }
    spark.stop()
  }
}
