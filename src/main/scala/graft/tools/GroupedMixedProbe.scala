package graft.tools

import org.apache.spark.sql.SparkSession

/** Times the grouped cofactor on the FULL mixed num+cat triple shape —
  * 4 numerics + 2 categoricals (packed string `l_returnflag`, derived
  * `year(l_shipdate)`) grouped by `l_linenumber` — against which
  * `tools/bench_duckdb.py cofactor_grouped_mixed_equivalent` is the
  * honest DuckDB comparison: the same semantic content costs DuckDB
  * FOUR grouped scans (flat 15 sums by k; count+4 sums by (k,c1) and
  * (k,c2); cross counts by (k,c1,c2)) where the kernel pays one.
  * The plain `GroupedProbe` row (15 numeric sums by one int key) is
  * DuckDB's best case, not the operator's workload — this probe
  * measures the workload.
  *
  * Usage: runMain graft.tools.GroupedMixedProbe [dir] [passes]
  */
object GroupedMixedProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import graft.agg.ColumnarCofactor._
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val g = cofactorPerClass(
        spark.read.parquet(s"$dir/lineitem.parquet"),
        Seq(NumCol("l_quantity"), NumCol("l_extendedprice"),
          NumCol("l_discount"), NumCol("l_tax")),
        Seq(CatPackedStrings(Seq("l_returnflag")), CatYear("l_shipdate")),
        CatCol("l_linenumber"))
        .getOrElse(sys.error("mixed grouped harvest must engage"))
      println(f"grouped_mixed_columnar pass$p: ${(System.nanoTime() - t0) / 1e9}%.2f s (${g.size} groups)")
    }
    spark.stop()
  }
}
