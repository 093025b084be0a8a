package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Horizontal-scale evidence for the scan-aggregate family: the same
  * three queries `Sf100Probe` times at local[32], swept over
  * local[4] / local[8] / local[16] / local[32] with a FRESH SparkSession
  * per core count (full context stop between — master is fixed per
  * context). The single-node DuckDB number on the same box is the fixed
  * comparator; the claim under test is BENCH_CONTEXT's "the residual
  * scan-agg gap is a per-core constant, so the ratio inverts with
  * horizontal scale" — which is only credible if wall-clock actually
  * falls ~linearly in cores, i.e. the plan has no serial section (driver
  * merge, single-partition shuffle) that would survive a 1000-executor
  * cluster.
  *
  * Methodology per (cores, query): 1 untimed warmup (codegen + page
  * cache + the adaptive path's memoized cardinality probe — all
  * once-per-session costs a long-lived cluster amortizes), then
  * median of `reps` timed passes. Parquet split size is pinned
  * (default 128 MB) so every core count reads the same splits and the
  * curve measures compute scaling, not scan-partitioning luck.
  *
  * Usage: runMain graft.tools.CoresProbe [dataDir] [cores] [reps] [queries...]
  *   dataDir default /root/repo/testdata-sf10
  *   cores   default 4,8,16,32
  *   reps    default 3 (use 2 at sf100 — passes are minutes)
  *   queries optional name filter (default: all three)
  * Prints per-pass lines plus one machine-readable JSON line per query:
  *   {"probe":"cores","query":q,"dir":d,"cores":{"4":s,...}}
  */
object CoresProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val coreList = args.lift(1).getOrElse("4,8,16,32").split(",").map(_.trim.toInt)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val only = args.drop(3).toSet
    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Int, Double]]

    for (n <- coreList) {
      val spark = graft.Graft.register(SparkSession.builder()
        .master(s"local[$n]")
        // shuffle partitions PINNED at 32 for every core count: on a real
        // cluster the partitioning is fixed while executors vary, and a
        // per-cores partition count would change per-partition build sizes
        // (and thus join strategy under the SHJ size guard) mid-curve —
        // the sweep must time the same plan at every point
        .config("spark.sql.shuffle.partitions", "32")
        // optional override for the SHJ build-size guard, so the sweep
        // can model executors with more task memory than the 8 GB
        // default heap (pair with SPARK_DRIVER_MEM — the guard cap and
        // the heap must move together or the admitted build OOMs)
        .config("spark.graft.shj.maxBuildPartitionBytes",
          sys.env.getOrElse("SPARK_GRAFT_SHJ_CAP", (64L << 20).toString))
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
        .config("spark.ui.enabled", "false")
        .getOrCreate())
      spark.sparkContext.setLogLevel("ERROR")
      def li = spark.read.parquet(s"$dir/lineitem.parquet")
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      val queries: Seq[(String, () => Unit)] = Seq(
        "q01_pricing" -> { () =>
          noop(li.groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(round(sum(col("l_quantity")), 2), round(avg(col("l_extendedprice")), 2),
              round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2),
              count(lit(1))))
        },
        // q01 minus the group-by: same five columns decoded, one global
        // aggregate — isolates parquet-decode/memory-bandwidth scaling
        // from hash-aggregation scaling (if this curve flattens where
        // q01's does, the saturated resource is the scan, not the agg)
        "scan_sum" -> { () =>
          noop(li.agg(sum(col("l_quantity")), sum(col("l_extendedprice") * col("l_discount")),
            sum(length(col("l_returnflag")) + length(col("l_linestatus"))), count(lit(1))))
        },
        "cofactor_full" -> { () =>
          noop(li.withColumn("shipyear", year(col("l_shipdate")))
            .agg(graft.Graft.sumTriple(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax"), col("l_linenumber"), col("shipyear")).as("t")))
        },
        // the columnar-batch kernel on the same moments: checks the
        // per-partition-triples + driver-merge shape scales like the
        // scan itself (the merge is KBs × partitions — if this curve
        // ever flattens before the scan's, the driver merge is serial)
        "cofactor_columnar" -> { () =>
          import graft.agg.ColumnarCofactor._
          graft.agg.ColumnarCofactor.cofactor(li,
            Seq(NumCol("l_quantity"), NumCol("l_extendedprice"), NumCol("l_discount"), NumCol("l_tax")),
            Seq(CatCol("l_linenumber"), CatYear("l_shipdate")))
            .getOrElse(sys.error("columnar harvest must engage"))
          ()
        },
        "factorized_adaptive" -> { () =>
          graft.ml.Factorized.cofactorOverJoinAdaptive(
            li.select(col("l_orderkey").as("k"), col("l_quantity")),
            spark.read.parquet(s"$dir/orders.parquet")
              .select(col("o_orderkey").as("k"), col("o_totalprice")),
            "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
          ()
        })
      for ((name, f) <- queries if only.isEmpty || only(name)) {
        f() // warmup, untimed
        val times = (1 to reps).map { i =>
          val t0 = System.nanoTime(); f()
          val s = (System.nanoTime() - t0) / 1e9
          println(f"[cores] local[$n] $name pass$i: $s%.2f s"); s
        }.sorted
        val med = times(times.length / 2)
        println(f"[cores] local[$n] $name median: $med%.2f s")
        results.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap.empty)
          .update(n, med)
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    for ((name, byCores) <- results) {
      val cells = byCores.map { case (c, s) => f""""$c":$s%.3f""" }.mkString(",")
      println(s"""{"probe":"cores","query":"$name","dir":"$dir","cores":{$cells}}""")
    }
  }
}
