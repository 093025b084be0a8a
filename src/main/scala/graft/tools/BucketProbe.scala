package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The bucketize-once ladder behind BENCH_CONTEXT's factorized_bucketed
  * rows: on one tier (lineitem ⋈ orders on orderkey), time
  *   (a) the adaptive factorized cofactor over raw parquet (the two
  *       full-tier exchanges of partition-to-fit / plain SHJ),
  *   (b) the ONE-TIME bucketize write of both sides,
  *   (c) the same operator over the bucketed tables (zero exchanges),
  * so the amortization claim is a measured pair, not an assertion:
  * (b) is paid once per corpus, (a)−(c) is saved on every subsequent
  * run of the repeated-join pattern (MICE column-steps, retraining).
  *
  * Usage: runMain graft.tools.BucketProbe [dataDir] [buckets] [passes]
  * defaults: /root/repo/testdata-sf10 32 4. Writes bucketed tables to
  * <dataDir>-bucketed (reused if present — delete to re-measure (b)).
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val passes = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit =
      for (i <- 1 to passes) {
        val t0 = System.nanoTime()
        f
        println(f"$name pass$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    def adaptive(li: org.apache.spark.sql.DataFrame, ord: org.apache.spark.sql.DataFrame): Unit = {
      graft.ml.Factorized.cofactorOverJoinAdaptive(
        li, ord, "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
      ()
    }

    time("factorized_adaptive_raw") {
      adaptive(
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey").as("k"), col("l_quantity")),
        spark.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey").as("k"), col("o_totalprice")))
    }

    val t0 = System.nanoTime()
    val liB = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/lineitem.parquet",
      "probe_li_bkt", "l_orderkey", Seq("l_orderkey", "l_quantity"),
      s"$dir-bucketed/lineitem", buckets)
    val ordB = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/orders.parquet",
      "probe_ord_bkt", "o_orderkey", Seq("o_orderkey", "o_totalprice"),
      s"$dir-bucketed/orders", buckets)
    println(f"bucketize_once: ${(System.nanoTime() - t0) / 1e9}%.2f s ($buckets buckets)")

    time("factorized_bucketed") {
      adaptive(liB.select(col("l_orderkey").as("k"), col("l_quantity")),
        ordB.select(col("o_orderkey").as("k"), col("o_totalprice")))
    }

    // plan audit: the bucketed join must carry zero exchanges. Exact row
    // counts passed explicitly — without them the build estimate runs
    // stats×30 (conservative by design) and the tier may refuse the
    // per-bucket cap; the production adaptive path always probes counts.
    val j = graft.ml.Factorized.hashJoinIfSafe(
      liB.select(col("l_orderkey").as("k"), col("l_quantity")),
      ordB.select(col("o_orderkey").as("k"), col("o_totalprice")), Seq("k"),
      leftRows = Some(liB.count()), rightRows = Some(ordB.count()))
    val ex = "Exchange".r.findAllIn(j.queryExecution.executedPlan.toString).length
    println(s"bucketed join exchanges in plan: $ex")
    spark.stop()
  }
}
