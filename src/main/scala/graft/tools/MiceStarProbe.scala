package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The `sf100_mice_star_round` bench row in isolation, with scratch-disk
  * high-water reporting: one chained-MICE round over the bucketed star
  * (the reference Flight workload shape at the 600M-row endpoint).
  * The first sf100 attempt died on `No space left on device` — two
  * DESERIALIZED 600M-row checkpoint generations (~25 GB each) plus
  * shuffle overflowed the ~60 GB scratch ceiling; this probe certifies
  * the serialized+LZ4 checkpoint level (`Graft.checkpoint` +
  * `spark.rdd.compress`) keeps the working set inside it.
  *
  * Usage: runMain graft.tools.MiceStarProbe [dir] [buckets] [passes] [iterations]
  * `iterations` > 1 measures the generation-handoff cost: iteration 1
  * rides the live bucketed scan (zero-exchange), every later iteration
  * reads a checkpointed generation whose layout the AQE checkpoint
  * boundary erases (CheckpointPartitioningProbe) — the per-iteration
  * delta IS that boundary's price at 600M rows.
  */
object MiceStarProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    val buckets = if (args.length > 1) args(1).toInt else 256
    val passes = if (args.length > 2) args(2).toInt else 3
    val iterations = if (args.length > 3) args(3).toInt else 1
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/lineitem.parquet",
      "li_bkt_probe", "l_orderkey", Seq("l_orderkey", "l_quantity"),
      s"$dir-bucketed/lineitem", buckets)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val ord = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/orders.parquet",
      "ord_bkt_probe", "o_orderkey", Seq("o_orderkey", "o_totalprice"),
      s"$dir-bucketed/orders", buckets)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    def scratchBytes: Long = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).toSeq.flatten.map(du).sum
      spark.sparkContext.getConf.get("spark.local.dir", "/tmp")
        .split(",").map(d => du(new java.io.File(d))).sum
    }
    for (p <- 1 to passes) {
      val t0 = System.nanoTime()
      val fact = li.withColumn("x_missing",
        when(pmod(col("k"), lit(7)) === 0, lit(null).cast("double"))
          .otherwise(col("l_quantity") * 0.5))
      val tm = new graft.mice.Mice.Timings
      val done = graft.mice.MiceJoin.imputeChainedOverJoin(
        fact, ord, "k",
        graft.mice.MiceJoin.ChainConfig(
          factNum = Seq("l_quantity", "x_missing"), factCat = Seq(),
          dimNum = Seq("o_totalprice"), imputeCont = Seq("x_missing"),
          iterations = iterations), tm)
      done.write.format("noop").mode("overwrite").save()
      val hw = scratchBytes
      graft.Graft.dropCheckpoint(done)
      println(f"mice_star pass$p: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        f"phases=$tm scratch_highwater=${hw / 1e9}%.1f GB")
    }
    spark.stop()
  }
}
