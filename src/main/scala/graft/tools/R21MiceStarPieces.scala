package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 piece-wise timing of the sf10_mice_star_round row: the
  * requireUniqueKey dim probe, the missing-stratum update join (SMJ vs
  * hinted SHJ on the bucketed pair), and the observed-remainder pass —
  * to decide which piece deserves work. Usage:
  * runMain graft.tools.R21MiceStarPieces [dir] [buckets] [reps]
  */
object R21MiceStarPieces {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val buckets = args.lift(1).map(_.toInt).getOrElse(32)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.rdd.compress", "true")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/lineitem.parquet",
      "li_bkt_p21", "l_orderkey", Seq("l_orderkey", "l_quantity"),
      s"$dir-bucketed/lineitem", buckets)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val ord = graft.sources.Tables.attachOrWriteBucketed(spark, s"$dir/orders.parquet",
      "ord_bkt_p21", "o_orderkey", Seq("o_orderkey", "o_totalprice"),
      s"$dir-bucketed/orders", buckets)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val fact = li.withColumn("x_missing",
      when(pmod(col("k"), lit(7)) === 0, lit(null).cast("double"))
        .otherwise(col("l_quantity") * 0.5))
    def timed(name: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: median ${R21Probe.median(ts)}%.3f s  (all: ${ts.map(t => f"$t%.3f").mkString(", ")})")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    timed("requireUniqueKey probe (dim groupBy+limit1)") {
      val dup = ord.where(col("k").isNotNull)
        .groupBy(col("k")).agg(count(lit(1)).as("c")).where(col("c") > 1).limit(1).collect()
      require(dup.isEmpty)
    }
    val missing = fact.filter(col("x_missing").isNull)
    val pred = col("o_totalprice") * 0.001 + col("l_quantity") // stand-in predictor shape
    timed("update join SMJ (default)") {
      noop(missing.join(ord, Seq("k"), "left")
        .withColumn("x_missing", when(col("o_totalprice").isNull, lit(1.0))
          .otherwise(coalesce(pred, lit(1.0))))
        .select("k", "l_quantity", "x_missing"))
    }
    timed("update join SHJ-hinted") {
      noop(missing.join(ord.hint("shuffle_hash"), Seq("k"), "left")
        .withColumn("x_missing", when(col("o_totalprice").isNull, lit(1.0))
          .otherwise(coalesce(pred, lit(1.0))))
        .select("k", "l_quantity", "x_missing"))
    }
    timed("observed remainder pass (scan+filter+noop)") {
      noop(fact.filter(col("x_missing").isNotNull))
    }
    timed("full fact noop (scan floor)")(noop(fact))
    spark.stop()
  }
}
