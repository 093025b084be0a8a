package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 diagnosis of the sf10_factorized_adaptive instability
  * (r20 verdict item 4): runs the exact bench shape N times in one JVM
  * and prints per-rep wall-clock, GC time delta, and the physical join
  * strategy actually planned, under AQE on/off — to separate AQE
  * nondeterminism from JVM/GC/page-cache contention.
  *
  * Usage: runMain graft.tools.R21FactAdaptiveDiag [dataDir] [reps] [aqe]
  */
object R21FactAdaptiveDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val aqe = args.lift(2).getOrElse("true")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    println(s"aqe=$aqe heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}MB")
    for (r <- 1 to reps) {
      val g0 = gcMillis; val t0 = System.nanoTime()
      graft.ml.Factorized.cofactorOverJoinAdaptive(
        Tables.load(spark, dir, "lineitem").select(col("l_orderkey").as("k"), col("l_quantity")),
        Tables.load(spark, dir, "orders").select(col("o_orderkey").as("k"), col("o_totalprice")),
        "k", Seq("l_quantity"), Seq(), Seq("o_totalprice"), Seq())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"rep $r: ${dt}%.3f s  gc +${gcMillis - g0} ms")
    }
    spark.stop()
  }
}
