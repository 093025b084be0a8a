package graft.tools

import graft.{Graft, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Round-20 A/B probe: (1) q09 factorized_join with the kernel
  * strategies installed vs popped — after the feeds-a-join refusal the
  * two must be the SAME plan and time; (2) the FLAT moments route's
  * COLD one-shot cost (planning probe scan + kernel scan) vs the
  * default single-scan plan — the open question from the r19 verdict. */
object RouteFixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graft.register(spark)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- q09 with/without strategies
    def q09 = SparkEntry.queries("q09_factorized_join")(spark, sfDir)
    for (w <- 1 to 2) noop(q09) // warm (no strategies yet)
    val tDefault = (1 to 3).map(_ => time(noop(q09))).min
    Graft.enableSqlKernels(spark)
    val planStr = q09.queryExecution.executedPlan.toString
    println(s"KERNEL_IN_PLAN=${planStr.contains("GroupedCofactorKernel")}")
    for (w <- 1 to 1) noop(q09)
    val tRouted = (1 to 3).map(_ => time(noop(q09))).min
    println(f"q09 default=$tDefault%.2fs strategiesInstalled=$tRouted%.2fs")

    // ---- flat moments cold one-shot: probe+kernel vs default 1 scan.
    // Cold = fresh query plan over a fresh file snapshot (copy the
    // parquet so the probe memo can't hit).
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def flatQ(src: org.apache.spark.sql.DataFrame) =
      src.agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sq"),
        avg(col("l_extendedprice")).as("ap"))
    // warm the JIT on the default plan
    spark.experimental.extraStrategies = Seq.empty
    for (_ <- 1 to 2) flatQ(li).collect()
    val defCold = (1 to 3).map(_ => time(flatQ(li).collect())).min
    Graft.enableSqlKernels(spark)
    // cold: clear the probe memo each rep so planning pays the probe scan
    val kernelCold = (1 to 3).map { _ =>
      graft.ml.Factorized.clearProbeCache()
      graft.sources.ParquetNullStats.clearCache()
      time(flatQ(li).collect())
    }.min
    // warm: memoized probe
    val kernelWarm = (1 to 3).map(_ => time(flatQ(li).collect())).min
    println(f"flat_moments default=$defCold%.3fs kernelCold=$kernelCold%.3fs kernelWarm=$kernelWarm%.3fs")

    // ---- flat moments with DERIVED arithmetic (the q125/q01 shape)
    def flatDerived(src: org.apache.spark.sql.DataFrame) =
      src.agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("adp"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("chg"),
        count(lit(1)).as("cnt"))
    spark.experimental.extraStrategies = Seq.empty
    for (_ <- 1 to 2) flatDerived(li).collect()
    val dDef = (1 to 3).map(_ => time(flatDerived(li).collect())).min
    Graft.enableSqlKernels(spark)
    val dKCold = (1 to 3).map { _ =>
      graft.ml.Factorized.clearProbeCache()
      graft.sources.ParquetNullStats.clearCache(); time(flatDerived(li).collect())
    }.min
    val dKWarm = (1 to 3).map(_ => time(flatDerived(li).collect())).min
    println(f"flat_derived default=$dDef%.3fs kernelCold=$dKCold%.3fs kernelWarm=$dKWarm%.3fs")
    spark.stop()
  }
}
