package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: distribution of q44 (as-of join) pass times within a single
  * JVM, to attribute the bench's bimodal sf1/sf10 rows (0.68 ↔ 1.81 s
  * across runs) to either plan instability (would show in-JVM) or
  * JVM/GC/machine state (would not).
  * Usage: runMain graft.tools.AsofJitterProbe [dataDir] [passes] */
object AsofJitterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val passes = if (args.length > 1) args(1).toInt else 10
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val times = (1 to passes).map { i =>
      val t0 = System.nanoTime()
      noop(graft.SparkEntry.queries("q44_asof_join")(spark, dir))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"pass$i: $s%.2f s")
      s
    }
    println(f"min=${times.min}%.2f max=${times.max}%.2f median=${times.sorted.apply(passes / 2)}%.2f")
    spark.stop()
  }
}
