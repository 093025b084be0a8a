package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-21 interleaved A/B of the q44 asof shape: views tie-dedup via
  * the r20 groupBy(user, t) pre-aggregate (extra exchange) vs the r21
  * rightOrder-based dedup inside the asof window (no pre-aggregate).
  * Interleaved alternating reps cancel box drift. Checks identical
  * results first. Usage: runMain graft.tools.R21AsofAb [dir] [reps]
  */
object R21AsofAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    val eventsSchema = spark.read.parquet(dir + "/events.parquet").schema
    def ev = spark.read.schema(eventsSchema).parquet(dir + "/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t_us"))
    def clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("t_us"))
    def shape(preAgg: Boolean): DataFrame = {
      val views =
        if (preAgg) ev.filter(col("event_type") === "view")
          .groupBy(col("user_id"), col("t_us").as("vt"))
          .agg(max(col("event_id")).as("v_eid"))
        else ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("t_us").as("vt"), col("event_id").as("v_eid"))
      graft.operators.AsofJoin.asofBackward(
          clicks, views, col("user_id"), col("user_id"),
          col("t_us"), col("vt"), rightOrder = col("v_eid"))
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof.v_eid"), lit(-1L)).as("view_eid"),
          coalesce(col("t_us") - col("asof.vt"), lit(-1L)).as("dt_us"))
        .orderBy(col("event_id"))
    }
    def sig(df: DataFrame): Long =
      df.agg(sum(xxhash64(col("event_id"), col("view_eid"), col("dt_us")))).head().getLong(0)
    val (sa, sb) = (sig(shape(true)), sig(shape(false)))
    println(s"preAgg=$sa window=$sb identical=${sa == sb}")
    require(sa == sb)
    def run(preAgg: Boolean): Double = {
      val t0 = System.nanoTime()
      shape(preAgg).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(true); run(false); run(true); run(false) // warm both
    val (as, bs) = (collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
    for (_ <- 1 to reps) { as += run(true); bs += run(false) }
    println(f"A preAgg : median ${R21Probe.median(as.toSeq)}%.3f s (${as.map(t => f"$t%.3f").mkString(", ")})")
    println(f"B window : median ${R21Probe.median(bs.toSeq)}%.3f s (${bs.map(t => f"$t%.3f").mkString(", ")})")
    spark.stop()
  }
}
