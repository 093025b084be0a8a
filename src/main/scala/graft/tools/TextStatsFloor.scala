package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-floor decomposition for the text_stats family: the fused
  * TokenStats row at sf10 measures ~11.5 s vs DuckDB ~9.8 s (1.17×).
  * Is the gap expression cost (a columnar kernel could close it) or
  * the parquet string-scan floor (it could not)? */
object TextStatsFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (p <- 1 to 3) {
      var t0 = System.nanoTime()
      docs.agg(sum(octet_length(col("text")))).head()
      val scanOnly = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      graft.SparkEntry.queries("q10_token_stats")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val full = (System.nanoTime() - t0) / 1e9
      println(f"pass$p: scan_only=$scanOnly%.2f s token_stats_full=$full%.2f s expr_overhead=${full - scanOnly}%.2f s")
    }
    spark.stop()
  }
}
