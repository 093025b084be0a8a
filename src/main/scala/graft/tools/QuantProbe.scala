package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of the sf100 quantile cut (round-19): threshold
  * selection vs the final pushable filter, so the per-job floor is
  * attributable. Temporary probe — findings land in BENCH_CONTEXT.md. */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf100")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      val th = graft.operators.Quantiles.topFractionThreshold(
        docs, col("n_chars").cast("double"), 0.1)
      val tSel = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      docs.filter(col("n_chars").cast("double") >= lit(th)).select(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      val tFil = (System.nanoTime() - t0) / 1e9
      println(f"pass $i: select=$tSel%.3f s filter=$tFil%.3f s (th=$th)")
    }
    spark.stop()
  }
}
