package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scan-aggregate knob sweep for the q01/cofactor family — the one
  * bench family still graded `weak` on the single-node number (3.3×/
  * 2.5× DuckDB at sf100, attributed to memory-bandwidth-bound parquet
  * decode past ~16 cores by CoresProbe). Before accepting that floor,
  * sweep the scan-side knobs a deployment could actually turn:
  *   - `spark.sql.parquet.columnarReaderBatchSize` (default 4096 rows):
  *     larger batches amortize per-batch virtual calls IF rows are
  *     narrow; smaller batches fit L2 IF decode is cache-bound.
  *   - `spark.sql.files.maxPartitionBytes` (default 128 MB): fewer,
  *     larger scan tasks cut scheduling overhead vs worse balance.
  *   - vectorized reader OFF as a control (expected much slower — if
  *     it is NOT, the vectorized path is mis-engaging).
  * Each config runs q01 (pricing scan-agg) for `passes` timed passes
  * after one untimed warmup; the sweep prints per-config medians so a
  * win (or the absence of one) is a recorded number, not a guess.
  *
  * Usage: runMain graft.tools.ScanTuneProbe [dataDir] [passes]
  * defaults: /root/repo/testdata-sf10 3
  */
object ScanTuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def q01() = noop(spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2), round(avg(col("l_extendedprice")), 2),
        round(avg(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2),
        count(lit(1))))

    val sweeps: Seq[(String, Map[String, String])] = Seq(
      "baseline (4096 batch, 128MB split)" -> Map(),
      "batch 8192" -> Map("spark.sql.parquet.columnarReaderBatchSize" -> "8192"),
      "batch 16384" -> Map("spark.sql.parquet.columnarReaderBatchSize" -> "16384"),
      "batch 2048" -> Map("spark.sql.parquet.columnarReaderBatchSize" -> "2048"),
      "split 256MB" -> Map("spark.sql.files.maxPartitionBytes" -> (256L << 20).toString),
      "split 512MB" -> Map("spark.sql.files.maxPartitionBytes" -> (512L << 20).toString),
      "split 64MB" -> Map("spark.sql.files.maxPartitionBytes" -> (64L << 20).toString),
      "batch 8192 + split 256MB" -> Map(
        "spark.sql.parquet.columnarReaderBatchSize" -> "8192",
        "spark.sql.files.maxPartitionBytes" -> (256L << 20).toString),
      "vectorized OFF (control)" -> Map("spark.sql.parquet.enableVectorizedReader" -> "false"),
      // baseline REPEATED last: the first config of a sweep always
      // measures slowest regardless of which config runs first (JVM-wide
      // JIT on the parquet decode loops outlasts the one untimed
      // warmup) — a knob only counts as a win if it beats THIS row, not
      // the cold first row
      "baseline again (warm control)" -> Map()
    )
    for ((name, conf) <- sweeps) {
      val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        q01() // warmup (plan + codegen for this config)
        val times = (1 to passes).map { _ =>
          val t0 = System.nanoTime(); q01(); (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"$name%-36s median ${times(times.length / 2)}%.2f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    spark.stop()
  }
}
