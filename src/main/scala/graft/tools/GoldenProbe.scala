package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary golden-freezing probe: runs the pinned-outcome queries at a
  * caller-chosen parallelism so partition-count-independence can be
  * checked before freezing (the FIXTURES.md golden discipline). */
object GoldenProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.getOrElse("32")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = if (args.length > 2) args.drop(2).toSeq
      else Seq("q45_ann_recall", "q48_quantized_knn",
        "q57_ivfadc_recall", "q58_residual_ivfadc_recall",
        "q63_opq_rotation_recall", "q65_opq_nonparametric_recall")
    for (q <- qs) {
      val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
      println(s"[golden local[$n]] $q: ${rows.mkString("; ")}")
    }
    spark.stop()
  }
}
