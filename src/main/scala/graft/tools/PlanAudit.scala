package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints physical plans of headline queries for pushdown/broadcast
  * inspection (manual use). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- args.toSeq match { case Nil => Seq("q23_star_join", "q16_knn_bruteforce", "q11_dedup_exact", "q09_factorized_join"); case s => s }) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
