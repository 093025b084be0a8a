package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dumps `.explain("formatted")` for the round-21 touched query shapes
  * (the bench rows' exact DataFrames) to stdout, one block per name —
  * redirected into plans/r21/<name>_{before,after}.txt by the builder.
  *
  * Usage: runMain graft.tools.R21PlanDump <name> [dataDir]
  */
object R21PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("minhash_neardup")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    graft.Graft.enableSqlKernels(spark)
    val df: DataFrame = name match {
      case "minhash_neardup" =>
        val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
        val mangled = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + lit(10000000L)).as("doc_id"),
            regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
        graft.operators.Dedup.dedupNear(
          docs.unionByName(mangled), "doc_id", "text", threshold = 0.8)
      case "lsh_pairs" =>
        val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
        val prep = docs.select(col("doc_id"),
          graft.operators.Dedup.minhashBands(col("text")).as("__bands"))
        graft.operators.Dedup.lshCandidatePairs(prep, col("doc_id"), col("__bands"))
      case "dedup_lines" =>
        val docs = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
        graft.operators.Dedup.dedupLines(docs, "doc_id", "text")
      case "dedup_lines_hot" =>
        val docs = Tables.load(spark, dir, "documents")
          .select(col("doc_id"),
            concat(col("text"), lit("\nGRAFT FOOTER")).as("text"))
        graft.operators.Dedup.dedupLines(docs, "doc_id", "text",
          hotLineThreshold = 100L)
      case "sessionize" =>
        graft.SparkEntry.queries("q33_sessionize")(spark, dir)
      case "asof_join" =>
        graft.SparkEntry.queries("q44_asof_join")(spark, dir)
      case "range_join" =>
        graft.SparkEntry.queries("q46_range_join")(spark, dir)
      case other =>
        graft.SparkEntry.queries(other)(spark, dir)
    }
    df.explain("formatted")
    spark.stop()
  }
}
