package graft.examples

import graft.functions.TextFunctions
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end training-corpus curation over the documents table — the
 * batch pipeline a 100 TB pretraining-data run would ship, composed
 * entirely from the library's operators:
 *
 *   1. language ID + quality scoring (pure Column expressions)
 *   2. quality gate
 *   3. exact dedup on the normalized content fingerprint
 *   4. MinHash/LSH near-dedup with transitive (connected-component)
 *      cluster collapse
 *
 * Every stage is one shuffle or less; nothing reaches the driver except
 * final counts.
 *
 * Run: `sbt "runMain graft.examples.ExampleCorpusCuration"`
 */
object ExampleCorpusCuration {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val n0 = docs.count()

    val scored = docs
      .withColumn("lang", TextFunctions.langId(col("text")))
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
    val gated = scored.filter(col("quality") >= 0.1)
    val n1 = gated.count()

    val exactDeduped = Dedup.exact(
      gated.withColumn("__fp", TextFunctions.fingerprint(col("text"))),
      Seq(col("__fp")), col("doc_id")).drop("__fp")
    val n2 = exactDeduped.count()

    val curated = Dedup.dedupNearTransitive(exactDeduped, "doc_id", "text", threshold = 0.8)
    val n3 = curated.count()

    println(s"input documents:        $n0")
    println(s"after quality gate:     $n1")
    println(s"after exact dedup:      $n2")
    println(s"after near-dedup:       $n3")
    curated.groupBy(col("lang")).count().orderBy(desc("count")).show(10, truncate = false)
    spark.stop()
  }
}
