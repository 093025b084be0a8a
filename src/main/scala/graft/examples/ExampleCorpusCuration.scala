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
 *   2. quality gate + blocklist gate (hashed term-set, one byte walk)
 *   3. exact dedup on the normalized content fingerprint
 *   4. MinHash/LSH near-dedup with transitive (connected-component)
 *      cluster collapse
 *   5. BM25 decontamination probe (keyword-match candidates against an
 *      eval-set query before the expensive n-gram pass)
 *   6. deterministic train/val/test split (engine-portable — a split
 *      written to the dataset card is re-derivable anywhere, forever)
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
      .withColumn("__bl", TextFunctions.blocklistStats(col("text"),
        Seq("slow", "zzz_badword")))
    // quality gate + blocklist density gate in the same scan
    val gated = scored
      .filter(col("quality") >= 0.1 &&
        col("__bl.n_matched") * 20 < col("__bl.n_tokens"))
      .drop("__bl")
    val n1 = gated.count()

    val exactDeduped = Dedup.exact(
      gated.withColumn("__fp", TextFunctions.fingerprint(col("text"))),
      Seq(col("__fp")), col("doc_id")).drop("__fp")
    val n2 = exactDeduped.count()

    val curated = Dedup.dedupNearTransitive(exactDeduped, "doc_id", "text", threshold = 0.8)
    val n3 = curated.count()

    // BM25 decontamination probe: rank keyword-match candidates against
    // an eval-set query, hand only the top slice to the n-gram pass
    val suspects = graft.operators.TextRank.bm25(
      curated, "doc_id", "text", Seq("customer", "order", "query"))
      .orderBy(desc("score")).limit(100)
    val n4 = suspects.count()

    // deterministic split: same doc_id → same split on any engine
    val split = curated.withColumn("split",
      graft.operators.StableSplit.stableSplit(col("doc_id"), Seq(0.98, 0.01, 0.01)))

    println(s"input documents:        $n0")
    println(s"after quality+blocklist gate: $n1")
    println(s"after exact dedup:      $n2")
    println(s"after near-dedup:       $n3")
    println(s"decontamination candidates (BM25 top slice): $n4")
    split.groupBy(col("split"), col("lang")).count()
      .orderBy(col("split"), desc("count")).show(12, truncate = false)
    spark.stop()
  }
}
