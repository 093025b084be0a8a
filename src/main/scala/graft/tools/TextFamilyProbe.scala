package graft.tools

import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock ladder for the per-document text-quality family at any
  * tier: which operators are at the scan floor and which pay
  * interpreted-HOF / regex / token-array costs worth fusing. */
object TextFamilyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)
    val docs = spark.read.parquet(dir + "/documents.parquet").select(col("text"))
    def t(name: String)(c: org.apache.spark.sql.Column): Unit = {
      for (p <- 1 to 2) {
        val t0 = System.nanoTime()
        docs.agg(sum(c.cast("double"))).head()
        println(f"$name pass$p: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    t("scan floor (octet_length)")(octet_length(col("text")))
    t("token_stats (fused)")(TextFunctions.tokenStats(col("text")).getField("n_tokens"))
    t("quality_score")(TextFunctions.qualityScore(col("text")))
    t("lang_id")(length(TextFunctions.langId(col("text"))))
    t("stopword_ratio")(TextFunctions.stopwordRatio(col("text")))
    t("repetition_score (byte-level)")(TextFunctions.repetitionScore(col("text")))
    t("fingerprint")(TextFunctions.fingerprint(col("text")))
    t("bag_fingerprint")(TextFunctions.bagFingerprint(col("text")))
    t("pii_redact (3 regex)")(length(TextFunctions.redactPii(col("text"))))
    spark.stop()
  }
}
