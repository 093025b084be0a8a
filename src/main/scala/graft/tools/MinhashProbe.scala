package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    println("docs=" + docs.count())
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sig = docs.withColumn("__bands", Dedup.minhashBands(col("text"))).cache()
    t("signatures")(sig.count())
    // lshCandidatePairs materializes the bucket table at CALL time (the
    // dropped-bucket check) — keep construction inside the timer
    val cands = t("lsh candidates") {
      val c = Dedup.lshCandidatePairs(sig, col("doc_id"), col("__bands")).cache()
      c.count(); c
    }
    println("candidates=" + cands.count())
    val verified = t("verify+filter") {
      val a = docs.select(col("doc_id").as("idA"), col("text").as("__ta"))
      val b = docs.select(col("doc_id").as("idB"), col("text").as("__tb"))
      cands.join(a, "idA").join(b, "idB")
        .withColumn("j", graft.functions.TextFunctions.ngramJaccard(col("__ta"), col("__tb")))
        .filter(col("j") >= 0.8).count()
    }
    println("verified=" + verified)
    t("full dedupNear")(Dedup.dedupNear(docs, "doc_id", "text", 0.8).count())
    spark.stop()
  }
}
