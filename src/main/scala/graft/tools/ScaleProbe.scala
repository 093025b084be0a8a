package graft.tools

import graft.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Scaling evidence: replicate the sf0.1 inputs in-memory (deterministic
 * id offsets / text variants) and measure how the headline operators'
 * wall-clock grows with input size — the fixed-overhead-vs-throughput
 * split that BENCH_CONTEXT.md argues.
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.register(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s  (n=$n)")
    }

    // --- fused cofactor: 0.6M → 9.6M rows ---
    val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linenumber")).cache()
    li.count()
    for (k <- Seq(1, 4, 16)) {
      val rep = (0 until k).map(_ => li).reduce(_ unionByName _)
      time(s"cofactor 4num+1cat x$k (${600 * k}k rows)") {
        rep.agg(Graft.sumTriple(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax"), col("l_linenumber")).as("t")).head
        600000L * k
      }
    }

    // --- minhash near-dedup: 5k → 150k docs ---
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    docs.count()
    for (k <- Seq(1, 10, 30)) {
      val corpus = (0 until k).map(i =>
        docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
          // every third replica is an exact duplicate; others get a
          // distinct suffix (near-duplicates of the original)
          (if (i % 3 == 0) col("text") else concat(col("text"), lit(s" variant$i"))).as("text"))
      ).reduce(_ unionByName _).cache()
      corpus.count()
      time(s"dedupNear x$k (${5 * k}k docs)") {
        graft.operators.Dedup.dedupNear(corpus, "doc_id", "text", 0.8).count()
      }
      corpus.unpersist()
    }
    spark.stop()
  }
}
