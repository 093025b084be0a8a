package graft.examples

import graft.operators.{Quantize, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end embedding search at the 100 TB configuration — the memory
 * and candidate-cost levers composed, entirely from library operators:
 *
 *   1. int8-quantize the corpus ONCE (native codegen'd expression;
 *      4× smaller vectors — at 100 TB the embedding column is usually
 *      the single largest surface, so this is the difference between
 *      spilling and not)
 *   2. build an IVF index over the QUANTIZED vectors (seeded centroids
 *      + bit-deterministic Lloyd refinement — same index every run)
 *   3. probe-limited search: each query scores only nProbe/nCentroids
 *      of the corpus, through the same codegen'd cosine kernel the
 *      exact path uses (it accepts any fixed-width numeric array)
 *
 * The trade is printed against the float brute force: recall@k of the
 * quantized IVF search vs the exact answer, so the two approximations
 * (int8 grid, probe limit) are visible rather than assumed.
 *
 * Run: `sbt "runMain graft.examples.ExampleQuantizedSearch"`
 */
object ExampleQuantizedSearch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    // 1. quantize once; at scale this is the stored/broadcast form
    val q8 = emb.select(col("vec_id"),
      Quantize.quantizeInt8(col("embedding")).getField("q").as("q8"))

    // 2. deterministic IVF over the quantized corpus
    val index = Similarity.ivfBuild(q8, "vec_id", "q8", nCentroids = 16)

    // 3. probe-limited search for 25 queries
    val queries = q8.filter(col("vec_id") < 25)
    val approx = Similarity.ivfTopK(index, queries,
        "vec_id", "q8", "vec_id", "q8", k = 5, nProbe = 4)
      .select(col("qId"), col("cId"))

    // exact float baseline for the same queries
    val exact = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 25), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select(col("qId").as("q2"), col("cId").as("c2"))

    val nTrue = exact.count()
    val hit = approx.join(exact,
      approx("qId") === exact("q2") && approx("cId") === exact("c2")).count()
    println(f"quantized IVF search: $hit of $nTrue exact neighbors recovered " +
      f"(recall@5 = ${hit.toDouble / nTrue}%.2f) scanning ~${4.0 / 16 * 100}%.0f%% " +
      "of a 4x-smaller corpus per query")
    spark.stop()
  }
}
