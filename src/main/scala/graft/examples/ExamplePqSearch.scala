package graft.examples

import graft.operators.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Residual IVFADC end-to-end — the billion-vector search lifecycle
 * (Jégou/Douze/Schmid TPAMI 2011), entirely from library operators:
 *
 *   1. BUILD once: IVF coarse quantizer (seeded, bit-deterministic
 *      Lloyd) + a PQ codebook trained on per-cell residuals
 *   2. ENCODE once: each vector → (cell id, m one-byte codes) — at
 *      m=8 that is 8 bytes per vector vs 256 float bytes (32×), and it
 *      is what gets PERSISTED; the float embeddings are never read
 *      again at search time
 *   3. SEARCH many: reload the codes from parquet, probe nProbe cells
 *      per query, ADC-score candidates in O(m) table lookups
 *
 * Recall@k vs the exact float brute force is printed, so both
 * approximations (coarse pruning, PQ reconstruction) are visible.
 *
 * Run: `sbt "runMain graft.examples.ExamplePqSearch"`
 */
object ExamplePqSearch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    // 1. build: coarse quantizer + residual codebook (both deterministic)
    val index = Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCentroids = 16, kmeansIters = 2)
    val cb = Pq.trainResidual(index, "vec_id", "embedding",
      dim = 64, m = 8, ksub = 16, iters = 2)

    // 2. encode once and persist — 8 bytes of codes + a cell id per
    //    vector; this parquet IS the searchable corpus from here on
    val codesPath = java.nio.file.Files.createTempDirectory("ivfadc").toString
    Pq.ivfPqEncodeResidual(index, "vec_id", "embedding", cb)
      .write.mode("overwrite").parquet(codesPath)

    // 3. search the persisted codes (no float corpus access)
    val corpusCodes = spark.read.parquet(codesPath)
    val queries = emb.filter(col("vec_id") < 25)
    val approx = Pq.ivfPqTopKResidualEncoded(index, corpusCodes, queries,
        "vec_id", "embedding", k = 5, cb, nProbe = 4)
      .select(col("qId"), col("cId"))

    val exact = Similarity.bruteForceTopK(queries, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .select(col("qId").as("q2"), col("cId").as("c2"))

    val nTrue = exact.count()
    val hit = approx.join(exact,
      approx("qId") === exact("q2") && approx("cId") === exact("c2")).count()
    println(f"residual IVFADC (8 B codes, nProbe=4/16): $hit of $nTrue exact " +
      f"neighbors recovered (recall@5 = ${hit.toDouble / nTrue}%.2f) " +
      "searching 32x-compressed codes over ~25% of the corpus")
    spark.stop()
  }
}
