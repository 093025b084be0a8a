package graft.tools

import graft.Graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Ladder for the brute-force knn gap (round-12 advice #6: sf10 1.68× vs
 * DuckDB; is it the corpus scan or the pair-scoring tail?). Times each
 * stage of the q16 pipeline in isolation so the slow part has a name:
 *
 *   scan        — parquet read + array decode only
 *   norm        — + per-row vector_norm
 *   score       — + 20×|corpus| crossJoin and fused dot (no rank)
 *   window      — the shipped path (score + window rank top-k)
 *
 * window − score = the ranking tail (shuffle of all pairs + per-query
 * sort); score − norm = pair generation + dot products.
 */
object KnnProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata-sf10")
    val spark = Graft.register(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    println(s"corpus rows: $n")

    def run(name: String, f: () => Unit, reps: Int = 3): Double = {
      f() // warmup
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f())
      val sec = (System.nanoTime() - t0) / 1e9 / reps
      println(f"$name%-28s $sec%8.3f s/run")
      sec
    }

    run("scan+decode", () =>
      emb.agg(sum(element_at(col("embedding"), 1))).head())
    run("scan+norm", () =>
      emb.agg(sum(graft.operators.Similarity.norm(col("embedding")))).head())
    val q = emb.filter(col("vec_id") < 20)
    run("score (no rank)", () => {
      val qq = q.select(col("vec_id").as("qId"), col("embedding").as("__qv"))
        .withColumn("__qn", graft.operators.Similarity.norm(col("__qv")))
      val c = emb.select(col("vec_id").as("cId"), col("embedding").as("__cv"))
        .withColumn("__cn", graft.operators.Similarity.norm(col("__cv")))
      c.crossJoin(broadcast(qq))
        .filter(col("qId") =!= col("cId"))
        .withColumn("cos", graft.operators.Similarity.dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
        .agg(sum(col("cos")), count(lit(1))).head()
    })
    run("topk agg full (shipped)", () =>
      graft.operators.Similarity.bruteForceTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 3).collect())

    spark.stop()
  }
}
