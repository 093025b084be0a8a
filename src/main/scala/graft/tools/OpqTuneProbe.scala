package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off: does pushing the OPQ alternation harder (more opq/k-means
  * iterations, more codebook Lloyd iterations) beat q65's pinned
  * 36/39-of-150 operating point at the same 32 bits? Candidate goldens
  * only if a variant clearly wins at BOTH probe widths.
  * Usage: runMain graft.tools.OpqTuneProbe [dataDir] */
object OpqTuneProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 50)
    val bf = graft.operators.Similarity.bruteForceTopK(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .select(col("qId"), col("cId")).cache()
    val nTrue = bf.count()
    println(s"n_true=$nTrue")
    val idx = graft.operators.Similarity.ivfBuild(
      emb, "vec_id", "embedding", nCentroids = 16, kmeansIters = 3)
    def hits(df: DataFrame): Long = {
      val d = df.select(col("qId").as("q2"), col("cId").as("c2"))
      bf.join(d, bf("qId") === d("q2") && bf("cId") === d("c2")).count()
    }
    val variants = Seq(
      ("q65 baseline (opq 8/8, train 2)", 8, 8, 2),
      ("opq 24/16, train 2", 24, 16, 2),
      ("opq 8/8, train 4", 8, 8, 4),
      ("opq 24/16, train 4", 24, 16, 4),
      ("opq 48/24, train 6", 48, 24, 6))
    for ((name, oi, ki, ti) <- variants) {
      val rot = Some(graft.operators.Pq.opqRotationResidual(
        idx, "vec_id", "embedding", dim = 64, m = 8, ksub = 16,
        opqIters = oi, kmeansIters = ki))
      val cb = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = ti, rot = rot)
      val line = Seq(4, 8).map { nProbe =>
        val h = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
          "vec_id", "embedding", "vec_id", "embedding", k = 3, cb,
          nProbe = nProbe, rot = rot))
        s"nProbe=$nProbe: $h/$nTrue"
      }.mkString("  ")
      println(f"$name%-32s $line")
    }
    spark.stop()
  }
}
