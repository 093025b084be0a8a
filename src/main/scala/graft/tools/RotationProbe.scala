package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall ladder for the 32-bit residual-PQ geometry (m=8, ksub=16 over
  * the 16-cell IVF): identity vs seeded random rotation (q63's pin) vs
  * the data-dependent PCA/eigenvalue-allocation rotation
  * ([[graft.operators.Pq.pcaRotationResidual]], Ge et al. CVPR 2013 §5)
  * — all on the q57/q58/q63 build discipline (seeded, xxhash64-ordered
  * samples, bit-deterministic), so every printed hit count is a
  * candidate pinned golden.
  *
  * Usage: runMain graft.tools.RotationProbe [dataDir]
  * (default /root/testdata/sf0.01 — the oracle tier). */
object RotationProbe {
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
    val variants: Seq[(String, Option[graft.operators.Pq.Rotation])] = Seq(
      "identity" -> None,
      "random(seed=44)" -> Some(graft.operators.Pq.rotation(64, seed = 44L)),
      "pca" -> Some(graft.operators.Pq.pcaRotationResidual(
        idx, "vec_id", "embedding", dim = 64, m = 8)),
      "opq" -> Some(graft.operators.Pq.opqRotationResidual(
        idx, "vec_id", "embedding", dim = 64, m = 8, ksub = 16)))
    for ((name, rot) <- variants) {
      val cb = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = 2, rot = rot)
      for (nProbe <- Seq(4, 8)) {
        val h = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
          "vec_id", "embedding", "vec_id", "embedding", k = 3, cb,
          nProbe = nProbe, rot = rot))
        println(f"$name%-16s nProbe=$nProbe: $h/$nTrue hits (recall ${h.toDouble / nTrue}%.4f)")
      }
    }
    spark.stop()
  }
}
