package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off (round-12 advice #7): the unexplored OPQ axis — the
  * TRAINING SAMPLE SIZE. Note the q65 golden itself cannot move on
  * this axis: at sf0.01 the corpus is ~2k vectors, so `sampleN = 4096`
  * already takes the ENTIRE corpus and any larger cap is a no-op. The
  * axis only exists where the corpus outgrows the cap, so this probe
  * runs at sf1 (32k vectors) with q65's exact geometry (residual OPQ,
  * m=8, ksub=16 → 32 bits, opq 8/8, train 2) and varies only sampleN.
  * Usage: runMain graft.tools.OpqSampleProbe [dataDir] */
object OpqSampleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = graft.Graft.register(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    println(s"corpus=${emb.count()}")
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
    for (sampleN <- Seq(2048, 4096, 8192, 16384)) {
      val rot = Some(graft.operators.Pq.opqRotationResidual(
        idx, "vec_id", "embedding", dim = 64, m = 8, ksub = 16,
        sampleN = sampleN, opqIters = 8, kmeansIters = 8))
      val cb = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 8, ksub = 16, iters = 2, rot = rot)
      val line = Seq(4, 8).map { nProbe =>
        val h = hits(graft.operators.Pq.ivfPqTopKResidual(idx, queries,
          "vec_id", "embedding", "vec_id", "embedding", k = 3, cb,
          nProbe = nProbe, rot = rot))
        s"nProbe=$nProbe: $h/$nTrue"
      }.mkString("  ")
      println(f"sampleN=$sampleN%-6d $line")
    }
    spark.stop()
  }
}
