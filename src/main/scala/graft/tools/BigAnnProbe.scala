package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Endpoint-scale ANN recall ladder: the sf100 tier's 3.2M × 64d
  * corpus ([[BigAnn.ensureCorpus]] — the identical construction the
  * bench tier reads), flat-PQ IVFADC vs residual IVFADC at
  * m=16/ksub=128, k=10, 20 queries, scored against the brute-force
  * ground truth (plus the sibling-group fraction of that ground truth
  * as a construction sanity check). Results are recorded in
  * BENCH_CONTEXT.md — the bench rows time the fast paths, this probe
  * certifies what they give up and picks the operating point.
  *
  * Usage: runMain graft.tools.BigAnnProbe [sf100Dir] */
object BigAnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF100_DIR", "/root/repo/testdata-sf100"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.rdd.compress", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Graft.register(spark)

    val emb = BigAnn.ensureCorpus(spark, dir)
    val queries = emb.filter(col("vec_id") < 20).cache()

    var t0 = System.nanoTime()
    val truth = graft.operators.Similarity.bruteForceTopK(
        queries, emb, "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .select(col("qId"), col("cId")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[bigann] brute force 20x3.2M (ground truth): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val sib = truth.count { case (q, c) => q % BigAnn.FineGroups == c % BigAnn.FineGroups }
    println(f"[bigann] ground-truth sibling fraction: $sib/${truth.size} (construction check)")

    def recall(name: String, got: Set[(Long, Long)]): Unit = {
      val hits = truth.intersect(got).size
      println(f"[bigann] $name recall@10: $hits/${truth.size} = ${hits.toDouble / truth.size}%.3f")
    }

    for (nCentroids <- Seq(64, 256)) {
      t0 = System.nanoTime()
      val idx = graft.operators.Similarity.ivfBuild(emb, "vec_id", "embedding",
        nCentroids = nCentroids, kmeansIters = 2)
      val nProbe = nCentroids / 8 // fixed 1/8-corpus probe budget
      println(f"[bigann] -- nCentroids=$nCentroids nProbe=$nProbe: IVF build ${(System.nanoTime() - t0) / 1e9}%.1f s")

      // flat-PQ IVFADC (codes over x itself)
      t0 = System.nanoTime()
      val cbFlat = graft.operators.Pq.train(emb, "vec_id", "embedding",
        dim = 64, m = 16, ksub = 128, iters = 2)
      val flatCodes = graft.operators.Pq.ivfPqEncode(idx, "vec_id", "embedding", cbFlat).cache()
      flatCodes.count()
      println(f"[bigann]    flat train+encode: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
      val gotFlat = graft.operators.Pq.ivfPqTopKEncoded(
          idx, flatCodes, queries, "vec_id", "embedding", k = 10, cbFlat, nProbe = nProbe)
        .select(col("qId"), col("cId")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[bigann]    flat search: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      recall(s"flat  nC=$nCentroids", gotFlat)
      flatCodes.unpersist()

      // residual IVFADC (codes over x − μ_cell — Jégou's full method)
      t0 = System.nanoTime()
      val cbRes = graft.operators.Pq.trainResidual(idx, "vec_id", "embedding",
        dim = 64, m = 16, ksub = 128, iters = 2)
      val resCodes = graft.operators.Pq.ivfPqEncodeResidual(idx, "vec_id", "embedding", cbRes).cache()
      resCodes.count()
      println(f"[bigann]    residual train+encode: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
      val gotRes = graft.operators.Pq.ivfPqTopKResidualEncoded(
          idx, resCodes, queries, "vec_id", "embedding", k = 10, cbRes, nProbe = nProbe)
        .select(col("qId"), col("cId")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[bigann]    residual search: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      recall(s"resid nC=$nCentroids", gotRes)
      resCodes.unpersist()
    }
    spark.stop()
  }
}
