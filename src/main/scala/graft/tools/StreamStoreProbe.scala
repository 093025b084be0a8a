package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: HDFS-backed vs RocksDB state store under the
  * sf1_streaming_semdedup bench shape (8 micro-batches, 8 state
  * partitions, per-cell SDC suppression state). Usage:
  * `runMain graft.tools.StreamStoreProbe [hdfs|rocksdb] [sfDir]`.
  * Findings land in BENCH_CONTEXT.md. */
object StreamStoreProbe {
  def main(args: Array[String]): Unit = {
    val provider = args.headOption.getOrElse("hdfs")
    val dir = args.drop(1).headOption.getOrElse("/root/repo/testdata-sf1")
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Graft.register(spark)

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cb = graft.operators.Pq.train(emb, "vec_id", "embedding",
      dim = 64, m = 16, ksub = 128, iters = 2)
    val idx = graft.operators.Similarity.ivfBuild(emb, "vec_id", "embedding",
      nCentroids = 64, kmeansIters = 2)
    val embSrc = emb.select(col("vec_id"), col("embedding"),
      timestamp_seconds(lit(1700000000L) + col("vec_id")).as("ts"))
    val in = java.nio.file.Files.createTempDirectory("ssp_in").toFile
    embSrc.repartition(8).write.mode("overwrite").parquet(in.getAbsolutePath)

    for (pass <- 1 to 3) {
      val chk = java.nio.file.Files.createTempDirectory("ssp_chk").toFile
      var kept = 0L
      val t0 = System.nanoTime()
      val q = graft.streaming.StreamingSemanticDedup.dedup(
        spark.readStream.schema(embSrc.schema)
          .option("maxFilesPerTrigger", 1).parquet(in.getAbsolutePath),
        "vec_id", "embedding", "ts", idx.centroids, cb, threshold = 0.9,
        watermark = "1 minute", horizonMs = 1000L * 3600 * 24)
        .toDF()
        .writeStream
        .foreachBatch((bd: org.apache.spark.sql.DataFrame, _: Long) => { kept += bd.count(); () })
        .option("checkpointLocation", chk.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
      println(f"$provider pass $pass: ${(System.nanoTime() - t0) / 1e9}%.3f s (kept $kept)")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      rm(chk)
    }
    spark.stop()
  }
}
