package graft

import graft.operators.{Pq, Similarity}
import graft.streaming.StreamingSemanticDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming semantic dedup ([[StreamingSemanticDedup]]): stream ≡ the
  * batch greedy first-seen-wins reference on the same (tsMs, id) order,
  * and kept-row state actually expires past the horizon (the
  * bounded-state contract of an always-on ingest). */
class StreamingSemanticDedupSpec extends AnyFunSuite {
  lazy val spark = { val s = SparkTestSession.spark; Graft.register(s); s }
  import spark.implicits._

  // clustered corpus: 4 planted clusters of near-identical vectors →
  // within-cluster SDC cosine ≈ 1, across ≈ 0
  private val dim = 16
  private def mkDocs(n: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rng = new scala.util.Random(seed)
    val centers = Array.fill(4)(Array.fill(dim)(rng.nextGaussian() * 8))
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.05f).toFloat))
    }
  }

  private def artifacts(docs: Seq[(Long, Array[Float])]) = {
    val df = docs.toDF("id", "v")
    val idx = Similarity.ivfBuild(df, "id", "v", nCentroids = 4, kmeansIters = 1)
    val cb = Pq.train(df, "id", "v", dim = dim, m = 4, ksub = 8, iters = 1)
    (idx, cb)
  }

  test("stream survivors == batch greedy first-seen-wins reference") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = mkDocs(60, seed = 5)
    val (idx, cb) = artifacts(base)
    val t0 = 1700000000000L
    val rows = base.map { case (id, v) => (new java.sql.Timestamp(t0 + id * 1000), id, v) }

    val input = MemoryStream[(java.sql.Timestamp, Long, Array[Float])]
    val out = StreamingSemanticDedup.dedup(
      input.toDF().toDF("ts", "id", "v"), "id", "v", "ts",
      idx.centroids, cb, threshold = 0.9, watermark = "10 seconds",
      horizonMs = 3600L * 1000)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sem_dedup").start()
    input.addData(rows: _*)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sem_dedup").select("id").collect().map(_.getLong(0)).toSet

    // batch greedy reference over the identical encoded rows
    val coarseFlat = idx.centroids.sortBy(_._1).flatMap(_._2)
    val encoded = base.toDF("id", "v").select($"id",
        element_at(call_function("pq_encode", $"v", typedLit(coarseFlat.toSeq),
          lit(1), lit(idx.centroids.length)), 1).cast("int").as("cent"),
        call_function("pq_encode", $"v", typedLit(cb.flat.toSeq),
          lit(cb.m), lit(cb.ksub)).as("codes"))
      .withColumn("n2", call_function("pq_adc_dot", typedLit(cb.normLut.toSeq), $"codes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Byte](2).toArray, r.getDouble(3)))
    val table = cb.sdcTable
    def cos(a: Array[Byte], na2: Double, b: Array[Byte], nb2: Double): Double = {
      var s = 0.0
      for (j <- a.indices) s += table((j * cb.ksub + a(j)) * cb.ksub + b(j))
      val d = math.sqrt(na2) * math.sqrt(nb2)
      if (d.isNaN || d == 0.0) Double.NegativeInfinity else s / d
    }
    val survivors = scala.collection.mutable.Map[Int, List[(Array[Byte], Double)]]()
    val keptIds = scala.collection.mutable.Set[Long]()
    for ((id, cent, codes, n2) <- encoded.sortBy(_._1)) { // ts order == id order here
      val kept = survivors.getOrElse(cent, Nil)
      if (!kept.exists { case (c, cn2) => cos(codes, n2, c, cn2) >= 0.9 }) {
        survivors(cent) = (codes, n2) :: kept
        keptIds += id
      }
    }
    assert(streamed == keptIds.toSet,
      s"stream=${streamed.toSeq.sorted} batch=${keptIds.toSeq.sorted}")
    // sanity: dedup actually collapsed the planted clusters
    assert(streamed.size < base.size / 3, s"expected heavy dedup, kept ${streamed.size}")
    assert(streamed.size >= 4, "at least one survivor per cluster")
  }

  test("kept-row state expires: a near-dup past the horizon survives") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = mkDocs(8, seed = 9)
    val (idx, cb) = artifacts(base)
    val t0 = 1700000000000L

    val input = MemoryStream[(java.sql.Timestamp, Long, Array[Float])]
    val out = StreamingSemanticDedup.dedup(
      input.toDF().toDF("ts", "id", "v"), "id", "v", "ts",
      idx.centroids, cb, threshold = 0.9, watermark = "1 second",
      horizonMs = 60L * 1000) // 1-minute suppression window
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sem_dedup_exp").start()
    // batch 1: first copy of cluster-0 doc (id 0) at t0
    input.addData((new java.sql.Timestamp(t0), 0L, base(0)._2))
    q.processAllAvailable()
    // batch 2: near-dup (id 100) 10s later -> suppressed; plus a far
    // future row (id 999, different cluster) that advances the
    // watermark well past t0 + horizon
    input.addData(
      (new java.sql.Timestamp(t0 + 10000), 100L, base(0)._2.map(x => x + 0.001f)),
      (new java.sql.Timestamp(t0 + 10 * 60 * 1000), 999L, base(1)._2))
    q.processAllAvailable()
    // batch 3: another near-dup of doc 0 (id 200) AFTER the horizon
    // (and ABOVE the watermark, which batch 2's far-future row moved to
    // t0+10min-1s — a below-watermark row would be dropped as late
    // data, testing nothing): doc 0's suppression window has expired,
    // so it SURVIVES
    input.addData((new java.sql.Timestamp(t0 + 11 * 60 * 1000), 200L, base(0)._2.map(x => x + 0.002f)))
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sem_dedup_exp").select("id").collect().map(_.getLong(0)).toSet
    assert(got.contains(0L) && got.contains(999L))
    assert(!got.contains(100L), "within-horizon near-dup must be suppressed")
    assert(got.contains(200L), "past-horizon near-dup must survive (state expired)")
  }

  test("past-horizon near-dup survives even while the watermark lags") {
    // The dup predicate must compare the ARRIVING row's event time against
    // the kept row's, not rely on watermark eviction: after a quiet period
    // the watermark can sit arbitrarily far behind event time, so the kept
    // row is still in state when a past-horizon near-dup arrives.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = mkDocs(8, seed = 11)
    val (idx, cb) = artifacts(base)
    val t0 = 1700000000000L

    val input = MemoryStream[(java.sql.Timestamp, Long, Array[Float])]
    val out = StreamingSemanticDedup.dedup(
      input.toDF().toDF("ts", "id", "v"), "id", "v", "ts",
      idx.centroids, cb, threshold = 0.9, watermark = "1 second",
      horizonMs = 60L * 1000)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("sem_dedup_lag").start()
    // batch 1: first copy at t0 -> kept; watermark advances to ~t0-1s
    input.addData((new java.sql.Timestamp(t0), 0L, base(0)._2))
    q.processAllAvailable()
    // batch 2: near-dup 2 minutes later — past the 1-minute horizon, but
    // the watermark (still ~t0-1s) has NOT evicted the kept row. Without
    // the per-row age check this row would be wrongly suppressed.
    input.addData((new java.sql.Timestamp(t0 + 2 * 60 * 1000), 300L, base(0)._2.map(x => x + 0.001f)))
    q.processAllAvailable()
    // batch 3: a within-horizon near-dup of id 300 is still suppressed
    input.addData((new java.sql.Timestamp(t0 + 2 * 60 * 1000 + 5000), 301L, base(0)._2.map(x => x + 0.002f)))
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sem_dedup_lag").select("id").collect().map(_.getLong(0)).toSet
    assert(got.contains(0L))
    assert(got.contains(300L), "past-horizon near-dup must survive despite lagging watermark")
    assert(!got.contains(301L), "within-horizon near-dup of the new kept row must be suppressed")
  }
}
