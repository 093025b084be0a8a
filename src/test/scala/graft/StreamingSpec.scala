package graft

import graft.streaming.StreamingCofactor
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming cofactor aggregation driven by the events parquet as a
  * file stream (memory sink, synchronous processAllAvailable). */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // file streams need a directory; stage the events parquet into /tmp
  val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }
  // ts is a proper timestamp[us] column — read it natively
  val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def prep(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("etype", abs(hash(col("event_type"))) % 5)

  test("windowed streaming cofactor == batch cofactor per window") {
    val stream = prep(spark.readStream.schema(schema).parquet(eventsPath))
    val agg = StreamingCofactor.windowed(stream, "ts", "1 day", "1 minute",
      num = Seq("value"), cat = Seq("etype"))
      .select(col("window.start").as("ws"), col("triple"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win_triples").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_triples").collect()
        .map(r => r.getTimestamp(0) -> Graft.tripleFromRow(r.getStruct(1))).toMap
      assert(got.nonEmpty)
      // batch oracle: same aggregation over the static read
      val batch = prep(spark.read.schema(schema).parquet(eventsPath))
        .groupBy(window(col("ts"), "1 day"))
        .agg(Graft.sumTriple(col("value").cast("double"), col("etype").cast("int")).as("t"))
        .select(col("window.start").as("ws"), col("t"))
        .collect().map(r => r.getTimestamp(0) -> Graft.tripleFromRow(r.getStruct(1))).toMap
      assert(got.keySet == batch.keySet)
      got.foreach { case (k, t) => assert(t.approxEquals(batch(k), 1e-9), s"window $k") }
    } finally q.stop()
  }

  test("incremental foreachBatch triple equals batch cofactor; supports continuous retraining") {
    val inc = new StreamingCofactor.Incremental(Seq("value"), Seq("etype"))
    val stream = prep(spark.readStream.schema(schema).parquet(eventsPath))
    val q = stream.writeStream.foreachBatch(inc.sink _).start()
    try q.processAllAvailable() finally q.stop()
    val batch = Graft.cofactor(
      prep(spark.read.schema(schema).parquet(eventsPath)), Seq("value"), Seq("etype"))
    assert(inc.current.approxEquals(batch, 1e-9))
    assert(inc.current.n == spark.read.schema(schema).parquet(eventsPath).count())
  }

  test("PQ encode is streaming-safe: stream-encoded codes == batch codes") {
    // the ingest shape: embeddings arrive as a stream and are encoded
    // statelessly with a pre-trained codebook — the codes sink is what
    // a 100 TB pipeline persists, so stream and batch encodes must be
    // bit-identical
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Graft.register(spark)
    val data = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(t => ((i * 3 + t) % 7).toFloat - 2.5f)))
    val cb = graft.operators.Pq.train(data.toDF("id", "v"), "id", "v",
      dim = 8, m = 2, ksub = 4, iters = 1)
    val input = MemoryStream[(Long, Array[Float])]
    val codes = graft.operators.Pq.encodeCorpus(
      input.toDF.toDF("id", "v"), "id", "v", cb)
    val q = codes.writeStream.format("memory").queryName("pq_stream").start()
    input.addData(data: _*)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("pq_stream").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val batch = graft.operators.Pq.encodeCorpus(data.toDF("id", "v"), "id", "v", cb)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(streamed.size == 40 && streamed == batch)
  }

  test("chunk_text is streaming-safe: stream-chunked windows == batch windows") {
    // the ingest shape for context-window prep: documents arrive as a
    // stream and are chunked statelessly — stream and batch outputs
    // must be identical row sets (chunk text AND index)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, posexplode}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Graft.register(spark)
    val docs = (0 until 30).map(i =>
      (i.toLong, ((1 to (i * 7) % 40 + 1).map(t => s"w$t").mkString(" "))))
    def chunked(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"),
        posexplode(graft.functions.TextFunctions.chunkText(col("text"), 8, 2)))
    val input = MemoryStream[(Long, String)]
    val q = chunked(input.toDF.toDF("id", "text"))
      .writeStream.format("memory").queryName("chunk_stream").start()
    input.addData(docs: _*)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("chunk_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batch = chunked(docs.toDF("id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("blocklist_stats is streaming-safe: stream counts == batch counts") {
    // the filter-list gate runs statelessly inside the ingest stream —
    // stream and batch (n_matched, n_tokens) must be identical
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Graft.register(spark)
    val terms = Seq("w3", "w17", "bad")
    val docs = (0 until 25).map(i =>
      (i.toLong, (1 to (i * 5) % 30 + 1).map(t => s"w$t").mkString(" ") +
        (if (i % 4 == 0) " bad" else "")))
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"),
        graft.functions.TextFunctions.blocklistStats(col("text"), terms).as("b"))
        .select(col("id"), col("b.n_matched"), col("b.n_tokens"))
    val input = MemoryStream[(Long, String)]
    val q = stats(input.toDF.toDF("id", "text"))
      .writeStream.format("memory").queryName("blocklist_stream").start()
    input.addData(docs: _*)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("blocklist_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val batch = stats(docs.toDF("id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.exists(_._2 > 0), "some docs must actually match")
  }

  test("streaming curation: quality gate + language tag + watermark-bounded dedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val goodText = "the quick brown fox jumps over the lazy dog and it is that good " * 8
    val input = MemoryStream[(java.sql.Timestamp, Long, String)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")
    val curated = graft.streaming.StreamingCuration.curate(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes", "text",
      minQuality = 0.1)
    val q = curated.writeStream.outputMode("append")
      .format("memory").queryName("curated").start()
    try {
      input.addData(
        (ts(0), 1L, goodText),
        (ts(1), 2L, goodText),             // exact duplicate content → dropped
        (ts(2), 3L, "zzz"),                // too short → quality gate drops it
        (ts(3), 4L, goodText + " unique tail extension of words"))
      q.processAllAvailable()
      // advance event time past the watermark so appends flush
      input.addData((ts(40), 5L, "der die das und ist nicht ein eine mit text " * 10))
      q.processAllAvailable()
      val rows = spark.table("curated")
        .select($"doc_id", $"lang", $"quality").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      val ids = rows.map(_._1).toSet
      assert(ids.contains(1L) && !ids.contains(2L), s"dup not dropped: $ids")
      assert(!ids.contains(3L), s"low-quality not dropped: $ids")
      assert(ids.contains(4L))
      assert(rows.find(_._1 == 1L).get._2 == "en")
      rows.find(_._1 == 5L).foreach(r => assert(r._2 == "de"))
      assert(rows.forall(_._3 >= 0.1))
    } finally q.stop()
  }

  test("streaming sessionize (flatMapGroupsWithState) == batch sessionize on closed sessions") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    def ts(sec: Int) = new java.sql.Timestamp(1760000000000L + sec * 1000L)
    val closed = graft.streaming.StreamingSessionize.sessionize(
      input.toDF().toDF("ts", "user"), "user", "ts", gapMs = 30000L, watermark = "10 seconds")
    val q = closed.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      // user 1: events at 0,10,20 then 100 (gap 80s > 30s) → 2 sessions
      // user 2: single event at 7
      input.addData((ts(0), 1L), (ts(10), 1L), (ts(20), 1L), (ts(100), 1L), (ts(7), 2L))
      q.processAllAvailable()
      // fencepost far in the future: watermark passes every lastTs+gap,
      // timing out and emitting ALL earlier sessions
      input.addData((ts(100000), 999L))
      q.processAllAvailable()
      val got = spark.table("sessions")
        .filter($"key" =!= 999L)
        .select($"key", $"startUs", $"endUs", $"events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val base = 1760000000000000L // µs — the session state's domain
      assert(got == Set(
        (1L, base, base + 20000000L, 3L),          // events 0,10,20
        (1L, base + 100000000L, base + 100000000L, 1L), // the 100s singleton
        (2L, base + 7000000L, base + 7000000L, 1L)),
        s"got $got")
      // batch parity: same session count per key via the batch operator
      val batchDf = Seq((1L, 0L, 1L), (1L, 10L, 2L), (1L, 20L, 3L), (1L, 100L, 4L), (2L, 7L, 5L))
        .toDF("user", "t", "eid")
      val batch = graft.operators.Sessionize.summary(
          batchDf, $"user", $"t", $"eid", maxGap = 30L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val streamCounts = got.groupBy(_._1).map { case (k, ss) => k -> ss.size.toLong }
      assert(streamCounts == batch, s"stream $streamCounts vs batch $batch")
    } finally q.stop()
  }

  test("streaming asof join == batch asof join; right arriving AFTER its left still wins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1760000000000L + sec * 1000L)
    val lefts = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val rights = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = graft.streaming.StreamingAsofJoin.asof(
      lefts.toDF().toDF("ts", "k", "lid"), "k", "ts", "lid",
      rights.toDF().toDF("ts", "k", "rid"), "k", "ts", "rid",
      watermark = "20 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_stream").start()
    try {
      // left at 30 arrives BEFORE the right at 25 that must win it —
      // event-time, not arrival-order, decides; right ties at 10 break
      // toward the larger rid (batch rightOrder = id)
      lefts.addData((ts(30), 1L, 100L), (ts(12), 1L, 101L), (ts(5), 2L, 102L))
      rights.addData((ts(10), 1L, 200L), (ts(10), 1L, 201L))
      q.processAllAvailable()
      rights.addData((ts(25), 1L, 202L)) // late-arriving but ts 25 < 30
      q.processAllAvailable()
      // fencepost: watermark sails past every pending left
      lefts.addData((ts(100000), 999L, 999L))
      rights.addData((ts(100000), 999L, 998L))
      q.processAllAvailable()
      val got = spark.table("asof_stream").filter($"key" =!= 999L)
        .select($"leftId", coalesce($"rightId", lit(-1L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(100L -> 202L, 101L -> 201L, 102L -> -1L), s"got $got")
      // batch parity on the identical tuples (rightOrder = rid)
      val bl = Seq((1L, 30L, 100L), (1L, 12L, 101L), (2L, 5L, 102L)).toDF("k", "t", "lid")
      val br = Seq((1L, 10L, 200L), (1L, 10L, 201L), (1L, 25L, 202L)).toDF("k", "t", "rid")
      val batch = graft.operators.AsofJoin.asofBackward(
          bl, br, bl("k"), br("k"), bl("t"), br("t"), rightOrder = br("rid"))
        .select($"lid", coalesce($"asof.rid", lit(-1L))).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == batch, s"stream $got vs batch $batch")
    } finally q.stop()
  }

  test("streaming asof join: compacted right state (max survivor) still wins for later lefts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1760000000000L + sec * 1000L)
    val lefts = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val rights = MemoryStream[(java.sql.Timestamp, Long, Long)]
    val out = graft.streaming.StreamingAsofJoin.asof(
      lefts.toDF().toDF("ts", "k", "lid"), "k", "ts", "lid",
      rights.toDF().toDF("ts", "k", "rid"), "k", "ts", "rid",
      watermark = "100 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_compact").start()
    try {
      // burst of key-1 rights, then the watermark advances past them
      rights.addData((ts(1), 1L, 300L), (ts(2), 1L, 301L), (ts(3), 1L, 302L))
      q.processAllAvailable()
      // BOTH sources must advance (global watermark = min of the two
      // watermark operators) for the burst to become "old"
      rights.addData((ts(500), 2L, 888L))
      lefts.addData((ts(500), 3L, 777L))
      q.processAllAvailable() // watermark → 400 s
      // this batch INVOKES key 1 (right at 450 + left at 420), so the
      // burst compacts NOW — before the left's flush. The left at 420
      // must then match the compacted survivor (3 s, rid 302): if
      // compaction dropped the burst the match would be None; if it kept
      // the wrong row (min) it would be 300; the in-flight 450 is later
      // than the left and must not win
      rights.addData((ts(450), 1L, 310L))
      lefts.addData((ts(420), 1L, 700L))
      q.processAllAvailable()
      // fencepost BOTH sources: the global watermark is the min across
      // the two withWatermark operators
      lefts.addData((ts(100000), 999L, 999L))
      rights.addData((ts(100000), 999L, 998L))
      q.processAllAvailable()
      val got = spark.table("asof_compact").filter($"key" === 1L)
        .select($"leftId", $"rightId", $"rightTsUs").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq((700L, 302L, 1760000003000000L)),
        s"compacted latest right must win: ${got.toSeq}")
      // measured state bound, not just narrative: after everything
      // flushed, the store holds at most one compacted right per key
      // (4 keys seen) — the 3-row burst must NOT survive as 3 rows
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4, s"state must be <=1 row/key after compaction, got $stateRows")
    } finally q.stop()
  }

  test("streaming asof join: rows whose key CASTS to NULL are dropped, not query-fatal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int) = new java.sql.Timestamp(1760000000000L + sec * 1000L)
    // string keys: "u-12" casts to NULL long — must be filtered, not
    // reach the non-nullable encoder and kill the always-on query
    val lefts = MemoryStream[(java.sql.Timestamp, String, Long)]
    val rights = MemoryStream[(java.sql.Timestamp, String, Long)]
    val out = graft.streaming.StreamingAsofJoin.asof(
      lefts.toDF().toDF("ts", "k", "lid"), "k", "ts", "lid",
      rights.toDF().toDF("ts", "k", "rid"), "k", "ts", "rid",
      watermark = "10 seconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("asof_badkey").start()
    try {
      lefts.addData((ts(5), "1", 100L), (ts(6), "u-12", 101L))
      rights.addData((ts(1), "1", 200L), (ts(2), "not-a-key", 201L))
      lefts.addData((ts(100000), "999", 999L))
      rights.addData((ts(100000), "999", 998L))
      q.processAllAvailable() // would throw on encoder NULL before the fix
      val got = spark.table("asof_badkey").filter($"key" === 1L)
        .select($"leftId", $"rightId").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSeq
      assert(got == Seq(100L -> 200L), s"got $got")
    } finally q.stop()
  }

  test("streaming sessionize: out-of-order events extend backward; deep-late become singletons") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    def ts(sec: Int) = new java.sql.Timestamp(1760000000000L + sec * 1000L)
    val closed = graft.streaming.StreamingSessionize.sessionize(
      input.toDF().toDF("ts", "user"),
      "user", "ts", gapMs = 30000L, watermark = "10 minutes") // long delay: late rows admitted
    val q = closed.writeStream.outputMode("append")
      .format("memory").queryName("sessions_ooo").start()
    try {
      input.addData((ts(100), 1L))
      q.processAllAvailable()
      // within-gap BEFORE the open start → merges, start lowered to 80
      // more than a gap before (ts 10) → closed singleton immediately
      input.addData((ts(80), 1L), (ts(10), 1L))
      q.processAllAvailable()
      input.addData((ts(100000), 999L)) // fencepost closes the rest
      q.processAllAvailable()
      val got = spark.table("sessions_ooo").filter($"key" === 1L)
        .select($"startUs", $"endUs", $"events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val base = 1760000000000000L // µs
      assert(got == Set(
        (base + 10000000L, base + 10000000L, 1L),   // deep-late singleton
        (base + 80000000L, base + 100000000L, 2L)), // backward-extended session
        s"got $got")
    } finally q.stop()
  }

  test("BPE encode is streaming-safe: the model trains offline, the stream tokenizes") {
    // the tokenize-on-ingest shape: train once on a reference corpus,
    // broadcast, then every micro-batch encodes statelessly — stream
    // token sequences and ids == batch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{array_join, col, transform => arrTransform}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reference = Seq("low lower lowest", "new newer newest", "low new low")
      .toDF("text")
    val model = graft.operators.Bpe.train(reference, "text", 12)
    def staged(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Bpe.encodeIds(
          graft.operators.Bpe.encode(df, "text", model), "text", model)
        .select(col("id"), array_join(col("tokens"), "|").as("toks"),
          array_join(arrTransform(col("token_ids"), _.cast("string")), ",").as("ids"))
    val docs = (0 until 30).map(i =>
      (i.toLong, Seq("low", "newer", s"unseen$i", "lowest").take(i % 4 + 1).mkString(" ")))
    val input = MemoryStream[(Long, String)]
    val q = staged(input.toDF.toDF("id", "text"))
      .writeStream.format("memory").queryName("bpe_stream").start()
    input.addData(docs: _*)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bpe_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batch = staged(docs.toDF("id", "text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == batch && streamed.size == 30)
  }

  test("curation quartet stateless stages are streaming-safe: gopher + LM score + mixture") {
    // the realistic ingest shape: the LM trains OFFLINE on a reference
    // corpus (broadcast), then gopher gate + LM score + mixture epochs
    // all run statelessly inside the stream — stream == batch row sets
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, floor}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    Graft.register(spark)
    val reference = Seq("the cat sat on the mat", "the dog sat on the rug",
      "a cat and a dog").toDF("text")
    val lm = graft.operators.LmQuality.train(reference, "text")
    val docs = (0 until 40).map(i =>
      (i.toLong, (1 to i % 7 + 2).map(t => s"w${(t * i) % 9}").mkString(" ") +
        " the cat sat", if (i % 2 == 0) "web" else "wiki"))
    def staged(df: org.apache.spark.sql.DataFrame) = {
      val g = graft.operators.CorpusMix.compose(df, "source", "id",
        Map("web" -> 1.5, "wiki" -> 0.5))
      g.select(col("id"), col("epoch"),
        floor(graft.operators.LmQuality.score(lm, col("text")) * 1e6).as("s"),
        graft.functions.TextFunctions.gopherKeepFromStats(
          graft.functions.TextFunctions.gopherStats(col("text")),
          minWords = 3, minMeanLen = 1.0, minAlphaRatio = 0.5, minStopHits = 1).as("keep"))
    }
    val input = MemoryStream[(Long, String, String)]
    val q = staged(input.toDF.toDF("id", "text", "source"))
      .writeStream.format("memory").queryName("curation_quartet_stream").start()
    input.addData(docs: _*)
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("curation_quartet_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet
    val batch = staged(docs.toDF("id", "text", "source")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.exists(_._2 == 1), "full epochs must appear in the stream")
    lm.release()
  }
}
