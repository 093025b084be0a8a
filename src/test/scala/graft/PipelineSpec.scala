package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline operators: text analysis, dedup (exact /
  * MinHash-LSH / SimHash), ANN similarity search, multimodal plumbing. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"), // near-dup of 0
    (2L, "der schnelle braune fuchs springt und ist nicht ein hund mit der katze"),
    (3L, "completely different content about spark query engines and columnar scans"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (5L, "le chat est dans la maison et le chien est dans le jardin pour la nuit")
  ).toDF("doc_id", "text")

  test("text functions: tokens, counts, quality, fingerprints") {
    val r = docs.select(
      $"doc_id",
      TextFunctions.tokenCount($"text").as("tc"),
      TextFunctions.distinctTokenRatio($"text").as("dr"),
      TextFunctions.qualityScore($"text").as("q"),
      TextFunctions.fingerprint($"text").as("fp"),
      TextFunctions.bagFingerprint($"text").as("bfp")
    ).collect().map(r => r.getLong(0) -> r).toMap
    assert(r(0).getInt(1) == 14)
    assert(r(0).getDouble(2) < 1.0) // "the" repeats
    assert(r(0).getDouble(3) > 0.0 && r(0).getDouble(3) <= 1.0)
    assert(r(0).getLong(4) == r(4).getLong(4)) // exact dups share fingerprint
    assert(r(0).getLong(4) != r(1).getLong(4))
    // empty / degenerate input
    val e = Seq((9L, ""), (10L, "   ")).toDF("doc_id", "text")
      .select(TextFunctions.tokenCount($"text"), TextFunctions.qualityScore($"text")).collect()
    assert(e.forall(r => r.getInt(0) == 0 && r.getDouble(1) == 0.0))
  }

  test("language id picks the language with most stopword hits") {
    val r = docs.select($"doc_id", TextFunctions.langId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r(0) == "en" && r(2) == "de" && r(5) == "fr")
    assert(Seq((99L, "zzz qqq xxx")).toDF("doc_id", "text")
      .select(TextFunctions.langId($"text")).head.getString(0) == "und")
  }

  test("exact dedup keeps smallest id per content hash") {
    val out = Dedup.exactText(docs, $"text", $"doc_id")
    val kept = out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(0L, 1L, 2L, 3L, 5L)) // 4 dropped (dup of 0)
  }

  test("exact dedup: all-NULL tiebreaker group keeps a real row; NULLs lose to non-NULLs") {
    val df = Seq((1, Some(10L), "a"), (1, None, "b"), (2, None, "c"), (2, None, "d"))
      .toDF("k", "tb", "v")
    val out = Dedup.exact(df, Seq($"k"), $"tb")
      .collect().map(r => r.getInt(0) -> (Option(r.get(1)), r.getString(2))).toMap
    assert(out(1)._1.contains(10L) && out(1)._2 == "a") // non-NULL tiebreaker wins
    assert(out(2)._1.isEmpty && (out(2)._2 == "c" || out(2)._2 == "d"),
      s"all-NULL group must keep a real row, got ${out(2)}")
  }

  test("minhash LSH finds near-duplicates; dedupNear removes them") {
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 4L)), s"near dup not found: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unique doc never paired
    val kept = Dedup.dedupNear(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(4L))
    assert(kept.contains(3L) && kept.contains(2L) && kept.contains(5L))
  }

  test("multimodal images: real ImageIO decode, features distinguish content, resize round-trips") {
    import graft.operators.Multimodal
    def png(rgb: Int, w: Int = 32, h: Int = 24): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val white = png(0xffffff); val black = png(0x000000)
    val df = Seq((1L, white), (2L, black), (3L, Array[Byte](1, 2, 3))).toDF("id", "img")
    val feats = Multimodal.extractFeatures(df, "img", dim = 16, decoder = Multimodal.ImageDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(feats(1L).forall(f => math.abs(f - 0.5f) < 1e-3), s"white ${feats(1L)}")
    assert(feats(2L).forall(f => math.abs(f + 0.5f) < 1e-3), s"black ${feats(2L)}")
    assert(feats(3L).forall(_ == 0.0f), "undecodable must yield zero vector")
    // metadata + resize
    val (fmt, w0, h0) = Multimodal.ImageDecoder.meta(white)
    assert(fmt == "png" && w0 == 32 && h0 == 24)
    val resized = Multimodal.resizeImages(df, "img", 8, 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    val (_, rw, rh) = Multimodal.ImageDecoder.meta(resized(1L))
    assert(rw == 8 && rh == 8)
    assert(resized(3L) == null)
  }

  test("multimodal images: decompression bomb (huge declared dims) is rejected before decode") {
    import graft.operators.Multimodal
    // a real tiny PNG whose IHDR is patched to DECLARE 60000×60000
    // (3.6 G pixels): ImageIO.read would allocate the full raster and
    // OOM the executor; the header guard must reject it without decoding
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val bomb = bos.toByteArray
    // IHDR payload starts at offset 16: width be32 @16, height be32 @20
    val b = java.nio.ByteBuffer.wrap(bomb)
    b.putInt(16, 60000); b.putInt(20, 60000)
    assert(Multimodal.ImageDecoder.features(bomb, 16).forall(_ == 0.0f),
      "bomb must yield the undecodable zero vector")
    assert(Multimodal.ImageDecoder.resize(bomb, 8, 8) == null,
      "bomb must yield the undecodable null payload")
    // and a normal image still passes the guard (regression check)
    val ok = { val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", o); o.toByteArray }
    assert(Multimodal.ImageDecoder.resize(ok, 8, 8) != null)
  }

  test("sessionize: gap splits sessions, summary counts events per session") {
    // user 1: events at t=0,10,20 then 100 (gap 80 > 30) → 2 sessions
    // user 2: single event → 1 session
    val ev = Seq((1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 20L), (1L, 4L, 100L), (2L, 5L, 7L))
      .toDF("user", "eid", "t")
    val assigned = graft.operators.Sessionize.assign(ev, $"user", $"t", $"eid", maxGap = 30L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(assigned((1L, 1L)) == 1L && assigned((1L, 3L)) == 1L && assigned((1L, 4L)) == 2L)
    assert(assigned((2L, 5L)) == 1L)
    val sums = graft.operators.Sessionize.summary(ev, $"user", $"t", $"eid", maxGap = 30L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sums(1L) == ((2L, 4L, 3L)), s"user1 summary ${sums(1L)}")
    assert(sums(2L) == ((1L, 1L, 1L)))
  }

  test("multimodal audio: real javax.sound WAV decode, RMS envelope, metadata") {
    import graft.operators.Multimodal
    // 16-bit mono PCM WAV: `seconds` of a sine at `hz` scaled by `amp`
    def wav(hz: Double, amp: Double, seconds: Double = 0.5, rate: Float = 8000f): Array[Byte] = {
      val n = (rate * seconds).toInt
      val pcm = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt.toShort
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val loud = wav(440, 0.8); val quiet = wav(440, 0.1); val silent = wav(440, 0.0)
    val df = Seq((1L, loud), (2L, quiet), (3L, silent), (4L, Array[Byte](9, 9, 9)))
      .toDF("id", "audio")
    val feats = Multimodal.extractFeatures(df, "audio", dim = 8, decoder = Multimodal.AudioDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    // RMS of a sine = amp/√2 in every bucket
    assert(feats(1L).forall(f => math.abs(f - 0.8 / math.sqrt(2)) < 0.02), s"loud ${feats(1L)}")
    assert(feats(2L).forall(f => math.abs(f - 0.1 / math.sqrt(2)) < 0.02), s"quiet ${feats(2L)}")
    assert(feats(3L).forall(f => math.abs(f) < 1e-3), s"silent ${feats(3L)}")
    assert(feats(4L).forall(_ == 0.0f), "undecodable must yield zero vector")
    val (fmt, rate, chans, durMs) = Multimodal.AudioDecoder.meta(loud)
    assert(fmt == "wave" && rate == 8000 && chans == 1, s"meta ($fmt,$rate,$chans)")
    assert(math.abs(durMs - 500L) <= 1L, s"duration $durMs")
  }

  test("int8 quantization: round-trip error bounded, cosine preserved, zero vector safe") {
    import graft.operators.Quantize
    Graft.register(spark)
    val rng = new scala.util.Random(3)
    val vecs = Seq.tabulate(50)(i =>
        (i.toLong, Array.fill(16)((rng.nextGaussian() * (i + 1)).toFloat).toSeq)) :+
      (99L, Seq.fill(16)(0.0f)) // zero vector: scale 0, all-zero q
    val df = vecs.toDF("id", "v").withColumn("qz", Quantize.quantizeInt8($"v"))
    val rows = df.select($"id", $"v", $"qz.q", $"qz.scale",
        Quantize.dequantize($"qz").as("dq")).collect()
    rows.foreach { r =>
      val (v, dq, scale) = (r.getSeq[Float](1), r.getSeq[Double](4), r.getDouble(3))
      if (r.getLong(0) == 99L) {
        assert(scale == 0.0 && r.getSeq[Byte](2).forall(_ == 0) && dq.forall(_ == 0.0))
      } else {
        assert(r.getSeq[Byte](2).forall(q => q >= -127 && q <= 127))
        // |x − q/scale| ≤ 0.5/scale (half a quantization step)
        v.zip(dq).foreach { case (x, d) =>
          assert(math.abs(x - d) <= 0.5 / scale + 1e-12, s"err ${math.abs(x - d)}") }
      }
    }
    // cosine on quantized arrays tracks the float cosine closely
    val pair = df.filter($"id" < 2).select($"v", $"qz.q").collect()
    val (v0, q0) = (pair(0).getSeq[Float](0), pair(0).getSeq[Byte](1))
    val (v1, q1) = (pair(1).getSeq[Float](0), pair(1).getSeq[Byte](1))
    def cosD(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map(p => p._1 * p._2).sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    val exact = cosD(v0.map(_.toDouble), v1.map(_.toDouble))
    val quant = cosD(q0.map(_.toDouble), q1.map(_.toDouble))
    assert(math.abs(exact - quant) < 0.02, s"cosine drift $exact vs $quant")
  }

  test("sessionize: colliding input column names are dodged via parameters") {
    // input already has 'session' and 'key' columns
    val ev = Seq((1L, 1L, 0L, "x", 9L), (1L, 2L, 100L, "y", 9L))
      .toDF("user", "eid", "t", "session", "key")
    val assigned = graft.operators.Sessionize.assign(
      ev, $"user", $"t", $"eid", maxGap = 30L, sessionCol = "sess_no")
    assert(assigned.columns.count(_ == "session") == 1) // input column intact
    assert(assigned.select($"session").distinct().collect().map(_.getString(0)).toSet == Set("x", "y"))
    val sums = graft.operators.Sessionize.summary(
        ev, $"user", $"t", $"eid", maxGap = 30L, keyCol = "user_key")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums(1L) == 2L, s"expected 2 sessions, got $sums")
  }

  test("pii redaction: emails, IPv4, phones scrubbed; dotted quads never half-match as phones") {
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.co.uk thanks"),
      (2L, "server 192.168.101.254 and cell +1 (555) 010-0042 ok"),
      (3L, "nothing sensitive here at all"),
      (4L, "ip 10.0.0.7 then digits 12345 end")) // short digit run survives
      .toDF("doc_id", "text")
    val got = rows.select($"doc_id", TextFunctions.redactPii($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "reach me at <EMAIL> thanks", got(1L))
    assert(got(2L) == "server <IP> and cell <PHONE> ok", got(2L))
    assert(got(3L) == "nothing sensitive here at all")
    assert(got(4L) == "ip <IP> then digits 12345 end", got(4L))
  }

  test("repetition score: top-bigram fraction, single-pass native expression") {
    val rows = Seq(
      (1L, "buy now buy now buy now buy now"),   // 7 bigrams: "buy now"x4, "now buy"x3 → 4/7
      (2L, "all tokens here are fully distinct"), // 5 distinct bigrams → 1/5
      (3L, "single"),                             // < n tokens → whole doc, score 1
      (4L, "x x x x x"))                          // all bigrams identical → 1
      .toDF("doc_id", "text")
    val got = rows.select($"doc_id", TextFunctions.repetitionScore($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 4.0 / 7) < 1e-12, got(1L).toString)
    assert(math.abs(got(2L) - 0.2) < 1e-12, got(2L).toString)
    assert(got(3L) == 1.0 && got(4L) == 1.0)
  }

  test("decontaminate: docs sharing n-grams with the benchmark are dropped, others kept") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),        // clean
      (1L, "the capital of france is paris said the exam question"), // contains bench 5-gram
      (2L, "totally unrelated text about spark shuffle partitions"), // clean
      (3L, "prefix words then the capital of france is paris suffix"), // contains bench 5-gram
      (4L, "short doc"),                                             // < n tokens, clean
      (5L, "exam q")                                                 // < n tokens, == bench short doc
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "question one the capital of france is paris answer below"),
      (101L, "exam q")).toDF("doc_id", "text")
    val kept = graft.operators.Decontaminate.clean(corpus, bench, "doc_id", "text", n = 5)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 4L), s"kept $kept")
    // minOverlap above the actual hit count keeps everything
    val lax = graft.operators.Decontaminate.clean(corpus, bench, "doc_id", "text",
      n = 5, minOverlap = 50)
    assert(lax.count() == 6)
    // the benchmark side must be broadcast (the 100 TB plan shape)
    val ids = graft.operators.Decontaminate.contaminatedIds(corpus, bench, "doc_id", "text", 5)
    val plan = ids.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench shingles must broadcast:\n$plan")
  }

  test("pack: boundary straddle goes to the earlier pack; strata pack independently") {
    val d = Seq(
      // stratum a: tokens 4,3,2,5 with budget 6 → cumBefore 0,4,7,9 → packs 0,0,1,1
      ("a", 1L, 4L), ("a", 2L, 3L), ("a", 3L, 2L), ("a", 4L, 5L),
      // stratum b: an over-budget doc owns its pack region: 9,1 → cumBefore 0,9 → packs 0,1
      ("b", 1L, 9L), ("b", 2L, 1L)
    ).toDF("lang", "doc_id", "tc")
    val got = graft.operators.Pack.assign(d, $"lang", $"doc_id", $"tc", budget = 6L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L, ("a", 4L) -> 1L,
      ("b", 1L) -> 0L, ("b", 2L) -> 1L), s"got $got")
    val sums = graft.operators.Pack.summary(d, $"lang", $"doc_id", $"tc", 6L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(sums(("a", 0L)) == (2L, 7L) && sums(("a", 1L)) == (2L, 7L))
    // every pack's pre-straddle stream offset stays under the budget:
    // total - last doc < budget always holds for non-final packs by construction
    assert(sums(("b", 0L)) == (1L, 9L) && sums(("b", 1L)) == (1L, 1L))
  }

  test("minhash_prepare: fused bands + shingle set bit-match the two-expression path") {
    val corpus = docs.unionByName(Seq(
      (10L, "tiny"), // fewer tokens than the shingle size → zero shingles
      (11L, "  "),   // whitespace-only → empty token array
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val rows = corpus.select(
        $"doc_id",
        Dedup.minhashPrepare($"text").as("p"),
        Dedup.minhashBands($"text").as("bands"),
        array_sort(array_distinct(TextFunctions.shingleHashes($"text"))).as("sh"))
      .collect()
    assert(rows.length == 9)
    rows.foreach { r =>
      if (r.isNullAt(1)) { // null text propagates null through both paths
        assert(r.isNullAt(2) && r.isNullAt(3), s"null mismatch: $r")
      } else {
        val p = r.getStruct(1)
        assert(p.getSeq[Long](0) == r.getSeq[Long](2), s"bands differ for id ${r.getLong(0)}")
        assert(p.getSeq[Long](1) == r.getSeq[Long](3), s"shingle set differs for id ${r.getLong(0)}")
      }
    }
  }

  test("lsh degenerate buckets: dropped from pair generation, count observed on the consuming job") {
    // 250 identical docs — every band collides into 16 buckets of 250
    // (> cap 200), all dropped — plus one genuine near-dup pair that
    // must still surface from its own small buckets
    val degenerate = (0 until 250).map(i =>
      (i.toLong, "identical degenerate body text repeated for every single row of this block"))
    val near = Seq(
      (1000L, "a genuinely unique document about spark bucketed joins and shuffle-free scans"),
      (1001L, "a genuinely unique document about spark bucketed joins and shuffle-free"))
    val corpus = (degenerate ++ near).toDF("doc_id", "text")
      .withColumn("__bands", Dedup.minhashBands(col("text")))
    // capture the observed dropped-bucket metric via our own listener
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, org.apache.spark.sql.Row)]()
    val capture = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             d: Long): Unit =
        qe.observedMetrics.foreach { case (n, r) => seen.add((n, r)) }
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(capture)
    try {
      val (pairs, release) = Dedup.lshCandidatePairsReleasable(corpus, col("doc_id"), col("__bands"))
      // the plan must be fully lazy (no eagerly persisted bucket table)
      // with the accounting riding the plan itself as a metrics node
      val plan = pairs.queryExecution.optimizedPlan.toString
      assert(plan.contains("CollectMetrics"), s"dropped count must be an observed metric:\n$plan")
      assert(!plan.contains("InMemoryRelation"), "bucket table must not be eagerly persisted")
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      release()
      assert(got == Set((1000L, 1001L)),
        s"oversized buckets must contribute no pairs, small ones must survive: $got")
      // QueryExecutionListener delivery is async — poll briefly
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      def dropped = {
        import scala.jdk.CollectionConverters._
        seen.asScala.find(_._1.startsWith(Dedup.DroppedMetricPrefix))
      }
      while (dropped.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      val row = dropped.getOrElse(fail("no dropped-bucket metric observed"))._2
      assert(row.getLong(0) == 16L, s"expected 16 dropped band-buckets, got $row")
      assert(row.getInt(1) == 200, s"cap must ride along for the log line: $row")
    } finally spark.listenerManager.unregister(capture)
  }

  test("dedup release handles unpersist the signature/bucket caches") {
    val docs = (0 until 40).map(i => (i.toLong, s"some shared text body number ${i % 5} tail"))
      .toDF("doc_id", "text")
    def persistedIds = spark.sparkContext.getPersistentRDDs.keySet
    val before = persistedIds
    val (pairs, release) = Dedup.nearDuplicatePairsReleasable(docs, "doc_id", "text", 0.8)
    assert(pairs.count() > 0) // materialize through the caches
    assert((persistedIds -- before).nonEmpty,
      "expected the signature pass and bucket table to be persisted")
    release()
    assert((persistedIds -- before).isEmpty,
      "release() must unpersist everything the operator cached")
    // dedupNear releases its caches eagerly on its own; only the (small,
    // ids-only) localCheckpoint'ed drop list may remain
    val before2 = persistedIds
    val kept = Dedup.dedupNear(docs, "doc_id", "text", 0.8)
    assert(kept.count() > 0)
    assert((persistedIds -- before2).size <= 1,
      "dedupNear must not leave the signature/bucket caches behind")
  }

  test("asof join: backward inclusive match, ties, tolerance, no-match NULL") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L), (3L, 50L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 201L), (1L, 10L, 202L), (1L, 20L, 203L), (2L, 9L, 204L))
      .toDF("k", "t", "rid")
    val out = graft.operators.AsofJoin.asofBackward(
        left, right, left("k"), right("k"), left("t"), right("t"),
        rightOrder = right("rid"))
      .select($"lid", $"asof.rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(100L) == 202L, s"equal-ts inclusive, larger rightOrder wins: $out") // t=10 ties: rid 202
    assert(out(101L) == 203L) // latest view at t=20
    assert(out(102L) == -1L)  // right row is at t=9 > 5 → nothing precedes
    assert(out(103L) == -1L)  // key 3 has no right rows at all
    // tolerance: the t=25 left row only matches within 3 ticks of t=20
    val tol = graft.operators.AsofJoin.asofBackward(
        left, right, left("k"), right("k"), left("t"), right("t"),
        rightOrder = right("rid"), tolerance = Some(3L))
      .select($"lid", $"asof.rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(tol(101L) == -1L && tol(100L) == 202L, s"tolerance gating: $tol")
    // SQL join semantics: NULL keys never match each other, and a NULL
    // right timestamp can never satisfy vt <= t (it would otherwise sort
    // "before everything" in the window and match spuriously)
    val lNull = Seq(
        (Option.empty[Long], 10L, 300L),
        (Some(9L), 10L, 301L),
        (Some(9L), 1L, 302L)) // earlier than every valid right row
      .toDF("k", "t", "lid")
    val rNull = Seq(
        (Option.empty[Long], Some(5L), 400L),
        (Some(9L), Some(5L), 401L),
        (Some(9L), Option.empty[Long], 402L)) // NULL ts: must never match
      .toDF("k", "t", "rid")
    val nulls = graft.operators.AsofJoin.asofBackward(
        lNull, rNull, lNull("k"), rNull("k"), lNull("t"), rNull("t"))
      .select($"lid", $"asof.rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(nulls(300L) == -1L, s"NULL-key left row must not match NULL-key right: $nulls")
    assert(nulls(301L) == 401L, s"non-NULL keys still match: $nulls")
    assert(nulls(302L) == -1L, s"NULL-ts right row must never be a match: $nulls")
  }

  test("asof join salted: identical to unsalted for every bucket width, incl. tolerance") {
    // random hot-key data: 3 keys, one holding 80% of rows, ties included
    val rng = new scala.util.Random(11)
    def key() = if (rng.nextDouble() < 0.8) 7L else rng.nextInt(2).toLong
    val left = Seq.tabulate(400)(i => (key(), rng.nextInt(120).toLong, 1000L + i))
      .toDF("k", "t", "lid")
    val right = Seq.tabulate(300)(i => (key(), rng.nextInt(120).toLong, 2000L + i))
      .toDF("k", "t", "rid")
    def run(width: Option[Long], tol: Option[Long]): Map[Long, Long] = {
      val out = width match {
        case Some(w) => graft.operators.AsofJoin.asofBackwardSalted(
          left, right, left("k"), right("k"), left("t"), right("t"),
          bucketWidth = w, rightOrder = right("rid"), tolerance = tol)
        case None => graft.operators.AsofJoin.asofBackward(
          left, right, left("k"), right("k"), left("t"), right("t"),
          rightOrder = right("rid"), tolerance = tol)
      }
      out.select($"lid", $"asof.rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    }
    for (tol <- Seq(None, Some(5L))) {
      val expected = run(None, tol)
      // widths spanning: sub-tick, a few rows per bucket, most rows in
      // one bucket, everything in one bucket (degenerate = unsalted)
      for (w <- Seq(1L, 7L, 50L, 1000L)) {
        assert(run(Some(w), tol) == expected, s"salted(width=$w, tol=$tol) diverged")
      }
    }
    // boundary carry: left row in a bucket with NO right rows must still
    // match the previous bucket's last right row
    val l2 = Seq((1L, 105L, 1L)).toDF("k", "t", "lid")
    val r2 = Seq((1L, 9L, 10L), (1L, 8L, 11L)).toDF("k", "t", "rid")
    val carried = graft.operators.AsofJoin.asofBackwardSalted(
        l2, r2, l2("k"), r2("k"), l2("t"), r2("t"),
        bucketWidth = 10L, rightOrder = r2("rid"))
      .select($"asof.rid").head.getLong(0)
    assert(carried == 10L, s"carry must surface bucket-0's last right row, got $carried")
    // unorderable (map) right columns must stay legal, as in the
    // unsalted path — the bucket summary orders by (ts, ord) only
    val rMap = r2.withColumn("props", map(lit("a"), $"rid"))
    val viaMap = graft.operators.AsofJoin.asofBackwardSalted(
        l2, rMap, l2("k"), rMap("k"), l2("t"), rMap("t"),
        bucketWidth = 10L, rightOrder = rMap("rid"))
      .select($"asof.props")
    assert(viaMap.head.getMap[String, Long](0)("a") == 10L)
    // ns-scale epochs: exact integral bucketing (double division would
    // land rows one bucket off above 2^53)
    val big = 1704067211172425938L
    val lNs = Seq((1L, big + 1000L, 1L)).toDF("k", "t", "lid")
    val rNs = Seq((1L, big, 10L), (1L, big + 2000L, 11L)).toDF("k", "t", "rid")
    val nsOut = graft.operators.AsofJoin.asofBackwardSalted(
        lNs, rNs, lNs("k"), rNs("k"), lNs("t"), rNs("t"),
        bucketWidth = 128L, rightOrder = rNs("rid"))
      .select($"asof.rid").head.getLong(0)
    assert(nsOut == 10L, s"ns-scale bucketing must stay exact, got $nsOut")
  }

  test("range join: bucketized point-in-interval matches, no nested loop") {
    val points = Seq((1L, 5L, 100L), (1L, 25L, 101L), (1L, 31L, 102L), (2L, 5L, 103L),
        (1L, 30L, 104L))
      .toDF("k", "t", "pid")
    val intervals = Seq((1L, 0L, 10L, 200L), (1L, 20L, 30L, 201L), (3L, 0L, 99L, 202L),
        (1L, 50L, 40L, 203L)) // empty interval (hi < lo): matches nothing
      .toDF("k", "lo", "hi", "iid")
    val out = graft.operators.RangeJoin.pointInInterval(
      points, intervals, points("t"), intervals("lo"), intervals("hi"),
      bucketWidth = 7L, pointKey = points("k"), intervalKey = intervals("k"))
    val pairs = out.select($"point.pid", $"interval.iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 200L), (101L, 201L), (104L, 201L)),
      s"got $pairs") // boundaries inclusive (t=30 in [20,30]); key 2/3 never meet
    // duplicates must not arise from an interval spanning many buckets
    assert(out.count() == 3)
    val phys = out.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") && !phys.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$phys")
    // fractional bounds: the exact predicate runs on ORIGINAL values —
    // t=10.9 must NOT match [10.2, 10.4] despite sharing long-cast 10
    val fp = Seq((1L, 10.9, 500L), (1L, 10.3, 501L)).toDF("k", "t", "pid")
    val fi = Seq((1L, 10.2, 10.4, 600L)).toDF("k", "lo", "hi", "iid")
    val fout = graft.operators.RangeJoin.pointInInterval(
        fp, fi, fp("t"), fi("lo"), fi("hi"), bucketWidth = 7L,
        pointKey = fp("k"), intervalKey = fi("k"))
      .select($"point.pid").collect().map(_.getLong(0)).toSet
    assert(fout == Set(501L), s"fractional filter: $fout")
    // an open-ended interval fails fast with a diagnosable error, not an
    // opaque sequence()/OOM blowup
    val open = Seq((1L, 0L, Long.MaxValue / 2, 700L)).toDF("k", "lo", "hi", "iid")
    val e = intercept[Exception] {
      graft.operators.RangeJoin.pointInInterval(
        points, open, points("t"), open("lo"), open("hi"), bucketWidth = 7L,
        pointKey = points("k"), intervalKey = open("k")).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("buckets")), s"unexpected error: $e")
  }

  test("connected components: hub-linked near-dups collapse transitively") {
    // 1~5, 2~5 (hub 5), isolated pair 7~9, singleton edges only
    val pairs = Seq((1L, 5L), (2L, 5L), (7L, 9L)).toDF("idA", "idB")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) == 1L && comps(5L) == 1L && comps(2L) == 1L,
      s"hub cluster not merged: $comps")
    assert(comps(7L) == 7L && comps(9L) == 7L)
    // a longer chain: 10-11, 11-12, 12-13 → all label 10
    val chain = Seq((10L, 11L), (11L, 12L), (12L, 13L)).toDF("idA", "idB")
    val c2 = Dedup.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2.values.toSet == Set(10L), s"chain not collapsed: $c2")
  }

  test("connected components: a 300-link chain converges inside default rounds (pointer halving)") {
    // iteratively-edited documents near-duplicate their NEIGHBORS, so a
    // chain-shaped component is the realistic worst case. Diameter 300
    // needs 300 rounds of plain min-propagation (the default cap is 20
    // — the old code silently returned inconsistent labels here);
    // pointer halving doubles propagation distance per round, so it
    // converges in ~O(log d) rounds.
    val pairs = Seq.tabulate(300)(i => (i.toLong, i + 1L)).toDF("idA", "idB")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 301)
    assert(labels.values.forall(_ == 0L),
      s"chain must collapse to component 0; wrong: ${labels.filter(_._2 != 0L).take(5)}")
  }

  test("simhash: identical fingerprints for dups, banded pairs verified by hamming") {
    Graft.register(spark)
    val fps = docs.select($"doc_id",
      graft.functions.SimHash64.simhash64(TextFunctions.tokens(lower($"text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0) == fps(4))
    assert(java.lang.Long.bitCount(fps(0) ^ fps(1)) < java.lang.Long.bitCount(fps(0) ^ fps(3)))
    val pairs = Dedup.simhashPairs(docs, $"doc_id", $"text", maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
  }

  val vecRng = new scala.util.Random(99)
  val vecs: Seq[(Long, Seq[Float])] = Seq.tabulate(60) { i =>
    val base = Array.fill(16)(vecRng.nextGaussian().toFloat)
    i.toLong -> base.toSeq
  } :+ (100L -> Seq.tabulate(16)(j => (0.001f * j))) // near-zero vector
  def vecDf = vecs.toDF("vec_id", "embedding")

  test("brute-force cosine top-k: exact, self-excluded, ranked") {
    val q = vecDf.filter($"vec_id" < 5)
    val res = Similarity.bruteForceTopK(q, vecDf, "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .collect()
    assert(res.length == 15) // 5 queries × 3
    assert(res.forall(r => r.getLong(0) != r.getLong(1)))
    // oracle for query 0: compute cosines locally
    val target = vecs.head._2.map(_.toDouble)
    def cos(b: Seq[Float]): Double = {
      val bd = b.map(_.toDouble)
      val d = target.zip(bd).map { case (x, y) => x * y }.sum
      d / (math.sqrt(target.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
    }
    val expTop = vecs.tail.map { case (id, v) => id -> cos(v) }.sortBy(-_._2).take(3).map(_._1)
    val gotTop = res.filter(_.getLong(0) == 0L).sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(gotTop == expTop, s"got $gotTop expected $expTop")
  }

  test("LSH top-k: results are a subset of brute-force candidates with correct cosines") {
    val q = vecDf.filter($"vec_id" < 5)
    val brute = Similarity.bruteForceTopK(q, vecDf, "vec_id", "embedding", "vec_id", "embedding", k = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(q, vecDf, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, dim = 16, nPlanes = 4).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key) && math.abs(brute(key) - r.getDouble(2)) < 1e-9)
    }
  }

  test("IVF ANN: probes find the true nearest neighbor when it shares a centroid region") {
    val index = Similarity.ivfBuild(vecDf, "vec_id", "embedding", nCentroids = 4)
    assert(index.centroids.length == 4)
    // every vector gets exactly one centroid
    val assignments = index.assigned.groupBy("__cent").count().collect()
    assert(assignments.map(_.getLong(1)).sum == vecs.length)
    val q = vecDf.filter($"vec_id" < 5)
    val res = Similarity.ivfTopK(index, q, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, nProbe = 4) // nProbe == nCentroids → exhaustive → exact
    val brute = Similarity.bruteForceTopK(q, vecDf, "vec_id", "embedding", "vec_id", "embedding", k = 3)
    val rSet = res.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val bSet = brute.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(rSet == bSet, s"ivf exhaustive != brute force")
    // partial probing returns a subset with correct cosines
    val partial = Similarity.ivfTopK(index, q, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, nProbe = 2).collect()
    assert(partial.nonEmpty)
  }

  test("degenerate vectors rank LAST, never first: NaN corpus row + zero-norm query") {
    // one corpus vector with a NaN element and one all-zero vector: an
    // unguarded dot/(na*nb) scores them NaN, which `cos desc` orders
    // ABOVE every finite cosine — rank 1 for EVERY query. The guard
    // NULLs them (desc NULLS LAST) so they can only pad the tail.
    val poisoned = vecDf.union(Seq(
      (900L, Seq.tabulate(16)(j => if (j == 3) Float.NaN else 0.5f)),
      (901L, Seq.fill(16)(0.0f))).toDF("vec_id", "embedding"))
    val q = poisoned.filter($"vec_id" < 3)
    val res = Similarity.bruteForceTopK(q, poisoned, "vec_id", "embedding",
      "vec_id", "embedding", k = 3).collect()
    assert(res.nonEmpty)
    res.foreach(r => assert(r.getLong(1) < 900L,
      s"degenerate corpus row ranked top-3: $r"))
    // and the near-dup pair filter cannot pass a NaN cosine either
    val pairs = Similarity.embeddingNearDupPairs(poisoned, "vec_id", "embedding",
      threshold = 0.9, dim = 16, nPlanes = 0).collect()
    pairs.foreach(r => assert(r.getLong(0) < 900L && r.getLong(1) < 900L,
      s"degenerate pair passed the threshold: $r"))
  }

  test("excludeSelf=false keeps cId==qId pairs on the LSH and IVF paths") {
    val q = vecDf.filter($"vec_id" < 5)
    val lsh = Similarity.lshTopK(q, vecDf, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, dim = 16, nPlanes = 2, excludeSelf = false).collect()
    // a vector's own row has cos 1.0 — with self included it must be rank 1
    assert(lsh.filter(_.getInt(3) == 1).forall(r => r.getLong(0) == r.getLong(1)))
    val index = Similarity.ivfBuild(vecDf, "vec_id", "embedding", nCentroids = 4)
    val ivf = Similarity.ivfTopK(index, q, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, nProbe = 4, excludeSelf = false).collect()
    assert(ivf.filter(_.getInt(3) == 1).forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("ivfBuild: seed is live (XOR-folded, default preserved), degenerate corpora fail loudly") {
    // default seed must reproduce the historical xxhash64(id) sample
    // order bit-for-bit (pinned recall goldens depend on it)
    val a = Similarity.ivfBuild(vecDf, "vec_id", "embedding", nCentroids = 4, kmeansIters = 0)
    val b = Similarity.ivfBuild(vecDf, "vec_id", "embedding", nCentroids = 4, seed = 42L, kmeansIters = 0)
    assert(a.centroids.map(_._2.toSeq).toSeq == b.centroids.map(_._2.toSeq).toSeq)
    // a different seed draws a different sample
    val c = Similarity.ivfBuild(vecDf, "vec_id", "embedding", nCentroids = 4, seed = 7L, kmeansIters = 0)
    assert(a.centroids.map(_._2.toSeq).toSeq != c.centroids.map(_._2.toSeq).toSeq)
    // all-degenerate corpus: loud require, not a silent empty index
    val bad = Seq((1L, null.asInstanceOf[Seq[Float]]),
      (2L, Seq(Float.NaN, 1.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfBuild(bad, "vec_id", "embedding", nCentroids = 2)
    }
    assert(ex.getMessage.contains("no finite corpus vectors"))
    // mixed vector lengths in the sample: loud require, not a
    // misaligned flat matrix
    val mixed = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val ex2 = intercept[IllegalArgumentException] {
      Similarity.ivfBuild(mixed, "vec_id", "embedding", nCentroids = 2)
    }
    assert(ex2.getMessage.contains("mixed lengths"))
  }

  test("lshBucket rejects nPlanes outside 1..63") {
    for (bad <- Seq(0, 64, -1)) {
      intercept[IllegalArgumentException] {
        Similarity.lshBucket($"embedding", dim = 16, nPlanes = bad)
      }
    }
  }

  test("multi-table LSH: candidate superset of every single table, exact cosines, no dup ranks") {
    val q = vecDf.filter($"vec_id" < 5)
    val seeds = Seq(42L, 43L, 44L)
    val multi = Similarity.lshTopKSeeds(q, vecDf, "vec_id", "embedding", "vec_id", "embedding",
        k = 60, dim = 16, nPlanes = 4, seeds = seeds)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every single table's survivors appear with the identical cosine
    // (bit-exact: same kernel), and the union is at least as large
    for (s <- seeds) {
      val single = Similarity.lshTopK(q, vecDf, "vec_id", "embedding", "vec_id", "embedding",
          k = 60, dim = 16, nPlanes = 4, seed = s)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      single.foreach { case (pair, cos) =>
        assert(multi.contains(pair) && multi(pair) == cos, s"seed $s pair $pair missing/diverged")
      }
      assert(multi.size >= single.size)
    }
    // dedup across tables: one rank sequence per query, no repeated pair
    val ranks = Similarity.lshTopKSeeds(q, vecDf, "vec_id", "embedding", "vec_id", "embedding",
        k = 60, dim = 16, nPlanes = 4, seeds = seeds)
      .groupBy($"qId", $"cId").count().filter($"count" > 1).count()
    assert(ranks == 0, "a candidate found by several tables must be ranked once")
  }

  test("IVF over an int8-quantized corpus: the full 100 TB configuration end-to-end") {
    // quantize the corpus once (4× smaller vectors), build the IVF index
    // and search it — every stage (centroid sampling, Lloyd fixed-point
    // means, assignment, probing, scoring) must accept ARRAY<TINYINT>
    import graft.operators.Quantize
    Graft.register(spark)
    val q8 = vecDf.select($"vec_id",
      Quantize.quantizeInt8($"embedding").getField("q").as("embedding"))
    val idx = Similarity.ivfBuild(q8, "vec_id", "embedding", nCentroids = 4)
    assert(idx.assigned.groupBy("__cent").count().collect().map(_.getLong(1)).sum == vecs.length)
    val q = q8.filter($"vec_id" < 5)
    // nProbe == nCentroids → exhaustive → must equal quantized brute force
    val ivf = Similarity.ivfTopK(idx, q, "vec_id", "embedding", "vec_id", "embedding",
        k = 3, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val bf = Similarity.bruteForceTopK(q, q8, "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(ivf == bf, s"exhaustive quantized IVF != quantized brute force")
  }

  test("IVF kmeans refinement: Lloyd iterations do not increase within-cluster SSE") {
    // 3 tight clusters; sampled init may land two centroids in one cluster,
    // Lloyd must pull them apart (or at least never make the fit worse)
    val cRng = new scala.util.Random(5)
    val clustered = Seq.tabulate(90) { i =>
      val c = i % 3
      i.toLong -> Seq.tabulate(8)(j => (c * 10.0 + cRng.nextGaussian()).toFloat)
    }.toDF("vec_id", "embedding")
    def sse(idx: Similarity.IvfIndex): Double = {
      val centLit = typedLit(idx.centroids.map { case (i, v) => (i, v.toSeq) }.toSeq)
      idx.assigned.select($"__cent",
          posexplode(transform($"embedding", x => x.cast("double"))).as(Seq("p", "x")))
        .join(Seq.tabulate(idx.centroids.length)(i =>
            idx.centroids(i)._2.zipWithIndex.map { case (v, p) => (i, p, v) }).flatten
          .toDF("__cent", "p", "c"), Seq("__cent", "p"))
        .select(sum(pow($"x" - $"c", 2))).head.getDouble(0)
    }
    val init = Similarity.ivfBuild(clustered, "vec_id", "embedding", nCentroids = 3,
      kmeansIters = 0)
    val refined = Similarity.ivfBuild(clustered, "vec_id", "embedding", nCentroids = 3,
      kmeansIters = 4)
    val (s0, s1) = (sse(init), sse(refined))
    assert(s1 <= s0 * 1.0001, s"kmeans worsened SSE: $s0 -> $s1")
    // with well-separated clusters Lloyd converges to the true means
    val trueMeans = Seq(0.0, 10.0, 20.0)
    val matched = refined.centroids.map(_._2.sum / 8).sorted
    matched.zip(trueMeans).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1.5, s"centroid mean $got vs $want (${matched.toSeq})")
    }
  }

  test("embedding near-dup pairs find planted duplicates") {
    val planted = vecDf.unionByName(
      vecs.take(3).map { case (id, v) => (id + 1000L, v.map(x => x * 1.001f)) }.toDF("vec_id", "embedding"))
    val pairs = Similarity.embeddingNearDupPairs(planted, "vec_id", "embedding",
      threshold = 0.999, dim = 16, nPlanes = 4).collect()
    val found = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(Seq((0L, 1000L), (1L, 1001L), (2L, 1002L)).count(found.contains) >= 2, s"found $found")
  }

  test("multimodal: stub feature extraction is deterministic with stable schema; frame sampling shapes") {
    val media = Seq(
      (1L, Array.tabulate(256)(_.toByte), "img"),
      (2L, Array.tabulate(1024)(i => (i * 7).toByte), "vid"),
      (3L, null.asInstanceOf[Array[Byte]], "img")
    ).toDF("media_id", "content", "kind")
    val feats = Multimodal.extractFeatures(media, "content", dim = 8)
    assert(feats.schema("features").dataType.typeName == "array")
    val rows = feats.select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows(1).length == 8 && rows(2).length == 8)
    assert(rows(3).forall(_ == 0.0f)) // null payload → zero features
    val again = Multimodal.extractFeatures(media, "content", dim = 8)
      .select("media_id", "features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows == again) // deterministic
    val frames = media.filter($"kind" === "vid")
      .select(Multimodal.frameSample($"content", n = 4, frameSize = 64).as("f"))
      .head.getSeq[Array[Byte]](0)
    assert(frames.length == 4 && frames.forall(_.length == 64))
    val resized = media.select(length(Multimodal.resizeStub($"content", 128))).collect()
    assert(resized.filter(!_.isNullAt(0)).forall(_.getInt(0) == 128))
  }

  test("multimodal video: real MP4/AVI container metadata from a pure-JVM chunk walk") {
    import java.nio.{ByteBuffer, ByteOrder}
    // --- minimal ISO-BMFF: ftyp + moov{mvhd v0, trak{tkhd v0}} ---
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + payload.length)
      b.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      b.array()
    }
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](8))
    val mvhd = { // v0 payload, 100 bytes: timescale 1000 @ +12, duration 5000 @ +16
      val p = ByteBuffer.allocate(100)
      p.position(12); p.putInt(1000); p.putInt(5000)
      box("mvhd", p.array())
    }
    def tkhd(w: Int, h: Int) = { // v0 payload, 84 bytes: 16.16 w/h are the last 8
      val p = ByteBuffer.allocate(84)
      p.position(76); p.putInt(w << 16); p.putInt(h << 16)
      box("tkhd", p.array())
    }
    val audioTrak = box("trak", tkhd(0, 0))      // sound track: 0×0
    val videoTrak = box("trak", tkhd(640, 360))
    val mp4 = ftyp ++ box("moov", mvhd ++ audioTrak ++ videoTrak)
    assert(Multimodal.VideoMeta.meta(mp4) == ("isom", 640, 360, 5000L), "mp4")

    // --- minimal RIFF/AVI: LIST hdrl { avih } ---
    val avih = { // 56-byte main header: µs/frame, total frames @+16, w/h @+32/+36
      val p = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      p.putInt(0, 33333); p.putInt(16, 300); p.putInt(32, 320); p.putInt(36, 240)
      val c = ByteBuffer.allocate(64).order(ByteOrder.LITTLE_ENDIAN)
      c.put("avih".getBytes("US-ASCII")).putInt(56).put(p.array())
      c.array()
    }
    val hdrl = {
      val c = ByteBuffer.allocate(12 + avih.length).order(ByteOrder.LITTLE_ENDIAN)
      c.put("LIST".getBytes("US-ASCII")).putInt(4 + avih.length)
        .put("hdrl".getBytes("US-ASCII")).put(avih)
      c.array()
    }
    val avi = {
      val c = ByteBuffer.allocate(12 + hdrl.length).order(ByteOrder.LITTLE_ENDIAN)
      c.put("RIFF".getBytes("US-ASCII")).putInt(4 + hdrl.length)
        .put("AVI ".getBytes("US-ASCII")).put(hdrl)
      c.array()
    }
    assert(Multimodal.VideoMeta.meta(avi) == ("avi", 320, 240, 9999L), "avi")

    // ISO-BMFF with a leading `wide` box (ftyp not first — spec-legal,
    // common from MOV muxers) must still parse
    val wideLed = box("wide", Array.emptyByteArray) ++ mp4
    assert(Multimodal.VideoMeta.meta(wideLed) == ("isom", 640, 360, 5000L), "wide-led mp4")
    // a payload that merely sniffs as ISO-BMFF (bytes 4-8 spell a known
    // box) but contains no ftyp/moov must NOT claim a format
    val sniffOnly = "????free then garbage garbage".getBytes("US-ASCII")
    assert(Multimodal.VideoMeta.meta(sniffOnly)._1 == null, "sniff-only must stay null")

    // unrecognized / truncated / null payloads degrade to null metadata
    assert(Multimodal.VideoMeta.meta("not a video at all".getBytes) == (null, -1, -1, -1L))
    assert(Multimodal.VideoMeta.meta(mp4.take(10)) == (null, -1, -1, -1L))
    assert(Multimodal.VideoMeta.meta(null) == (null, -1, -1, -1L))

    // --- REAL frame decode: MJPEG-in-AVI (movi chunks are JPEGs) ---
    def jpegOf(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val c = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      c.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      c.array() // trailing pad byte for odd sizes is already zeroed
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] = {
      val c = ByteBuffer.allocate(12 + children.length).order(ByteOrder.LITTLE_ENDIAN)
      c.put("LIST".getBytes("US-ASCII")).putInt(4 + children.length)
        .put(typ.getBytes("US-ASCII")).put(children)
      c.array()
    }
    val jpegs = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff, 0x000000).map(jpegOf)
    val movi = list("movi", jpegs.map(chunk("00dc", _)).reduce(_ ++ _))
    val mjpeg = {
      val body = hdrl ++ movi
      val c = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      c.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
        .put("AVI ".getBytes("US-ASCII")).put(body)
      c.array()
    }
    // metadata still parses; frames come back as decodable JPEGs with
    // an even stride (5 frames, ask 3 → chunks 0, 2, 4)
    assert(Multimodal.VideoMeta.meta(mjpeg) == ("avi", 320, 240, 9999L), "mjpeg avi meta")
    val frames = Multimodal.VideoMeta.mjpegFrames(mjpeg, 3)
    assert(frames.length == 3, s"got ${frames.length} frames")
    assert(frames.map(f => Multimodal.ImageDecoder.meta(f)) ==
      Seq(("jpeg", 8, 8), ("jpeg", 8, 8), ("jpeg", 8, 8)))
    // stride hits first and last: red-ish first frame, black-ish last
    val lumas = frames.map(f => Multimodal.ImageDecoder.features(f, 1)(0))
    assert(lumas.head > lumas.last, s"stride should span red..black: $lumas")
    // clip-level decoder: mean of per-frame REAL features, nonzero
    val clipFeats = Multimodal.MjpegVideoDecoder.features(mjpeg, 4)
    assert(clipFeats.exists(_ != 0.0f), "real decode must produce nonzero features")
    // non-MJPEG AVI (no movi JPEGs) and hostile payloads yield Nil/zeros
    assert(Multimodal.VideoMeta.mjpegFrames(avi, 3).isEmpty)
    assert(Multimodal.VideoMeta.mjpegFrames(mp4, 3).isEmpty)
    assert(Multimodal.VideoMeta.mjpegFrames(mjpeg.take(40), 3).isEmpty)
    assert(Multimodal.VideoMeta.mjpegFrames(null, 3).isEmpty)
    assert(Multimodal.MjpegVideoDecoder.features(mp4, 4).forall(_ == 0.0f))
    // DataFrame path: batched no-shuffle frame extraction
    locally {
      val sq = spark
      import sq.implicits._
      val df = Seq((1L, mjpeg), (2L, mp4), (3L, null.asInstanceOf[Array[Byte]]))
        .toDF("id", "clip")
      val got = Multimodal.sampleRealFrames(df, "clip", n = 2)
        .select($"id", size($"frames").as("n")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
      assert(got == Map(1L -> 2, 2L -> 0, 3L -> -1), s"got $got") // null clip → null frames
    }
    // corrupt size field must not throw or loop
    val corrupt = mp4.clone(); corrupt(0) = 0x7f.toByte
    Multimodal.VideoMeta.meta(corrupt)

    // fuzz: an untrusted-bytes parser must never throw or hang — random
    // payloads and random single-byte mutations of VALID files (the
    // nastier case: mostly-consistent structure with one lying field)
    val fRng = new scala.util.Random(17)
    for (_ <- 0 until 300) {
      val junk = Array.fill(fRng.nextInt(256))(fRng.nextInt().toByte)
      Multimodal.VideoMeta.meta(junk) // must return, not throw
      val base = if (fRng.nextBoolean()) mp4 else avi
      val mut = base.clone()
      mut(fRng.nextInt(mut.length)) = fRng.nextInt().toByte
      Multimodal.VideoMeta.meta(mut)
    }

    // deeply-nested LIST chunks: each level costs the attacker 12 bytes
    // but (without a depth bound) one stack frame — a ~600 KB payload
    // would raise StackOverflowError, which escapes a NonFatal catch.
    // chunkBytes(k levels below) = 12·(k+1) + inner; size field = bytes − 8
    def nestedAvi(depth: Int, inner: Array[Byte]): Array[Byte] = {
      val total = 12 + 12 * depth + inner.length
      val c = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
      c.put("RIFF".getBytes("US-ASCII")).putInt(total - 8).put("AVI ".getBytes("US-ASCII"))
      for (k <- (0 until depth).reverse)
        c.put("LIST".getBytes("US-ASCII")).putInt(12 * k + 4 + inner.length)
          .put("nest".getBytes("US-ASCII"))
      c.put(inner).array()
    }
    // depth 50 000 must return (not SOE); past the bound it reports no avih
    assert(Multimodal.VideoMeta.meta(nestedAvi(50000, avih)) == ("avi", -1, -1, -1L),
      "deep nesting must neither crash nor descend past the bound")
    // modest nesting (≤ bound) still finds the header
    assert(Multimodal.VideoMeta.meta(nestedAvi(10, avih)) == ("avi", 320, 240, 9999L),
      "legitimate nesting within the bound must still parse")
  }

  test("external-transcode seam: sidecar MJPEG payloads carry undecodable codecs through the real decoder") {
    import java.nio.{ByteBuffer, ByteOrder}
    val sq = spark
    import sq.implicits._
    // RIFF/AVI building blocks (the video test's helpers, minimal form)
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val c = ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      c.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      c.array()
    }
    def list(typ: String, children: Array[Byte]): Array[Byte] = {
      val c = ByteBuffer.allocate(12 + children.length).order(ByteOrder.LITTLE_ENDIAN)
      c.put("LIST".getBytes("US-ASCII")).putInt(4 + children.length)
        .put(typ.getBytes("US-ASCII")).put(children)
      c.array()
    }
    def avi(movi: Array[Byte]): Array[Byte] = {
      val c = ByteBuffer.allocate(12 + movi.length).order(ByteOrder.LITTLE_ENDIAN)
      c.put("RIFF".getBytes("US-ASCII")).putInt(4 + movi.length)
        .put("AVI ".getBytes("US-ASCII")).put(movi)
      c.array()
    }
    def jpegOf(rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // clip 1: native MJPEG (decodable in-JVM, needs no sidecar)
    val mjpegClip = avi(list("movi", Seq(0xff0000, 0x00ff00).map(j => chunk("00dc", jpegOf(j))).reduce(_ ++ _)))
    // clip 2: same container, movi chunks are NOT JPEG — an H.264-like
    // payload as far as the JVM is concerned (mjpegFrames → Nil)
    val h264ish = avi(list("movi",
      chunk("00dc", Array.fill(64)(0x42.toByte)) ++ chunk("00dc", Array.fill(64)(0x17.toByte))))
    assert(Multimodal.VideoMeta.mjpegFrames(h264ish, 4).isEmpty, "precondition: undecodable")
    // the EXTERNAL tool's output per the documented contract: the same
    // clip re-muxed to MJPEG-in-AVI (here: built by the same machinery
    // ffmpeg would feed — frame payloads become JPEGs)
    val transcodedClip2 = avi(list("movi",
      Seq(0x0000ff, 0xffffff).map(j => chunk("00dc", jpegOf(j))).reduce(_ ++ _)))

    val clips = Seq((1L, mjpegClip), (2L, h264ish), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("clip_id", "clip").repartition(2)
    val sidecar = Seq((2L, transcodedClip2)).toDF("t_id", "t_clip")

    // without the seam, clip 2 is a zero vector and yields no frames
    val before = Multimodal.extractFeatures(clips, "clip", dim = 4,
        decoder = Multimodal.MjpegVideoDecoder)
      .select($"clip_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(before(2L).forall(_ == 0.0f), "undecodable codec must yield zeros pre-seam")
    assert(before(1L).exists(_ != 0.0f))

    // with the seam: sidecar payload swapped in, downstream unchanged
    val patched = Multimodal.withTranscodeFallback(clips, "clip_id", "clip",
      sidecar, "t_id", "t_clip")
    assert(patched.columns.sameElements(clips.columns), "schema must be unchanged")
    val after = Multimodal.extractFeatures(patched, "clip", dim = 4,
        decoder = Multimodal.MjpegVideoDecoder)
      .select($"clip_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(after(2L).exists(_ != 0.0f), "transcoded payload must decode for real")
    assert(after(1L) == before(1L), "clips without a sidecar row keep their bytes")
    // frame sampling also works on the patched payloads
    val frames = Multimodal.sampleRealFrames(patched, "clip", n = 2)
      .select($"clip_id", size($"frames").as("n")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(frames == Map(1L -> 2, 2L -> 2, 3L -> -1), s"got $frames")
    // null payloads stay null through the seam (no sidecar row)
    assert(patched.filter($"clip_id" === 3L).select($"clip").head.isNullAt(0))
    // the join is planner-chosen; a KB sidecar must broadcast
    val plan = patched.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"small sidecar should broadcast:\n$plan")
  }

  test("ffmpeg integration: a REAL H.264 clip transcoded per the documented sidecar contract " +
       "(skipped when ffmpeg is absent)") {
    // makes the seam's EXTERNAL contract executable where ffmpeg exists:
    // generate an H.264 clip, run exactly the scaladoc's command
    // (`ffmpeg -i clip.mp4 -an -c:v mjpeg -q:v 3 clip.avi`), and assert
    // the sidecar payload decodes through the unchanged downstream
    def run(cmd: String*): Int =
      try new ProcessBuilder(cmd: _*).redirectErrorStream(true).start().waitFor()
      catch { case _: java.io.IOException => -1 }
    assume(run("ffmpeg", "-version") == 0,
      "ffmpeg not installed — external-transcode contract not executable in this environment")
    val dir = java.nio.file.Files.createTempDirectory("graft_ffmpeg")
    val mp4 = dir.resolve("clip.mp4").toString
    val avi = dir.resolve("clip.avi").toString
    assume(run("ffmpeg", "-y", "-f", "lavfi", "-i", "testsrc=duration=0.3:size=64x64:rate=10",
      "-c:v", "libx264", "-pix_fmt", "yuv420p", mp4) == 0,
      "ffmpeg present but cannot encode H.264 (libx264 missing)")
    assert(run("ffmpeg", "-y", "-i", mp4, "-an", "-c:v", "mjpeg", "-q:v", "3", avi) == 0,
      "the documented transcode command failed")
    val sq = spark
    import sq.implicits._
    import graft.operators.Multimodal
    val mp4Bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(mp4))
    val aviBytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(avi))
    // precondition: the H.264 payload is undecodable in-JVM, the
    // ffmpeg-produced AVI is real MJPEG the decoder reads
    assert(Multimodal.VideoMeta.mjpegFrames(mp4Bytes, 1).isEmpty)
    assert(Multimodal.VideoMeta.mjpegFrames(aviBytes, 1).nonEmpty,
      "ffmpeg's MJPEG-in-AVI must decode natively")
    val clips = Seq((1L, mp4Bytes)).toDF("clip_id", "clip")
    val sidecar = Seq((1L, aviBytes)).toDF("t_id", "t_clip")
    val patched = Multimodal.withTranscodeFallback(clips, "clip_id", "clip",
      sidecar, "t_id", "t_clip")
    val feats = Multimodal.extractFeatures(patched, "clip", dim = 4,
        decoder = Multimodal.MjpegVideoDecoder)
      .select($"features").head.getSeq[Float](0)
    assert(feats.exists(_ != 0.0f), "real transcoded clip must yield nonzero features")
    val nFrames = Multimodal.sampleRealFrames(patched, "clip", n = 2)
      .select(size($"frames")).head.getInt(0)
    assert(nFrames == 2, s"frame sampling over the real transcode got $nFrames")
  }

  test("TimeBuckets.floorBucket: floor semantics for negatives, exact at ns-epoch magnitude") {
    import graft.operators.TimeBuckets
    val df = Seq(-21L, -20L, -1L, 0L, 19L, 20L,
        1704067211172425938L, 1704067211172425937L)
      .toDF("t").withColumn("b", TimeBuckets.floorBucket($"t", 20L))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(-21L) == -2L && got(-20L) == -1L && got(-1L) == -1L, s"negatives: $got")
    assert(got(0L) == 0L && got(19L) == 0L && got(20L) == 1L, s"positives: $got")
    // above 2^53 double division can land one bucket off; integral div
    // must place adjacent ns timestamps on the true boundary
    assert(got(1704067211172425938L) == 1704067211172425938L / 20L)
    assert(got(1704067211172425937L) == 1704067211172425937L / 20L)
  }
}
