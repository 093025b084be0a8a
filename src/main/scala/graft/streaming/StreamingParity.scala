package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/**
 * Batch ≡ streaming parity harnesses — the certified bridge between the
 * streaming operators (`graft.streaming.*`) and the DuckDB oracle rows.
 * SURVEY §2.3's streaming note claims cofactor triples are mergeable and
 * sessionization is order-insensitive once closed; these entry points
 * RUN the streaming operator over the same parquet the batch oracle
 * reads — through a real file-source stream chopped into micro-batches —
 * and emit the batch query's exact output shape, so the driver's
 * correctness gate certifies streaming results against the same SQL it
 * uses for the batch rows (round-17 verdict item 5).
 *
 * Micro-batch discipline: the input is re-written into several parquet
 * files under a fixed per-user scratch dir (overwrite, not accumulate —
 * the q83 lesson) and streamed with `maxFilesPerTrigger=1`, so the
 * streaming path genuinely merges state ACROSS batches instead of
 * collapsing into one batch. For sessionization the files are cut on
 * event-time ranges and written in ascending order (file sources pick
 * oldest-mtime first): ordered arrival is the contract under which
 * closed-session parity with the batch operator is exact, and a final
 * far-future fencepost event pushes the global watermark past every
 * open session's `last + gap` so event-time timeouts flush them.
 */
object StreamingParity {

  /** Per-user, per-APPLICATION scratch root (overwritten every run).
    * The application-id suffix keeps two concurrent runs as the same
    * user (the correctness gate plus a bench, or two gate sessions)
    * from overwriting each other's micro-batch files and checkpoints
    * mid-stream (round-18 advice — a shared fixed path corrupted
    * certified rows nondeterministically). Unique-per-run paths leak
    * where the old fixed path self-overwrote, so this JVM's root is
    * removed on clean exit (shutdown hook) and SIBLING roots older
    * than a day — no live run lasts that long, so the sweep can never
    * touch a concurrent run's files — are swept as a SIGKILL backstop. */
  private def scratch(spark: SparkSession, name: String): java.io.File = {
    val base = new java.io.File(System.getProperty("java.io.tmpdir"))
    val prefix = s"graft_streampar_${System.getProperty("user.name", "u")}_"
    val root = new java.io.File(base, prefix + spark.sparkContext.applicationId)
    cleanupOnce(base, prefix, root)
    new java.io.File(root, name)
  }

  // armed PER ROOT, not once per JVM: a second SparkSession in the same
  // JVM (test suites) gets a new per-applicationId scratch root, which
  // needs its own shutdown hook or it leaks until another JVM's >1-day
  // sweep (round-19 advice)
  private val armedRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def cleanupOnce(base: java.io.File, prefix: String, own: java.io.File): Unit =
    if (armedRoots.add(own.getAbsolutePath)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(own)))
      val dayAgo = System.currentTimeMillis() - 24L * 3600 * 1000
      Option(base.listFiles()).toSeq.flatten.foreach { f =>
        if (f.getName.startsWith(prefix) && f != own && f.lastModified() < dayAgo)
          deleteRec(f)
      }
    }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRec)
    f.delete()
  }

  /** Run a streaming query over `in` (one micro-batch per file) until
    * every available file AND every watermark-driven timeout batch has
    * been processed. */
  private def runToCompletion(spark: SparkSession,
                              start: String => org.apache.spark.sql.streaming.StreamingQuery,
                              name: String): Unit = {
    val chk = scratch(spark, s"${name}_chk")
    deleteRec(chk)
    val q = start(chk.getAbsolutePath)
    try {
      // twice: the second call picks up the no-data micro-batch that
      // fires event-time timeouts after the last file's watermark move
      q.processAllAvailable()
      q.processAllAvailable()
    } finally q.stop()
  }

  /** Streaming cofactor ≡ batch cofactor (q02's projection): lineitem is
    * split into 8 parquet files, each its own micro-batch; the
    * [[StreamingCofactor.Incremental]] foreachBatch sink folds each
    * batch's triple into the running ring state; the FINAL state is
    * projected exactly like the batch q02 query, so the q02 oracle SQL
    * certifies it. Ring addition is associative, so the 8-way split
    * must land on the batch answer (to the oracle's 2-decimal round). */
  def cofactorFlat(spark: SparkSession, dir: String): DataFrame = {
    val in = scratch(spark, "cofactor_in")
    val src = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity"), col("l_extendedprice"), col("l_linenumber"))
    src.repartition(8).write.mode("overwrite").parquet(in.getAbsolutePath)

    val inc = new StreamingCofactor.Incremental(
      Seq("l_quantity", "l_extendedprice"), Seq("l_linenumber"))
    runToCompletion(spark, chk =>
      spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in.getAbsolutePath)
        .writeStream
        .foreachBatch(inc.sink _)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start(), "cofactor")

    val t = inc.current
    require(t.n > 0, "streaming cofactor saw no rows — file stream misconfigured")
    import spark.implicits._
    Seq((t.n, t.lin(0), t.lin(1), t.quad(0), t.quad(1), t.quad(2)))
      .toDF("n", "l0", "l1", "q0", "q1", "q2")
      .select(
        col("n").as("n_rows"),
        round(col("l0"), 2).as("sum_qty"),
        round(col("l1") / col("n"), 2).as("avg_price"),
        round(col("q0") / col("n"), 2).as("avg_qty_qty"),
        round(col("q1") / col("n"), 2).as("avg_qty_price"),
        round(col("q2") / col("n"), 2).as("avg_price_price"))
  }

  /** Streaming sessionize ≡ batch sessionize (q33's summary): events cut
    * into 8 event-time-range files written in ascending order + the
    * fencepost file, streamed one file per batch through
    * [[StreamingSessionize.sessionize]] (flatMapGroupsWithState, event-
    * time timeout) into a memory sink; closed sessions aggregate to the
    * q33 summary shape, certified by the q33 oracle SQL. */
  def sessionSummary(spark: SparkSession, dir: String, eventsSchema: StructType): DataFrame = {
    val gapMs = 1800000L // 30 min, the q33 gap (1 800 000 000 µs)
    val in = scratch(spark, "sessionize_in")
    val ev = spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("ts")).cache()
    val (minUs, maxUs) = tsBounds(ev)
    val chunks = timeRangeChunks(ev, minUs, maxUs, 8) :+ {
      // fencepost: one far-future event on a sentinel key pushes the
      // watermark past every real session's last + gap
      import spark.implicits._
      Seq((-1L, new java.sql.Timestamp((maxUs / 1000) + gapMs + 7200000L)))
        .toDF("user_id", "ts")
    }
    writeOrderedChunks(spark, in, "sessionize", chunks)
    ev.unpersist()

    val qn = "graft_streampar_sessions"
    spark.catalog.dropTempView(qn)
    runToCompletion(spark, chk =>
      StreamingSessionize.sessionize(
        spark.readStream.schema(StructType(eventsSchema.filter(f =>
            f.name == "user_id" || f.name == "ts")))
          .option("maxFilesPerTrigger", 1)
          .parquet(in.getAbsolutePath),
        "user_id", "ts", gapMs, watermark = "1 minute")
        .writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start(), "sessionize")

    spark.table(qn)
      .filter(col("key") =!= -1L)
      .groupBy(col("key").as("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("events")).as("n_events"),
        max(col("events")).as("max_sess_events"))
      .orderBy(col("user_id"))
  }

  /** Write each chunk as ONE parquet file under `in`, sequentially, so
    * both mtime and name order match the chunk order (file sources pick
    * oldest first) — ordered arrival is the parity contract for every
    * order-sensitive streaming operator here. */
  private[graft] def writeOrderedChunks(spark: SparkSession, in: java.io.File,
                                        tag: String, chunks: Seq[DataFrame]): Unit = {
    deleteRec(in)
    in.mkdirs()
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    chunks.zipWithIndex.foreach { case (c, i) =>
      val tmp = scratch(spark, s"${tag}_tmp")
      c.coalesce(1).write.mode("overwrite").parquet(tmp.getAbsolutePath)
      val part = Option(tmp.listFiles()).toSeq.flatten
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"$tag parity: chunk $i wrote no parquet part"))
      fs.rename(new org.apache.hadoop.fs.Path(part.getAbsolutePath),
        new org.apache.hadoop.fs.Path(new java.io.File(in, f"chunk_$i%02d.parquet").getAbsolutePath))
    }
  }

  /** (min, max) of `ts` in epoch microseconds. */
  private def tsBounds(df: DataFrame): (Long, Long) = {
    val r = df.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** `n` ascending event-time range slices of `df` covering [min, max]
    * exactly — the ordered-arrival chunking shared by the time-keyed
    * parity harnesses. */
  private def timeRangeChunks(df: DataFrame, minUs: Long, maxUs: Long,
                              n: Int): Seq[DataFrame] = {
    val span = maxUs - minUs + 1
    (0 until n).map { i =>
      val lo = minUs + span * i / n
      val hi = if (i == n - 1) maxUs + 1 else minUs + span * (i + 1) / n
      df.filter(unix_micros(col("ts")) >= lo && unix_micros(col("ts")) < hi)
    }
  }

  /** Streaming semantic dedup ≡ the GREEDY first-arrival reference: the
    * int8-quantized embeddings (vec_id < 300, the q60 corpus) stream in
    * ascending-id order through [[StreamingSemanticDedup.dedup]] — one
    * coarse cell (a single centroid), PQ codes from the same synthetic
    * codebook as q60, an effectively-infinite suppression horizon — so
    * the kept set is exactly the greedy scan "keep unless SDC-cosine ≥
    * threshold against an already-kept row, ids ascending". The oracle
    * replays that greedy scan in SQL (recursive CTE over the pair list).
    * NOTE this is deliberately NOT q60's batch `semanticDedupEncoded`
    * contract: that one drops whole connected COMPONENTS (transitive),
    * the streaming operator is greedy (pairwise vs kept) — on a chain
    * a~b, b~c, a≁c batch keeps {a}, greedy keeps {a, c}. */
  def semanticDedupSurvivors(spark: SparkSession, dir: String,
                             cb: graft.operators.Pq.PqCodebook,
                             threshold: Double): DataFrame = {
    val in = scratch(spark, "semdedup_in")
    val src = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 300)
      .select(col("vec_id"),
        graft.operators.Quantize.quantizeInt8(col("embedding")).getField("q").as("vec"),
        timestamp_seconds(lit(1700000000L) + col("vec_id")).as("ts"))
      .cache()
    val dim = cb.m * cb.dsub
    writeOrderedChunks(spark, in, "semdedup", (0 until 4).map { i =>
      src.filter(col("vec_id") >= i * 75 && col("vec_id") < (i + 1) * 75)
    })
    src.unpersist()

    val qn = "graft_streampar_semdedup"
    spark.catalog.dropTempView(qn)
    runToCompletion(spark, chk =>
      StreamingSemanticDedup.dedup(
        spark.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in.getAbsolutePath),
        "vec_id", "vec", "ts",
        // one zero centroid: every row lands in cell 0, matching the
        // q60 corpus's single-cell framing
        centroids = Array((0, Array.fill(dim)(0.0))),
        cb, threshold, watermark = "1 minute",
        horizonMs = 1000L * 3600 * 24 * 3650)
        .toDF()
        .writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start(), "semdedup")

    spark.table(qn).select(col("id").as("vec_id")).orderBy(col("vec_id"))
  }

  /** Streaming as-of join ≡ batch as-of (q44's click→view shape): both
    * sides cut into ascending event-time range files (views PRE-deduped
    * per (user, µs) in batch — input prep, identical to q44's), each
    * side carrying a far-future sentinel (the GLOBAL watermark is the
    * min across the union's sides, so BOTH must advance for pending
    * lefts to flush). Matches project to q44's exact output shape, so
    * the q44 oracle SQL grades the streaming operator. */
  def asofSummary(spark: SparkSession, dir: String, eventsSchema: StructType): DataFrame = {
    import spark.implicits._
    val ev = spark.read.schema(eventsSchema).parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val (minUs, maxUs) = tsBounds(ev)
    val sentinelTs = new java.sql.Timestamp((maxUs / 1000) + 7200000L)

    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts")).cache()
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("v_eid"))
      .select(col("v_eid"), col("user_id"), col("ts")).cache()
    val inL = scratch(spark, "asof_in_left")
    val inR = scratch(spark, "asof_in_right")
    writeOrderedChunks(spark, inL, "asof_left", timeRangeChunks(clicks, minUs, maxUs, 6) :+
      Seq((-1L, -1L, sentinelTs)).toDF("event_id", "user_id", "ts"))
    writeOrderedChunks(spark, inR, "asof_right", timeRangeChunks(views, minUs, maxUs, 6) :+
      Seq((-1L, -1L, sentinelTs)).toDF("v_eid", "user_id", "ts"))
    clicks.unpersist()
    views.unpersist()

    val qn = "graft_streampar_asof"
    spark.catalog.dropTempView(qn)
    runToCompletion(spark, chk =>
      StreamingAsofJoin.asof(
        spark.readStream.schema(clicks.schema)
          .option("maxFilesPerTrigger", 1).parquet(inL.getAbsolutePath),
        "user_id", "ts", "event_id",
        spark.readStream.schema(views.schema)
          .option("maxFilesPerTrigger", 1).parquet(inR.getAbsolutePath),
        "user_id", "ts", "v_eid",
        watermark = "1 minute")
        .toDF()
        .writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start(), "asof")

    spark.table(qn)
      .filter(col("key") =!= -1L)
      .select(col("leftId").as("event_id"), col("key").as("user_id"),
        coalesce(col("rightId"), lit(-1L)).as("view_eid"),
        coalesce(col("leftTsUs") - col("rightTsUs"), lit(-1L)).as("dt_us"))
      .orderBy(col("event_id"))
  }

  /** Streaming curation ≡ batch curation, summarized order-free: the
    * documents table (with a synthetic event time) streams through
    * [[StreamingCuration.curate]] (quality gate → language tag →
    * `dropDuplicatesWithinWatermark` on the content fingerprint) in 4
    * micro-batches. WHICH doc survives a duplicate fingerprint depends
    * on arrival order, but every duplicate shares the TEXT (the
    * fingerprint is a content hash), so per-language survivor counts
    * and char sums are arrival-independent — those are the certified
    * output. All docs sit far inside the watermark horizon, so the
    * state never evicts mid-replay. */
  def curationSummary(spark: SparkSession, dir: String): DataFrame = {
    val in = scratch(spark, "curation_in")
    val src = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars"),
        timestamp_seconds(lit(1700000000L) + col("doc_id") % 100).as("ts"))
    src.repartition(4).write.mode("overwrite").parquet(in.getAbsolutePath)

    val qn = "graft_streampar_curation"
    spark.catalog.dropTempView(qn)
    runToCompletion(spark, chk =>
      StreamingCuration.curate(
        spark.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(in.getAbsolutePath),
        "ts", watermark = "1 hour", textCol = "text", minQuality = 0.1)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append")
        .option("checkpointLocation", chk)
        .start(), "curation")

    spark.table(qn)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
  }
}
