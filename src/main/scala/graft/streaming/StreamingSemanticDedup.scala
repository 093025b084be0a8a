package graft.streaming

import graft.operators.Pq
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming semantic deduplication over PQ codes — the streaming twin of
 * [[Pq.semanticDedupEncoded]], composing the [[StreamingCuration]]
 * always-on-ingest discipline with the encoded-corpus SDC scoring:
 *
 *  - the ENCODE stage is stateless Column math on the stream (native
 *    `pq_encode` kernels, codebooks as broadcast handles) — each
 *    arriving embedding becomes (cell, m-byte codes, reconstruction
 *    norm) exactly as in the batch path;
 *  - the DEDUP stage is `flatMapGroupsWithState` keyed by IVF cell:
 *    state holds only the KEPT rows' codes (m bytes + a norm per row)
 *    within the watermark horizon, so state is bounded by arrival rate
 *    × horizon, never by history — and pair scoring reads the broadcast
 *    m·ksub² SDC table, never float vectors.
 *
 * Semantics differ from batch BY NECESSITY: batch collapses transitive
 * near-dup components and keeps the min id; a stream cannot see a
 * component before its members arrive, so this is FIRST-SEEN-WINS —
 * a row is dropped iff some already-kept row in its cell within the
 * horizon scores ≥ threshold (greedy maximal independent set in arrival
 * order, the standard streaming-dedup contract; `StreamingSemanticDedupSpec`
 * pins stream ≡ the batch greedy reference on the same order). Rows in
 * different cells are never compared — the same bucketed-recall trade
 * as every encoded near-dup path here.
 */
object StreamingSemanticDedup {

  final case class EncodedDoc(id: Long, cent: Int, codes: Seq[Byte],
                              norm2: Double, tsMs: Long) // Seq[Byte] => ARRAY<TINYINT> (what pq_encode emits; Array[Byte] would demand BINARY)
  /** Kept rows of one cell, newest-last (id, codes, norm2, tsMs). */
  final case class CellState(kept: List[(Long, Seq[Byte], Double, Long)])

  /** SDC cosine between two code arrays — the same Σ table lookups /
    * (√na²·√nb²) association as the batch `pq_sdc_dot` scorer, so the
    * parity test can compare exact doubles. Returns NaN-free "not a
    * dup" (−∞) on zero/NaN norms, mirroring guardedCos's NULL. */
  private def sdcCos(table: Array[Double], ksub: Int,
                     a: Seq[Byte], na2: Double,
                     b: Seq[Byte], nb2: Double): Double = {
    var s = 0.0
    var j = 0
    while (j < a.length) {
      s += table((j * ksub + a(j)) * ksub + b(j))
      j += 1
    }
    val denom = math.sqrt(na2) * math.sqrt(nb2)
    if (denom.isNaN || denom == 0.0) Double.NegativeInfinity else s / denom
  }

  /**
   * Deduplicate a stream of embeddings against the recent past.
   *
   * @param docs       streaming DataFrame with (idCol, vecCol, tsCol)
   * @param centroids  IVF coarse centroids ([[graft.operators.Similarity.IvfIndex]]
   *                   `.centroids` — the build-once batch artifact)
   * @param cb         trained PQ codebook (build-once batch artifact)
   * @param threshold  SDC cosine at/above which a row is a near-dup
   * @param watermark  event-time watermark (late-data bound)
   * @param horizonMs  how long a kept row keeps suppressing near-dups;
   *                   state per cell is bounded by arrivals in this window
   * @return streaming Dataset of SURVIVING rows as [[EncodedDoc]] —
   *         (id, cell, codes) chains into the encoded-corpus operators,
   *         the batch [[Pq.semanticDedupEncoded]] convention
   */
  def dedup(docs: DataFrame, idCol: String, vecCol: String, tsCol: String,
            centroids: Array[(Int, Array[Double])], cb: Pq.PqCodebook,
            threshold: Double, watermark: String, horizonMs: Long): Dataset[EncodedDoc] = {
    require(centroids.nonEmpty && centroids.length <= 32768,
      "streaming dedup assigns cells with the native coarse kernel; 1..32768 cells")
    graft.Graft.register(docs.sparkSession)
    implicit val encDoc = Encoders.product[EncodedDoc]
    implicit val encState = Encoders.product[CellState]
    implicit val encInt = Encoders.scalaInt

    // byte codes to 128 cells, SMALLINT beyond — the batch
    // assignCentroid ladder, so stream cell ids == batch cell ids
    val coarseFn = if (centroids.length <= 128) "pq_encode" else "pq_encode_s"
    val coarseFlat = centroids.sortBy(_._1).flatMap(_._2)
    val encoded = docs.withWatermark(tsCol, watermark)
      .withColumn("__cent", element_at(call_function(coarseFn,
        col(vecCol), Pq.bArr(docs, coarseFlat), lit(1), lit(centroids.length)), 1).cast("int"))
      .withColumn("__codes", call_function("pq_encode",
        col(vecCol), Pq.bArr(docs, cb.flat), lit(cb.m), lit(cb.ksub)))
      .withColumn("__n2", call_function("pq_adc_dot",
        Pq.bArr(docs, cb.normLut), col("__codes")))
      // degenerate vectors (NULL/NaN/wrong dim) have NULL codes — they
      // can be neither kept nor compared; drop explicitly (the
      // probeAssign discipline)
      .filter(col("__cent").isNotNull && col("__codes").isNotNull && col("__n2").isNotNull)
      .select(col(idCol).cast("long").as("id"), col("__cent").as("cent"),
        col("__codes").as("codes"), col("__n2").as("norm2"),
        expr(s"unix_micros(`$tsCol`) div 1000").as("tsMs"),
        col(tsCol)) // event-time column must survive for the watermark
      .as[EncodedDoc]

    val table = docs.sparkSession.sparkContext.broadcast(cb.sdcTable)
    val ksub = cb.ksub
    encoded.groupByKey(_.cent)
      .flatMapGroupsWithState[CellState, EncodedDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (cent: Int, rows: Iterator[EncodedDoc], state: GroupState[CellState]) =>
          val wm = state.getCurrentWatermarkMs()
          // evict kept rows whose suppression window has fully passed
          val alive = state.getOption.map(_.kept.filter(_._4 + horizonMs > wm))
            .getOrElse(Nil)
          if (state.hasTimedOut) {
            if (alive.isEmpty) state.remove()
            else {
              state.update(CellState(alive))
              state.setTimeoutTimestamp(
                math.max(wm + 1, alive.map(_._4).min + horizonMs))
            }
            Iterator.empty
          } else {
            // deterministic within-batch order: (tsMs, id) — the batch
            // greedy reference sorts identically
            val batch = rows.toSeq.sortBy(d => (d.tsMs, d.id))
            var kept = alive
            val out = Seq.newBuilder[EncodedDoc]
            for (d <- batch) {
              // age check against the ARRIVING row's event time, not the
              // watermark: the watermark lags event time (delay + a batch,
              // or arbitrarily after a quiet period), so watermark-based
              // eviction alone would let a kept row suppress arrivals past
              // its horizon. Eviction above stays purely a state-size bound.
              // DELIBERATELY one-sided: an out-of-order arrival whose event
              // time is more than horizonMs OLDER than a kept row has a
              // negative delta and is still suppressed. In the batch-greedy
              // reference order that late row would have been processed
              // FIRST and the kept row suppressed by IT — emitting both now
              // would break the pairwise dedup guarantee, so dropping the
              // late twin is the conservative streaming approximation (its
              // lateness is already bounded by the watermark delay).
              val dup = kept.exists { case (_, c, n2, kts) =>
                d.tsMs - kts < horizonMs &&
                  sdcCos(table.value, ksub, d.codes, d.norm2, c, n2) >= threshold
              }
              if (!dup) {
                kept = (d.id, d.codes, d.norm2, d.tsMs) :: kept
                out += d
              }
            }
            if (kept.isEmpty) state.remove()
            else {
              state.update(CellState(kept))
              state.setTimeoutTimestamp(
                math.max(wm + 1, kept.map(_._4).min + horizonMs))
            }
            out.result().iterator
          }
      }
  }
}
