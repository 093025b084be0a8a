package graft.streaming

import graft.Graft
import graft.ring.Triple
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming cofactor aggregation (no counterpart in the reference, which
 * is batch-only — SURVEY §2.3 notes triples are trivially mergeable, so
 * streaming maintenance is a natural extension of the ring):
 *
 *  - `windowed`: event-time windowed triples with a watermark — the
 *    standard Structured Streaming group-by path; the custom aggregate's
 *    serialized buffer lives in the state store between micro-batches.
 *  - `Incremental`: a foreachBatch sink that maintains one global triple
 *    on the driver by ring addition — O(triple) state, usable to retrain
 *    models continuously while the stream runs (the F-IVM pattern).
 */
object StreamingCofactor {

  /** Event-time windowed cofactor triples. `df` must be a streaming
    * DataFrame with an event-time column. */
  def windowed(df: DataFrame, tsCol: String, windowDuration: String, watermark: String,
               num: Seq[String], cat: Seq[String]): DataFrame = {
    Graft.register(df.sparkSession)
    val cols = num.map(c => col(c).cast("double")) ++ cat.map(c => col(c).cast("int"))
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(Graft.sumTriple(cols: _*).as("triple"))
  }

  /** Driver-side incremental triple maintenance over micro-batches.
    *
    * LIFETIME CONTRACT: one instance serves ONE streaming-query
    * LINEAGE (a query and its restarts from the same checkpoint, whose
    * batch ids continue monotonically). The replay guard below skips
    * `batchId <= lastApplied`, which makes at-least-once retries and
    * checkpoint-recovery replays exactly-once over this state — but a
    * NEW query (fresh checkpoint) restarts batch ids at 0, so feeding
    * it into a used instance would silently skip its early batches:
    * start each new query with a fresh Incremental (and fold the old
    * state in via `Triple.add` if a running total across queries is
    * wanted). */
  final class Incremental(num: Seq[String], cat: Seq[String]) extends Serializable {
    @volatile private var state: Triple = Triple.zero(num.length, cat.length)
    @volatile private var lastApplied: Long = -1L

    def current: Triple = state

    /** foreachBatch sink: aggregates the micro-batch (distributed) and
      * folds the one resulting triple into the running state (driver).
      * foreachBatch is AT-LEAST-ONCE — a recovered/retried micro-batch
      * re-invokes the sink with the same batchId, and ring addition is
      * not idempotent, so a replayed batch would double-fold its triple
      * (round-18 advice). Batch ids are monotonically increasing per
      * query, so skipping ids ≤ the last applied makes the fold
      * exactly-once over this in-memory state. */
    def sink(batch: DataFrame, batchId: Long): Unit = {
      if (batchId <= lastApplied) return
      val t = Graft.cofactor(batch, num, cat)
      if (t.n > 0) state = Triple.add(state, t)
      lastApplied = batchId
    }
  }
}
