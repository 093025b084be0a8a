package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming gap-based sessionization via `flatMapGroupsWithState` — the
 * custom-state streaming operator the batch [[graft.operators.Sessionize]]
 * cannot express incrementally. Per key, open-session state (start,
 * last-event time, count) lives in the state store; an EVENT-TIME
 * timeout fires once the watermark passes lastTs + gap, emitting the
 * closed session and clearing the state — so state is bounded by the
 * number of concurrently-open sessions, never by history, which is the
 * requirement for an always-on stream.
 *
 * Late events (arriving after their session timed out) start a new
 * session rather than mutating an emitted one — standard
 * at-watermark-granularity streaming semantics. An out-of-order event
 * within `gap` of the OPEN session's start extends it backward
 * (start is lowered, exactly like batch); one more than a gap BEFORE
 * the open session is emitted as its own closed session immediately
 * (one open session per key is maintained, so a deeply-late island
 * cannot stay open waiting for even-later neighbors).
 */
object StreamingSessionize {

  final case class Event(key: Long, tsMs: Long)
  final case class OpenSession(startMs: Long, lastMs: Long, events: Long)
  final case class ClosedSession(key: Long, startMs: Long, endMs: Long, events: Long)

  /**
   * @param events  streaming Dataset of (key, event-time millis); the
   *                caller must have applied `withWatermark` on the
   *                event-time column feeding `tsMs` AND kept that
   *                watermarked column in the Dataset (otherwise Spark
   *                cannot pre-filter late rows; the timeout clamp below
   *                keeps the query alive, but deeply-late events then
   *                reach the merge logic) — [[sessionize]] does both
   * @param gapMs   a gap larger than this closes the session
   */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastMs + gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key, s.startMs, s.lastMs, s.events))
          } else {
            // fold this micro-batch's events (in time order) into the
            // open session, emitting any sessions the new events close
            val sorted = rows.toSeq.sortBy(_.tsMs)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            for (e <- sorted) {
              open = open match {
                // within gap of the open window on EITHER side (an
                // out-of-order event may precede the open start) —
                // merge, extending backward or forward as needed
                case Some(s) if e.tsMs >= s.startMs - gapMs && e.tsMs <= s.lastMs + gapMs =>
                  Some(OpenSession(math.min(s.startMs, e.tsMs),
                    math.max(s.lastMs, e.tsMs), s.events + 1))
                // more than a gap BEFORE the open session: its own
                // (already gap-closed) session — emit immediately
                case Some(s) if e.tsMs < s.startMs - gapMs =>
                  closed += ClosedSession(key, e.tsMs, e.tsMs, 1)
                  open
                // more than a gap after: the open session is over
                case Some(s) =>
                  closed += ClosedSession(key, s.startMs, s.lastMs, s.events)
                  Some(OpenSession(e.tsMs, e.tsMs, 1))
                case None =>
                  Some(OpenSession(e.tsMs, e.tsMs, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark proves no more events can extend
              // it; never below the current watermark (a late event can
              // put lastMs + gap in the past, which Spark rejects)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, s.lastMs + gapMs))
            }
            closed.result().iterator
          }
      }
  }

  /** Column-API convenience: (keyCol, event-time timestamp col) → closed
    * sessions. Applies the watermark needed by the event-time timeout. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapMs: Long, watermark: String): Dataset[ClosedSession] = {
    implicit val evEnc = Encoders.product[Event]
    sessions(
      df.withWatermark(tsCol, watermark)
        .select(col(keyCol).cast("long").as("key"),
          // integer `div` (floor), matching the engine-wide µs→ms
          // convention — `/` would double-divide and truncate toward 0
          expr(s"unix_micros(`$tsCol`) div 1000").as("tsMs"),
          col(tsCol)) // event-time column must survive for the watermark
        .as[Event],
      gapMs)
  }
}
