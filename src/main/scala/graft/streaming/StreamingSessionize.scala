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

  final case class Event(key: Long, tsUs: Long)
  final case class OpenSession(startUs: Long, lastUs: Long, events: Long)
  final case class ClosedSession(key: Long, startUs: Long, endUs: Long, events: Long)

  /**
   * State and gap arithmetic run in MICROSECONDS — the engine-wide
   * event-time resolution (round-18 advice: the former millisecond
   * state truncated each event's µs before comparing, so an event gap
   * within 1 ms of the boundary could split or merge differently from
   * the batch operator's µs arithmetic; only Spark's watermark/timeout
   * API, which is ms-domain by contract, sees rounded values — and
   * only ever rounded UP, which can merely delay a close, never
   * mis-compose a session).
   *
   * @param events  streaming Dataset of (key, event-time micros); the
   *                caller must have applied `withWatermark` on the
   *                event-time column feeding `tsUs` AND kept that
   *                watermarked column in the Dataset (otherwise Spark
   *                cannot pre-filter late rows; the timeout clamp below
   *                keeps the query alive, but deeply-late events then
   *                reach the merge logic) — [[sessionize]] does both
   * @param gapUs   a gap larger than this (in µs) closes the session
   */
  def sessions(events: Dataset[Event], gapUs: Long): Dataset[ClosedSession] = {
    implicit val closedEnc = Encoders.product[ClosedSession]
    implicit val openEnc = Encoders.product[OpenSession]
    implicit val longEnc = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the open session is closed
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key, s.startUs, s.lastUs, s.events))
          } else {
            // fold this micro-batch's events (in time order) into the
            // open session, emitting any sessions the new events close
            val sorted = rows.toSeq.sortBy(_.tsUs)
            var open = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            for (e <- sorted) {
              open = open match {
                // within gap of the open window on EITHER side (an
                // out-of-order event may precede the open start) —
                // merge, extending backward or forward as needed
                case Some(s) if e.tsUs >= s.startUs - gapUs && e.tsUs <= s.lastUs + gapUs =>
                  Some(OpenSession(math.min(s.startUs, e.tsUs),
                    math.max(s.lastUs, e.tsUs), s.events + 1))
                // more than a gap BEFORE the open session: its own
                // (already gap-closed) session — emit immediately
                case Some(s) if e.tsUs < s.startUs - gapUs =>
                  closed += ClosedSession(key, e.tsUs, e.tsUs, 1)
                  open
                // more than a gap after: the open session is over
                case Some(s) =>
                  closed += ClosedSession(key, s.startUs, s.lastUs, s.events)
                  Some(OpenSession(e.tsUs, e.tsUs, 1))
                case None =>
                  Some(OpenSession(e.tsUs, e.tsUs, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              // fire once the watermark proves no more events can extend
              // it; never below the current watermark (a late event can
              // put last + gap in the past, which Spark rejects). The
              // timeout API is ms-domain: round the µs deadline UP so a
              // watermark that passes it proves wm·1000 > lastUs+gapUs —
              // no admissible event can still extend the session.
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1,
                  (s.lastUs + gapUs) / 1000 + 1))
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
          // full µs resolution into the state — the gap compares in µs
          expr(s"unix_micros(`$tsCol`)").as("tsUs"),
          col(tsCol)) // event-time column must survive for the watermark
        .as[Event],
      math.multiplyExact(gapMs, 1000L))
  }
}
