package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming point-in-time (as-of) join via `flatMapGroupsWithState` —
 * the streaming analogue of [[graft.operators.AsofJoin.asofBackward]]:
 * every left event is matched to the latest right event of the same key
 * with right ts ≤ left ts, under true EVENT-TIME semantics. A
 * stream-stream join cannot express "latest preceding" (it is an
 * argmax, not a predicate), and a processing-time lookup join silently
 * depends on arrival order; here a right event that arrives AFTER its
 * left (but within the watermark delay) still wins.
 *
 * Mechanics: both sides union into one keyed stream, timestamps kept at
 * MICROSECOND precision (ms truncation would let a right 700 µs after
 * its left win — batch parity holds at full precision). Left events
 * buffer in state until the watermark passes their timestamp STRICTLY
 * (an event AT the watermark may still arrive, so `<`, not `≤`, guards
 * both the flush and the compaction) — at that point every right event
 * at-or-before them has arrived — then emit their match. Right events
 * buffer likewise, COMPACTED at every invocation: among right events
 * strictly below the watermark only the latest can ever win for any
 * future (non-late) left, so state per key is bounded by the
 * out-of-orderness window — pending lefts + in-flight rights + ONE
 * compacted right — never by history. The one compacted right persists
 * per key (it IS the enrichment state; an always-on join needs the last
 * value per key by definition).
 *
 * Ties on right ts break toward the larger `rightId` — identical to the
 * batch operator under `rightOrder = id`, which is what the parity test
 * pins. Divergence from batch, documented: rows with a NULL key,
 * timestamp, or id are dropped on BOTH sides ([[asof]] filters them —
 * they would otherwise kill the always-on query at the non-nullable
 * encoder), where batch keeps NULL-key LEFT rows with a NULL match.
 * Deeply-late left events (strictly below the watermark on arrival,
 * only possible if the caller's watermark column was dropped) match
 * best-effort against the compacted state — at-watermark-granularity
 * semantics, the same family of caveat as [[StreamingSessionize]]'s
 * late-event handling.
 */
object StreamingAsofJoin {

  /** `side` 1 = left (probe), 0 = right (build). */
  final case class Ev(key: Long, tsUs: Long, side: Int, id: Long)
  final case class Pending(lefts: List[(Long, Long)], rights: List[(Long, Long)])
  /** `rightTsUs`/`rightId` are None when nothing precedes the left event
    * (the batch operator's NULL struct, without stealing -1 from the
    * caller's id space). */
  final case class Matched(key: Long, leftTsUs: Long, leftId: Long,
                           rightTsUs: Option[Long], rightId: Option[Long])

  def matches(events: Dataset[Ev]): Dataset[Matched] = {
    implicit val outEnc = Encoders.product[Matched]
    implicit val stEnc = Encoders.product[Pending]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Pending, Matched](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, rows: Iterator[Ev], state: GroupState[Pending]) =>
          // the watermark is exposed in ms; an event is LATE only when
          // strictly below it, so the µs cutoff below which no more
          // events can arrive is watermarkMs · 1000
          val wUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(Pending(Nil, Nil))
          if (!state.hasTimedOut) {
            val batch = rows.toSeq
            st = Pending(
              st.lefts ++ batch.collect { case e if e.side == 1 => (e.tsUs, e.id) },
              st.rights ++ batch.collect { case e if e.side == 0 => (e.tsUs, e.id) })
          }
          // flush every left STRICTLY below the watermark — its preceding
          // rights are all present now. Flush BEFORE compacting: when
          // one batch advances the watermark past several pending lefts,
          // those lefts still need rights the new watermark would
          // compact away (compaction's invariant is "no remaining left
          // below the threshold", true only after the flush)
          val (ready, still) = st.lefts.partition(_._1 < wUs)
          val out = ready.sorted.map { case (lts, lid) =>
            val cand = st.rights.filter(_._1 <= lts)
            if (cand.isEmpty) Matched(key, lts, lid, None, None)
            else { val (rts, rid) = cand.max; Matched(key, lts, lid, Some(rts), Some(rid)) }
          }
          // compact: among rights strictly below the watermark only the
          // latest (ties → larger id) can win for any remaining left
          val (old, recent) = st.rights.partition(_._1 < wUs)
          val rights = (if (old.nonEmpty) List(old.max) else Nil) ++ recent
          if (still.isEmpty && rights.isEmpty) state.remove()
          else {
            state.update(Pending(still, rights))
            // wake once the watermark strictly passes the earliest
            // pending left (ms-granularity ceiling); rights-only state
            // needs no timeout (it persists as the per-key enrichment
            // value)
            if (still.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs() + 1, still.map(_._1).min / 1000L + 1))
          }
          out.iterator
      }
  }

  /** Column-API convenience: two streaming DataFrames with timestamp
    * event-time columns → matched pairs. Applies the watermark both
    * sides (the event-time timeout and late-row pre-filtering need it;
    * note the GLOBAL watermark is the min across the two) and carries
    * ids as longs, mirroring [[StreamingSessionize]]. NULL key/ts/id
    * rows are dropped (see the class doc). */
  def asof(left: DataFrame, leftKey: String, leftTs: String, leftId: String,
           right: DataFrame, rightKey: String, rightTs: String, rightId: String,
           watermark: String): Dataset[Matched] = {
    implicit val evEnc = Encoders.product[Ev]
    def prep(df: DataFrame, k: String, t: String, id: String, side: Int) = df
      .withColumnRenamed(t, "__evt") // same name both sides BEFORE the
      .withWatermark("__evt", watermark) // watermark, so the union keeps it
      // try_cast, then filter the casts' NULLs: a malformed value must
      // be DROPPED — under ANSI a plain cast would abort the query, and
      // an unfiltered NULL would kill the non-nullable Ev encoder
      .select(col(k).try_cast("long").as("key"),
        expr("unix_micros(`__evt`)").as("tsUs"),
        lit(side).as("side"), col(id).try_cast("long").as("id"),
        col("__evt")) // event-time column must survive for the watermark
      .where(col("key").isNotNull && col("tsUs").isNotNull && col("id").isNotNull)
    matches(prep(left, leftKey, leftTs, leftId, 1)
      .unionByName(prep(right, rightKey, rightTs, rightId, 0)).as[Ev])
  }
}
