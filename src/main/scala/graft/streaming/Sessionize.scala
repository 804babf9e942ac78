package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * hand-rolled equivalent of `session_window` (Events.sessions), kept as
  * the template for session logic the built-in can't express (per-session
  * aggregates beyond count/sum, early emission, session capping).
  *
  * State is keyed by user_id — the same shard key a streaming state store
  * uses; each group holds ONLY the open session (O(1) state per user), and
  * closed sessions are emitted incrementally.
  *
  * Batch vs streaming: in batch execution Spark invokes the function once
  * per group with all rows and then discards state, so the open session
  * must be flushed at the end (`finalizeOpen = true` — matches
  * session_window's batch output exactly; SessionizeSpec asserts it). In
  * a streaming query pass `finalizeOpen = false` and the open session
  * stays in state across micro-batches, closed by the event-time timeout.
  */
object Sessionize extends Serializable {

  case class Evt(user_id: Long, ts: Timestamp)
  case class OpenSession(start: Long, last: Long, n: Long)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Timestamp ↔ epoch-MICROS: `Timestamp.getTime` is millis and would
    * silently truncate the micro component event times carry (caught by
    * the differential gate: session bounds off by the sub-milli part).
    */
  private def toMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 finalizeOpen: Boolean = true): Dataset[Session] = {
    val gapUs = gapMinutes * 60L * 1000000L

    def close(uid: Long, s: OpenSession): Session =
      Session(uid, fromMicros(s.start), fromMicros(s.last + gapUs), s.n)

    def fn(uid: Long, rows: Iterator[Evt],
           state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(uid, _)).iterator
        state.remove()
        return out
      }
      // rows arrive unordered within the group — order by event time.
      // Bounded by the group's rows in this (micro-)batch, not all time.
      val sorted = rows.map(e => (e.user_id, toMicros(e.ts)))
        .toIndexedSeq.sortBy(_._2)
      val out = Seq.newBuilder[Session]
      var open = state.getOption
      sorted.foreach { case (_, t) =>
        open = open match {
          case Some(s) if t - s.last >= gapUs => // gap reached: close, start new
            out += close(uid, s)
            Some(OpenSession(t, t, 1))
          case Some(s) =>
            Some(OpenSession(s.start, math.max(s.last, t), s.n + 1))
          case None =>
            Some(OpenSession(t, t, 1))
        }
      }
      if (finalizeOpen) {
        open.foreach(out += close(uid, _))
        state.remove()
      } else {
        open.foreach { s =>
          val closeAtMs = s.last / 1000L + gapUs / 1000L
          val wm = state.getCurrentWatermarkMs()
          if (wm > 0 && closeAtMs <= wm) {
            // watermark already past the gap: no event can reopen it
            out += close(uid, s)
            state.remove()
          } else {
            state.update(s)
            // a timeout must sit beyond the current watermark
            state.setTimeoutTimestamp(math.max(closeAtMs, wm + 1))
          }
        }
      }
      out.result().iterator
    }

    events.select("user_id", "ts").as[Evt](Encoders.product[Evt])
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)(
        Encoders.product[OpenSession], Encoders.product[Session])
  }
}
