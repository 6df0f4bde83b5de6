package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via KeyValueGroupedDataset.flatMapGroupsWithState:
  * per-user session windows with an inactivity gap — the stateful
  * counterpart of the lag+cumsum batch model in
  * [[graft.ops.StreamingModel.sessionGap]] and the semantics of
  * `session_window(ts, gap)`, but with explicit state so the session can
  * carry arbitrary payload (counts here; at 100 TB the state store shards
  * by user across executors, and event-time timeouts bound state size).
  */
object Sessionize {

  final case class SessEvent(user_id: Long, ts: Timestamp)
  final case class SessState(startUs: Long, lastUs: Long, n: Int)
  final case class SessionOut(user_id: Long, start_us: Long, n_events: Int, duration_s: Long)

  def sessionize(events: Dataset[SessEvent], gapMinutes: Int): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def close(uid: Long, s: SessState): SessionOut =
      SessionOut(uid, s.startUs, s.n, (s.lastUs - s.startUs) / 1000000L)

    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SessEvent], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last-event + gap: the session can never be
            // extended again (late rows would be dropped upstream) → emit
            val out = close(uid, state.get)
            state.remove()
            Iterator.single(out)
          } else {
            val evs = rows.map(e => e.ts.getTime * 1000L).toSeq.sorted
            val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            evs.foreach { us =>
              cur = cur match {
                case Some(s) if us - s.lastUs <= gapUs =>
                  Some(s.copy(lastUs = math.max(s.lastUs, us), n = s.n + 1))
                case Some(s) =>
                  closed += close(uid, s)
                  Some(SessState(us, us, 1))
                case None => Some(SessState(us, us, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.iterator
          }
      }
  }
}
