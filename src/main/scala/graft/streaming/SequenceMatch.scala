package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Relational.eventsSequenceMatch]]
  * (`events_sequence_match`): per-user conversion-pattern matching
  * (`cv*p` — click, any views, purchase) as INCREMENTAL state instead of
  * a collected path. The batch operator collects each user's full
  * event-char sequence and counts non-overlapping regex matches; at
  * streaming scale the path is unbounded, so this twin keeps O(1) state
  * per user — a 3-field automaton — and emits the summary when the
  * user's event-time falls a quiet-gap behind the watermark
  * (EventTimeTimeout), the same state-eviction discipline as
  * [[Sessionize]].
  *
  * The automaton IS the regex, scanned left to right: 'c' (re)arms a
  * candidate (the leftmost-match retry point), 'v' sustains it, 'p'
  * completes it (one conversion, disarm), anything else disarms — which
  * reproduces java.util.regex's non-overlapping leftmost semantics for
  * `cv*p` exactly (StreamingDemoSpec asserts stream/batch parity on a
  * fixture driven through MemoryStream).
  *
  * Ordering contract (shared with [[Sessionize]]): rows are folded in
  * event-time order WITHIN each micro-batch; cross-batch disorder inside
  * the watermark horizon is not re-sorted. A deployment needing total
  * order buffers rows in state until the watermark passes them —
  * bounded by the same horizon — at the cost of a larger state row. */
object SequenceMatch {

  final case class SeqEvent(user_id: Long, ts: Timestamp, event_type: String)
  final case class SeqState(
      inCand: Boolean, nEvents: Long, nConv: Long, sawError: Boolean,
      pathHead: String, lastUs: Long)
  final case class SeqOut(
      user_id: Long, n_events: Long, n_conversions: Long,
      saw_error: Boolean, path_head: String)

  /** Quiet gap after a user's last event (in event time) before their
    * summary is emitted and state dropped. */
  val QuietGapMinutes = 60

  def sequenceMatch(events: Dataset[SeqEvent]): Dataset[SeqOut] = {
    import events.sparkSession.implicits._

    def fold(s: SeqState, ch: Char, us: Long): SeqState = {
      val (inCand, conv) = ch match {
        case 'c' => (true, s.nConv)
        case 'v' => (s.inCand, s.nConv)
        case 'p' => (false, if (s.inCand) s.nConv + 1 else s.nConv)
        case _   => (false, s.nConv)
      }
      SeqState(
        inCand = inCand,
        nEvents = s.nEvents + 1,
        nConv = conv,
        sawError = s.sawError || ch == 'e',
        pathHead = if (s.pathHead.length < 20) s.pathHead + ch else s.pathHead,
        lastUs = math.max(s.lastUs, us))
    }

    events
      .withWatermark("ts", s"$QuietGapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SeqState, SeqOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SeqOut(uid, s.nEvents, s.nConv, s.sawError, s.pathHead))
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
            var s = state.getOption.getOrElse(
              SeqState(inCand = false, 0L, 0L, sawError = false, "", 0L))
            sorted.foreach { e =>
              s = fold(s, e.event_type.charAt(0), e.ts.getTime * 1000L)
            }
            state.update(s)
            state.setTimeoutTimestamp(
              s.lastUs / 1000L + QuietGapMinutes * 60L * 1000L)
            Iterator.empty
          }
      }
  }
}
