package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization as a CUSTOM-STATE streaming operator — the
  * streaming complement of [[graft.ext.EventAnalytics.sessionStats]], with
  * the one thing `session_window()` cannot express: the per-user 1-based
  * session INDEX (numbering is inherently sequential state across the
  * user's whole history, not a per-window aggregate).
  *
  * Shape: `flatMapGroupsWithState` keyed by user with EventTimeTimeout.
  * A user's open session lives in a tiny fixed-size state row (bounds,
  * count, distinct-type set — bounded by the event-type vocabulary, NOT
  * the event count); a session is emitted exactly once, when either
  *  - a same-user event arrives with gap exceeded (closes it inline), or
  *  - the watermark passes `end + gap` (the event-time timeout fires —
  *    no later on-time event can extend the session, because any event
  *    with `ts <= end + gap` would by then be beyond the watermark and
  *    dropped before reaching the operator).
  *
  * Scale: state is per-user O(1); the operator shuffles once on user_id
  * (the same partitioning the batch lane uses) and emissions are
  * append-mode, so downstream sinks see each session exactly once.
  * Emitted stats are exact integer µs — identical, row for row, to the
  * batch `sessionStats` on the same events once every session has closed
  * (pinned in StreamingSessionizeSpec).
  */
object StreamingSessionize {

  /** One event after projection: `ts` stays a Timestamp for the watermark,
    * `ts_us` is the exact µs long every comparison/bound uses. */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      event_id: Long, event_type: String)

  /** Per-user state: next session index + the open session, if any.
    * `types` is bounded by the event-type vocabulary. */
  case class SessState(nextIdx: Long, open: Boolean, start: Long, end: Long,
      n: Long, types: Set[String])

  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
      start_ts: Long, end_ts: Long, duration: Long, n_types: Long)

  private val emptyState = SessState(1L, open = false, 0L, 0L, 0L, Set.empty)

  /** `events` needs (user_id LONG, ts TIMESTAMP, event_id LONG,
    * event_type STRING). `watermarkDelay` is the lateness bound (e.g.
    * "10 minutes"); events later than it are dropped by the watermark,
    * exactly like every other watermarked operator here. */
  def sessions(events: DataFrame, gapUs: Long,
      watermarkDelay: String): Dataset[SessionOut] = {
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(gapUs) _)
  }

  private def emit(user: Long, st: SessState): SessionOut =
    SessionOut(user, st.nextIdx, st.n, st.start, st.end, st.end - st.start,
      st.types.size.toLong)

  private[streaming] def process(gapUs: Long)(user: Long,
      it: Iterator[SessEvent],
      state: GroupState[SessState]): Iterator[SessionOut] = {
    var st = state.getOption.getOrElse(emptyState)
    val out = Seq.newBuilder[SessionOut]
    if (state.hasTimedOut) {
      // watermark passed end + gap: the open session is final
      if (st.open) {
        out += emit(user, st)
        st = SessState(st.nextIdx + 1, open = false, 0L, 0L, 0L, Set.empty)
      }
      state.update(st)
      return out.result().iterator
    }
    // per-batch determinism regardless of upstream partitioning: same
    // (ts, id) total order the batch window uses
    it.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (!st.open)
        st = SessState(st.nextIdx, open = true, e.ts_us, e.ts_us, 1L,
          Set(e.event_type))
      else if (e.ts_us > st.end && e.ts_us - st.end > gapUs) {
        out += emit(user, st)
        st = SessState(st.nextIdx + 1, open = true, e.ts_us, e.ts_us, 1L,
          Set(e.event_type))
      } else
        // out-of-order but on-time (under the watermark delay): an event
        // with ts_us < end merges without regressing the bounds; one with
        // ts_us < start extends the session backwards — min/max keeps the
        // stats identical to the batch window over the same sorted events
        st = st.copy(start = math.min(st.start, e.ts_us),
          end = math.max(st.end, e.ts_us), n = st.n + 1,
          types = st.types + e.event_type)
    }
    state.update(st)
    if (st.open)
      // fire strictly after end + gap: floor the µs sum ONCE, then +1 ms
      // rounds up — flooring each term separately could fire up to 1 ms
      // early when the sub-ms remainders of end and gap sum to >= 1 ms
      state.setTimeoutTimestamp((st.end + gapUs) / 1000L + 1L)
    out.result().iterator
  }
}
