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
  * Shape: `flatMapGroupsWithState` keyed by user with EventTimeTimeout,
  * under the same order discipline as [[StreamingFunnel]]/[[StreamingScd2]]:
  * sessionization is ORDER-SENSITIVE (an out-of-order on-time event can
  * bridge what looked like a gap), so events are buffered per user and
  * folded only once FINAL — timestamp strictly below the watermark —
  * in the batch (ts, id) total order. Within a fold, a gap-triggered
  * close is provably final: the closing event has `ts < watermark` and
  * `ts > end + gap`, so every still-admissible event (`ts ≥ watermark`)
  * is also past `end + gap`. The residual open session closes when the
  * watermark passes `end + gap`. Emissions are append-mode, exactly once.
  *
  * Scale: state is the open session (O(1): bounds, count, type set
  * bounded by the vocabulary) plus only the NOT-yet-final buffer tail
  * (bounded by the watermark delay × the user's event rate); the operator
  * shuffles once on user_id, the same partitioning the batch lane uses.
  * Emitted stats are exact integer µs — identical, row for row, to the
  * batch `sessionStats` on the same events once every session has closed
  * (pinned in StreamingSessionizeSpec, including out-of-order batches).
  */
object StreamingSessionize {

  /** One event after projection: `ts` stays a Timestamp for the watermark,
    * `ts_us` is the exact µs long every comparison/bound uses. */
  case class SessEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      event_id: Long, event_type: String)

  /** Per-user state: next session index + the open session, if any, plus
    * the not-yet-final event buffer. `types` is bounded by the event-type
    * vocabulary. */
  case class SessState(nextIdx: Long, open: Boolean, start: Long, end: Long,
      n: Long, types: Set[String], pending: List[(Long, Long, String)])

  case class SessionOut(user_id: Long, session_idx: Long, n_events: Long,
      start_ts: Long, end_ts: Long, duration: Long, n_types: Long)

  private val emptyState =
    SessState(1L, open = false, 0L, 0L, 0L, Set.empty, Nil)

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
    if (!state.hasTimedOut)
      st = st.copy(pending = it.foldLeft(st.pending) { (b, e) =>
        (e.ts_us, e.event_id, e.event_type) :: b
      })
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // fold the FINAL prefix in batch (ts, id) order. Events are monotone
    // ACROSS folds too: everything folded before had ts < the previous
    // watermark, and this fold's events were held back precisely because
    // their ts reached it — so `e.ts >= open.end` always, and the plain
    // batch gap test is exact.
    val (ready, pending) = st.pending.partition(_._1 < wmUs)
    val out = Seq.newBuilder[SessionOut]
    ready.sortBy(e => (e._1, e._2)).foreach { case (ts, _, tp) =>
      if (!st.open)
        st = st.copy(open = true, start = ts, end = ts, n = 1L, types = Set(tp))
      else if (ts - st.end > gapUs) {
        out += emit(user, st) // final: see the class doc's proof
        st = SessState(st.nextIdx + 1, open = true, ts, ts, 1L, Set(tp), Nil)
      } else
        st = st.copy(end = math.max(st.end, ts), n = st.n + 1,
          types = st.types + tp)
    }
    // the residual open session is final once the watermark passes
    // end + gap: every pending/future event (ts >= watermark) is then
    // beyond the gap and will open the next session when it finalizes
    if (st.open && wmUs > st.end + gapUs) {
      out += emit(user, st)
      st = SessState(st.nextIdx + 1, open = false, 0L, 0L, 0L, Set.empty, Nil)
    }
    st = st.copy(pending = pending)
    state.update(st)
    // wake when the watermark can next change the picture: the open
    // session's close point and/or the earliest buffered event turning
    // final (µs sums floored ONCE, +1 ms rounds up; clamped above the
    // current watermark — Spark rejects a timeout at or before it)
    val targets =
      (if (st.open) Seq((st.end + gapUs) / 1000L + 1L) else Nil) ++
        (if (pending.nonEmpty) Seq(pending.iterator.map(_._1).min / 1000L + 1L) else Nil)
    if (targets.nonEmpty)
      state.setTimeoutTimestamp(
        math.max(targets.min, state.getCurrentWatermarkMs() + 1L))
    out.result().iterator
  }
}
