package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Session-bounded path n-grams as a CUSTOM-STATE streaming operator — the
  * streaming twin of [[graft.ext.EventAnalytics.topPaths]]'s extraction
  * half: one (user, gram-start, path) row per length-`n` event-type n-gram
  * that does not cross a session boundary, exactly once, in append mode.
  * The corpus-wide count + top-k is a plain aggregation over these facts —
  * downstream of the operator, exactly where the batch lane also
  * aggregates — and the parity spec checks both the fact multiset and the
  * aggregated top-k.
  *
  * Order discipline (the [[StreamingSessionize]] fold): events buffer per
  * user until FINAL (ts strictly below the watermark), then fold in batch
  * (ts, id) order. The per-user final sequence is APPEND-ONLY — every
  * admissible event has `ts ≥ watermark`, strictly above every final
  * event — so an emitted n-gram's members stay consecutive forever
  * (nothing can insert), sessions can never retroactively merge (bridging
  * needs an event BETWEEN two finals) or split (gaps between finals are
  * fixed), and each gram is emitted exactly once, the moment its last
  * member finalizes.
  *
  * State: the not-yet-final buffer (bounded by lateness × event rate) plus
  * the open session's last n−1 final events. Unlike [[StreamingFunnel]]'s
  * tombstone or [[StreamingRetention]]'s cohort there is NO cross-session
  * memory: once the watermark passes `end + gap` with nothing buffered,
  * any future event starts a fresh session anyway, so the key's state is
  * REMOVED outright — per-user state returns to zero by construction, no
  * TTL trade required (pinned in StreamingTopPathsSpec).
  */
object StreamingTopPaths {

  case class PEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      event_id: Long, event_type: String)

  /** open session end + its last ≤ n−1 final events (ts, id, type), plus
    * the not-yet-final buffer. */
  case class PState(open: Boolean, end: Long,
      tail: List[(Long, Long, String)], pending: List[(Long, Long, String)])

  /** One n-gram occurrence; (user_id, start_ts, start_id) is its
    * exactly-once identity (the gram's first event). */
  case class GramOut(user_id: Long, start_ts: Long, start_id: Long,
      path: String)

  private val emptyState = PState(open = false, 0L, Nil, Nil)

  /** `events` needs (user_id LONG, ts TIMESTAMP, event_id LONG,
    * event_type STRING); `gapUs` is the session gap in µs (over the exact
    * `unix_micros` long, like the batch lane's tick column). */
  def grams(events: DataFrame, gapUs: Long, n: Int,
      watermarkDelay: String): Dataset[GramOut] = {
    require(n >= 2, s"a path needs at least 2 steps, got $n")
    require(gapUs > 0, s"gapUs must be positive, got $gapUs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[PEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(n, gapUs) _)
  }

  private[streaming] def process(n: Int, gapUs: Long)(user: Long,
      it: Iterator[PEvent],
      state: GroupState[PState]): Iterator[GramOut] = {
    var st = state.getOption.getOrElse(emptyState)
    if (!state.hasTimedOut)
      st = st.copy(pending = it.foldLeft(st.pending) { (b, e) =>
        (e.ts_us, e.event_id, e.event_type) :: b
      })
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, pending) = st.pending.partition(_._1 < wmUs)
    val out = Seq.newBuilder[GramOut]
    ready.sortBy(e => (e._1, e._2)).foreach { case ev @ (ts, _, tp) =>
      if (st.open && ts - st.end > gapUs)
        st = st.copy(tail = Nil) // session break: grams never cross it
      // a full window of n−1 predecessors + this event = one n-gram.
      // A null type anywhere poisons the gram (batch parity: concat
      // null-propagates and the row is filtered), but still occupies its
      // position in the tail.
      if (st.tail.size == n - 1) {
        val types = st.tail.map(_._3) :+ tp
        if (types.forall(_ != null))
          out += GramOut(user, st.tail.head._1, st.tail.head._2,
            types.mkString(">"))
      }
      st = PState(open = true, end = math.max(st.end, ts),
        tail = (st.tail :+ ev).takeRight(n - 1), pending = Nil)
    }
    st = st.copy(pending = pending)
    if (pending.isEmpty && (!st.open || wmUs > st.end + gapUs)) {
      // nothing buffered and the session gap has passed: no future event
      // can extend this session, so the key's state is gone for good
      state.remove()
    } else {
      state.update(st)
      // wake when the earliest buffered event turns final and/or when the
      // open session's gap passes (the state-drop point); µs floored ONCE
      // to ms then +1 rounds up, clamped above the current watermark
      val targets =
        (if (pending.nonEmpty) Seq(pending.iterator.map(_._1).min / 1000L + 1L) else Nil) ++
          (if (st.open) Seq((st.end + gapUs) / 1000L + 1L) else Nil)
      state.setTimeoutTimestamp(
        math.max(targets.min, state.getCurrentWatermarkMs() + 1L))
    }
    out.result().iterator
  }
}
