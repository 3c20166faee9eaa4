package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cohort-retention FACTS as a CUSTOM-STATE streaming operator — the
  * streaming twin of [[graft.ext.EventAnalytics.retention]]'s first half:
  * one (user_id, cohort_day, day_offset) row per distinct active day of
  * each user, exactly once, in append mode. The batch lane's rollup
  * (n_active per (cohort_day, day_offset), cohort sizes, retained ratio)
  * is a plain aggregation over these facts — downstream of the operator,
  * exactly where the batch lane also aggregates — and the parity spec
  * checks both the fact set and the aggregated rollup.
  *
  * Order discipline: a user's cohort is their MINIMUM active day, so a
  * fact's `day_offset` is only final once no admissible event can lower
  * the cohort. An event lowering it must carry `ts < cohortDayStart`, and
  * such an event is only admissible while `watermark < cohortDayStart` —
  * so facts are held until the watermark reaches the start of the cohort
  * day (typically one watermark advance), then the backlog flushes and
  * every later new-day fact emits as it arrives. New days can never
  * retract (a day is active once ANY event lands on it), so no buffering
  * beyond the cohort gate is needed.
  *
  * State: cohort day + the set of days already emitted, PRUNED each pass
  * to the still-receivable window — a day d can only gain events while
  * the watermark is below the day's end, so once `(d+1)·day ≤ watermark`
  * its dedup entry can never be consulted again and is dropped. The set
  * is therefore bounded by the lateness window in days (not stream
  * lifetime); what remains per departed user is one cohort long (the
  * [[StreamingFunnel]] tombstone trade). With `ttlUs` set, even that
  * residue is dropped once the watermark passes the user's last active
  * day plus the horizon — see [[facts]].
  */
object StreamingRetention {

  case class RetEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long)

  /** cohortDay = min active day seen (MaxValue = none); pendingDays = days
    * observed but not yet emitted; emittedDays = facts already out;
    * lastDay = max active day seen (MaxValue = none) — the TTL anchor. */
  case class RetState(cohortDay: Long, pendingDays: Set[Long],
      emittedDays: Set[Long], lastDay: Long = Long.MaxValue)

  case class FactOut(user_id: Long, cohort_day: Long, day_offset: Long)

  private val DayUs = 86400L * 1000000L
  private val NoDay = Long.MaxValue

  /** `ttlUs`: optional retention horizon for the per-departed-user residue
    * (the cohort entry that otherwise lives forever — see class doc). When
    * set, a user's state is DROPPED once the watermark passes
    * `end of their last active day + ttl`. The trade: a user who returns
    * AFTER the horizon is re-cohorted at their return day (their original
    * cohort is forgotten), where batch-over-the-full-log keeps the original
    * cohort — the standard retention-analysis horizon semantics. `None`
    * (default) keeps the cohort entry forever and is parity unconditionally. */
  def facts(events: DataFrame, userCol: String, tsCol: String,
      watermarkDelay: String, ttlUs: Option[Long] = None): Dataset[FactOut] = {
    require(ttlUs.forall(_ > 0), s"ttlUs must be positive, got $ttlUs")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col(userCol).as("user_id"), col(tsCol).as("ts"),
        unix_micros(col(tsCol)).as("ts_us"))
      .withWatermark("ts", watermarkDelay)
      .as[RetEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(ttlUs) _)
  }

  private[streaming] def process(ttlUs: Option[Long] = None)(user: Long,
      it: Iterator[RetEvent],
      state: GroupState[RetState]): Iterator[FactOut] = {
    var st = state.getOption.getOrElse(RetState(NoDay, Set.empty, Set.empty))
    if (!state.hasTimedOut)
      it.foreach { e =>
        val day = Math.floorDiv(e.ts_us, DayUs)
        st = RetState(math.min(st.cohortDay, day),
          if (st.emittedDays.contains(day)) st.pendingDays
          else st.pendingDays + day,
          st.emittedDays,
          if (st.lastDay == NoDay) day else math.max(st.lastDay, day))
      }
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val out = Seq.newBuilder[FactOut]
    if (st.cohortDay != NoDay && wmUs >= st.cohortDay * DayUs) {
      // cohort final: flush every pending day (sorted for a deterministic
      // within-batch emission order; the SET is what parity is about)
      st.pendingDays.toSeq.sorted.foreach { day =>
        out += FactOut(user, st.cohortDay, day - st.cohortDay)
      }
      // keep only dedup entries for days that can still receive events
      // (day end above the watermark) — the state bound, see class doc
      st = RetState(st.cohortDay, Set.empty,
        (st.emittedDays ++ st.pendingDays).filter(d => (d + 1) * DayUs > wmUs),
        st.lastDay)
      ttlUs match {
        case Some(ttl) =>
          // TTL anchor: end of the last active day, plus the horizon
          val deadlineUs = (st.lastDay + 1) * DayUs + ttl
          if (wmUs >= deadlineUs) {
            // horizon passed with no new activity: the key's state returns
            // to zero (a later return re-cohorts — see facts() doc)
            state.remove()
            return out.result().iterator
          }
          // new data resets any pending timeout (Spark semantics) — arm,
          // and re-arm on every pass, the expiry wake
          state.setTimeoutTimestamp(math.max(deadlineUs / 1000L + 1L,
            state.getCurrentWatermarkMs() + 1L))
        case None => // residue kept forever: unconditional parity
      }
    } else if (st.cohortDay != NoDay)
      // wake when the watermark reaches the cohort day's start
      state.setTimeoutTimestamp(math.max(
        st.cohortDay * DayUs / 1000L + 1L,
        state.getCurrentWatermarkMs() + 1L))
    state.update(st)
    out.result().iterator
  }
}
