package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user running drawdown as a CUSTOM-STATE streaming operator — the
  * streaming twin of the `events_drawdown` batch lane (value vs the
  * running peak in (ts, id) order; the degradation monitor every
  * risk/metrics pipeline runs live).
  *
  * Order discipline: drawdown is ORDER-SENSITIVE (value − running-peak
  * depends on what preceded), so events buffer per user and fold only
  * once FINAL — timestamp strictly below the watermark — in the batch
  * (ts, id) total order, the same discipline as [[StreamingSessionize]] /
  * [[StreamingFunnel]]. Emission is UPDATE-mode snapshots: each fold that
  * advances a user's history emits that user's refreshed
  * (n_events, max_drawdown, peak_value) row; once the watermark passes a
  * user's last event, their latest snapshot equals the batch lane's FOLD
  * exactly — the same double max/min chain, no accumulation-order
  * exposure (the lane additionally rounds its two outputs at 6 decimals
  * for the oracle; pinned in StreamingDrawdownSpec). When the input
  * carries a `ts_ns` column, ties sort on the raw nanos like the batch
  * lane; otherwise on the derived µs. NOTE: the current fixture
  * generation emits ONLY µs-aligned nanos (`ts_ns % 1000 == 0`,
  * pinned by FixtureAuditSpec), so nanos-order and the DuckDB oracle's
  * `epoch_us(ts)` order coincide today; should a future generation add
  * true sub-µs precision, the ns-ordered batch lanes
  * (events_rolling_zscore / events_drawdown / events_gap_stats) and
  * their epoch_us oracles must be re-aligned deliberately.
  *
  * Scale: live state is THREE scalars + a counter per user; the only
  * unbounded-looking piece is the not-yet-final buffer, bounded by the
  * watermark delay × the user's event rate. One shuffle on user_id — the
  * batch lane's partitioning.
  */
object StreamingDrawdown {

  /** `ts_us` drives watermark finality; `ord` drives the tie sort (exact
    * ns when the caller provides ts_ns, else the same µs). */
  case class DrawEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      ord: Long, event_id: Long, value: Double)

  /** n = folded events; peak/worst meaningful once n > 0.
    * pending = (ts_us, ord, event_id, value) not yet final. */
  case class DrawState(n: Long, peak: Double, worst: Double,
      pending: List[(Long, Long, Long, Double)])

  case class DrawOut(user_id: Long, n_events: Long, max_drawdown: Double,
      peak_value: Double)

  private val emptyState = DrawState(0L, 0.0, 0.0, Nil)

  /** `events` needs (user_id LONG, ts TIMESTAMP, event_id LONG,
    * value DOUBLE); null values must be filtered by the caller (the batch
    * lane's `value IS NOT NULL` contract). */
  def drawdowns(events: DataFrame, watermarkDelay: String): Dataset[DrawOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val ord = if (events.columns.contains("ts_ns")) col("ts_ns")
      else unix_micros(col("ts"))
    events
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        ord.as("ord"), col("event_id"), col("value"))
      .withWatermark("ts", watermarkDelay)
      .as[DrawEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.EventTimeTimeout)(process _)
  }

  private[streaming] def process(user: Long, it: Iterator[DrawEvent],
      state: GroupState[DrawState]): Iterator[DrawOut] = {
    var st = state.getOption.getOrElse(emptyState)
    if (!state.hasTimedOut)
      st = st.copy(pending = it.foldLeft(st.pending) { (b, e) =>
        (e.ts_us, e.ord, e.event_id, e.value) :: b
      })
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, pending) = st.pending.partition(_._1 < wmUs)
    // fold the final prefix in batch (ord, id) order — monotone across
    // folds (everything already folded had ts below an earlier watermark),
    // so the running peak/min chain is exactly the batch window's
    ready.sortBy(e => (e._2, e._3)).foreach { case (_, _, _, v) =>
      val peak = if (st.n == 0L) v else math.max(st.peak, v)
      st = st.copy(n = st.n + 1, peak = peak,
        worst = if (st.n == 0L) v - peak else math.min(st.worst, v - peak))
    }
    st = st.copy(pending = pending)
    state.update(st)
    // flush buffered-but-final events even if this user gets no new data:
    // wake when the earliest pending event can turn final
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        pending.iterator.map(_._1).min / 1000L + 1L,
        state.getCurrentWatermarkMs() + 1L))
    if (ready.nonEmpty)
      Iterator.single(DrawOut(user, st.n, st.worst, st.peak))
    else Iterator.empty
  }
}
