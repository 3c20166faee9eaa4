package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Strict ordered funnel as a CUSTOM-STATE streaming operator — the
  * streaming twin of [[graft.ext.EventAnalytics.funnelSteps]], row-for-row
  * parity once every user's anchor window has closed (pinned in
  * StreamingFunnelSpec). The reference is a streaming engine
  * (`/root/reference/src/substreams_stream.rs`); every batch analytics
  * lane gets a streaming twin.
  *
  * Shape: `flatMapGroupsWithState` keyed by user with EventTimeTimeout.
  * Because the batch fold is ORDER-SENSITIVE (an event can only fill step
  * k after the slot-(k-1) time), a user's step events are buffered until
  * the watermark passes `anchor + window` — only then is the funnel's
  * outcome final (an on-time late event could still re-order the fold) —
  * and the close-out replays the batch fold over the time-sorted buffer.
  *
  * State is bounded: the buffer holds only STEP-TYPE events (the upstream
  * filter), and a user with no anchor is garbage-collected as soon as the
  * watermark passes their newest buffered event — correct, not just
  * pragmatic: a slot-k (k ≥ 1) event only counts strictly AFTER the
  * anchor, so buffered events can only ever serve a late-arriving anchor
  * with a SMALLER timestamp, and once the watermark passes them no such
  * anchor can still arrive.
  *
  * Emission is append-mode, exactly once per anchored user, at event-time
  * `anchor + window` (the µs sum floored ONCE to ms, then +1 rounds up —
  * the StreamingSessionize lesson).
  */
object StreamingFunnel {

  case class FEvent(user_id: Long, ts: java.sql.Timestamp, ts_us: Long,
      m: Seq[Boolean])

  /** anchorUs = min ts of a step-0 event seen so far (MinValue = none);
    * buf = (ts_us, match-vector) of every buffered step event; done = this
    * user's funnel row has been emitted — a tombstone, because batch
    * parity means ONE row per user EVER: batch anchors on the user's first
    * step-0 event and ignores everything past anchor+window, so a later
    * step-0 must NOT re-anchor a second streaming row. The tombstone is a
    * few bytes per emitted user (bounded by user cardinality); with
    * `ttlUs` set it is dropped at the retention horizon — see [[funnel]]. */
  case class FState(anchorUs: Long, buf: List[(Long, Seq[Boolean])],
      done: Boolean = false)

  /** slots(k) = step-k entry time in µs, Long.MinValue = never reached */
  case class FOut(user_id: Long, slots: Seq[Long])

  private val NoTs = Long.MinValue

  /** `events` needs (userCol LONG, tsCol TIMESTAMP, typeCol STRING); step
    * times are exact µs. Output schema matches the batch `funnelSteps`:
    * (userCol, t0 .. t{n-1}) with nulls once the user drops out.
    *
    * `ttlUs`: optional retention horizon for the post-emission tombstone.
    * When set, a user's tombstone is DROPPED once the watermark passes
    * `anchor + window + ttl` — state truly returns to zero per departed
    * user (the bounded-state discipline of the reference's BUFFER_LEN=12
    * ring, `/root/reference/src/loader.rs:24`, applied to keyed state). The
    * trade, as in any retention-horizon TTL: a step-0 event arriving LATER
    * than the horizon re-anchors a fresh funnel row for that user, where
    * batch-over-the-full-log would have ignored it. Parity with batch
    * therefore holds exactly for logs whose per-user re-activity gap stays
    * under the horizon; `None` (default) keeps the tombstone forever and
    * is bit-parity unconditionally. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long,
      watermarkDelay: String, ttlUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    require(ttlUs.forall(_ > 0), s"ttlUs must be positive, got $ttlUs")
    val spark = events.sparkSession
    import spark.implicits._
    val n = steps.length
    val out = events
      .filter(col(typeCol).isin(steps.map(lit): _*)) // pushes into the scan
      .select(col(userCol).as("user_id"), col(tsCol).as("ts"),
        unix_micros(col(tsCol)).as("ts_us"),
        array(steps.map(s => col(typeCol) === s): _*).as("m"))
      .withWatermark("ts", watermarkDelay)
      .as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process(n, windowUs, ttlUs) _)
    out.select(col("user_id").as(userCol) +:
      (0 until n).map(i => when(element_at(col("slots"), i + 1) =!= NoTs,
        element_at(col("slots"), i + 1)).as(s"t$i")): _*)
  }

  /** The batch fold, replayed driver-free at close-out: identical to the
    * `functions.aggregate` merge in funnelSteps — every read goes against
    * the PREVIOUS accumulator, so an event can never satisfy a step whose
    * predecessor it just filled itself. */
  private[streaming] def fold(n: Int, windowUs: Long,
      buf: Seq[(Long, Seq[Boolean])]): Seq[Long] = {
    var acc = Vector.fill(n)(NoTs)
    buf.sortBy(_._1).foreach { case (ts, m) =>
      val anchor = acc(0)
      acc = Vector.tabulate(n) { i =>
        if (acc(i) != NoTs) acc(i)
        else if (i == 0) { if (m(0)) ts else NoTs }
        else if (m(i) && acc(i - 1) != NoTs && ts > acc(i - 1) &&
          anchor != NoTs && ts <= anchor + windowUs) ts
        else NoTs
      }
    }
    acc
  }

  /** Arms the tombstone-expiry timeout at `anchor + window + ttl` (clamped
    * above the watermark — Spark rejects a timeout at or below it). */
  private def armTtl(state: GroupState[FState], anchorUs: Long,
      windowUs: Long, ttl: Long): Unit =
    state.setTimeoutTimestamp(math.max(
      (anchorUs + windowUs + ttl) / 1000L + 1L,
      state.getCurrentWatermarkMs() + 1L))

  private[streaming] def process(n: Int, windowUs: Long,
      ttlUs: Option[Long] = None)(user: Long,
      it: Iterator[FEvent],
      state: GroupState[FState]): Iterator[FOut] = {
    if (state.hasTimedOut) {
      val st = state.get
      return if (st.anchorUs == NoTs || st.done) {
        // unanchored GC, or the tombstone's TTL horizon has passed: the
        // key's state returns to zero
        state.remove(); Iterator.empty
      } else {
        // the row is final: drop the buffer, keep the tombstone — forever
        // by default, until anchor+window+ttl when a horizon is set
        state.update(FState(st.anchorUs, Nil, done = true))
        ttlUs.foreach(armTtl(state, st.anchorUs, windowUs, _))
        Iterator.single(FOut(user, fold(n, windowUs, st.buf)))
      }
    }
    var st = state.getOption.getOrElse(FState(NoTs, Nil))
    if (st.done) {
      it.foreach(_ => ())
      // new data resets any pending timeout (Spark semantics) — re-arm the
      // TTL so the tombstone still expires
      ttlUs.foreach(armTtl(state, st.anchorUs, windowUs, _))
      return Iterator.empty
    }
    it.foreach { e =>
      st = FState(
        if (e.m(0)) math.min(if (st.anchorUs == NoTs) Long.MaxValue else st.anchorUs, e.ts_us)
        else st.anchorUs,
        (e.ts_us, e.m) :: st.buf)
    }
    state.update(st)
    // anchored: final at anchor + window. Unanchored: GC once the
    // watermark passes the newest buffered event (no usable anchor can
    // arrive after that). Clamp above the current watermark — Spark
    // rejects a timeout at or before it.
    val targetMs =
      if (st.anchorUs != NoTs) (st.anchorUs + windowUs) / 1000L + 1L
      else st.buf.iterator.map(_._1).max / 1000L + 1L
    state.setTimeoutTimestamp(
      math.max(targetMs, state.getCurrentWatermarkMs() + 1L))
    Iterator.empty
  }
}
