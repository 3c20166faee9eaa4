package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** SCD-type-2 history as a CUSTOM-STATE streaming operator — the streaming
  * twin of [[graft.ext.EventAnalytics.scd2]]: closed validity intervals are
  * emitted exactly once, row-for-row identical to the batch lane's
  * `effective_to IS NOT NULL` rows over the same change log (pinned in
  * StreamingScd2Spec). The OPEN version (batch `is_current = true`) is
  * live operator state, not an emission — append mode cannot retract it,
  * and the reference's own latest-wins merge (`pipeline/ChangePipeline`
  * O10/O11) is the streaming answer for "current value"; this lane is the
  * audit-history side.
  *
  * Order discipline: SCD2 is wholly order-sensitive — a change event
  * landing between two folded events would rewrite every later version —
  * so events are buffered per key and folded only once FINAL, i.e. once
  * their timestamp is strictly below the watermark (any still-admissible
  * event has ts ≥ watermark). The fold replays the batch (ts, id) total
  * order with the same null-safe attribute comparison and version_id
  * tie-break. State is the open version + only the not-yet-final tail of
  * the buffer (bounded by the watermark delay × the key's change rate).
  */
object StreamingScd2 {

  case class ChangeEvent(key: Long, ts: java.sql.Timestamp, ts_us: Long,
      id: Long, attr: Option[String])

  /** open = the current (unclosed) version; buf = not-yet-final events */
  case class Scd2State(open: Option[(Option[String], Long, Long)],
      buf: List[(Long, Long, Option[String])])

  case class VersionOut(key: Long, attr: Option[String], effective_from: Long,
      effective_to: Long, version_id: Long)

  /** `changes` needs (keyCol LONG, tsCol TIMESTAMP, idCol LONG,
    * attrCol STRING). Emits closed versions with exact µs bounds. */
  def history(changes: DataFrame, keyCol: String, tsCol: String,
      idCol: String, attrCol: String, watermarkDelay: String): Dataset[VersionOut] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .select(col(keyCol).as("key"), col(tsCol).as("ts"),
        unix_micros(col(tsCol)).as("ts_us"), col(idCol).as("id"),
        col(attrCol).as("attr"))
      .withWatermark("ts", watermarkDelay)
      .as[ChangeEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(process _)
  }

  private[streaming] def process(key: Long, it: Iterator[ChangeEvent],
      state: GroupState[Scd2State]): Iterator[VersionOut] = {
    var st = state.getOption.getOrElse(Scd2State(None, Nil))
    if (!state.hasTimedOut)
      st = st.copy(buf = it.foldLeft(st.buf) { (b, e) =>
        (e.ts_us, e.id, e.attr) :: b
      })
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    // fold the FINAL prefix (ts strictly below the watermark) in batch
    // (ts, id) order; the rest stays buffered for a later watermark
    val (ready, pending) = st.buf.partition(_._1 < wmUs)
    val out = Seq.newBuilder[VersionOut]
    var open = st.open
    ready.sortBy(e => (e._1, e._2)).foreach { case (ts, id, attr) =>
      open match {
        case None => open = Some((attr, ts, id))
        case Some((curAttr, from, vid)) =>
          if (curAttr != attr) { // null-safe: Option equality is <=>
            out += VersionOut(key, curAttr, from, ts, vid)
            open = Some((attr, ts, id))
          } // unchanged attr: not a boundary, same as the batch filter
      }
    }
    state.update(Scd2State(open, pending))
    if (pending.nonEmpty)
      // reprocess when the watermark passes the newest pending event
      state.setTimeoutTimestamp(math.max(
        pending.iterator.map(_._1).max / 1000L + 1L,
        state.getCurrentWatermarkMs() + 1L))
    out.result().iterator
  }
}
