package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{BlockMsg, BlockScoped}
import graft.state.FinalityBuffer
import graft.state.FinalityBuffer.BufferState

/** The finality buffer as a Structured Streaming stateful operator.
  *
  * The chain is one totally-ordered stream (the reference consumes it in a
  * single sequential task, `src/main.rs:208-231`), so the state lives under
  * ONE group key. That is not a scalability bug: messages are tiny envelope
  * rows, the state is a bounded 12-deep queue, and all heavy work (decode,
  * cast, write) happens AFTER release, where the released blocks fan back
  * out across the cluster. Per-batch the group sorts by `seq` so replay
  * order is deterministic regardless of upstream partitioning.
  */
object StreamingFinality {

  /** Works on both streaming and batch Datasets (same plan either way). */
  def released(msgs: Dataset[BlockMsg]): Dataset[BlockScoped] = {
    val spark: SparkSession = msgs.sparkSession
    import spark.implicits._
    msgs.groupByKey(_ => "chain")
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(process _)
  }

  private[streaming] def process(
      key: String,
      it: Iterator[BlockMsg],
      state: GroupState[BufferState]): Iterator[BlockScoped] = {
    var st = state.getOption.getOrElse(FinalityBuffer.empty)
    val out = Seq.newBuilder[BlockScoped]
    it.toSeq.sortBy(_.seq).foreach { msg =>
      val (st2, rel) = FinalityBuffer.step(st, msg)
      st = st2
      out ++= rel
    }
    state.update(st)
    out.result().iterator
  }
}
