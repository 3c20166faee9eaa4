package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.model._

class StreamingFinalitySpec extends SparkSpec {

  private def blk(n: Long, finalHeight: Long = 0L): BlockScoped =
    BlockScoped(Clock(s"b$n", n, Timestamp.valueOf("2023-01-01 00:00:00")),
      s"c$n", finalHeight, Seq.empty)

  test("buffer state persists across micro-batches; undo drops buffered blocks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BlockMsg]
    val released = StreamingFinality.released(input.toDS())

    val query = released.writeStream
      .format("memory")
      .queryName("released_blocks")
      .outputMode("append")
      .start()

    // batch 1: blocks 1..6 non-final -> all buffered, nothing released
    input.addData((1L to 6L).map(n => BlockMsg.data(n, blk(n))))
    query.processAllAvailable()
    assert(spark.table("released_blocks").count() === 0)

    // batch 2: undo at 4 (drops 5,6), then blocks 5..8 re-delivered with
    // finality at 6 -> prefix 1..6 released
    input.addData(
      BlockMsg.undo(7, UndoSignal(4L, "c4")) +:
        (5L to 8L).map(n => BlockMsg.data(7 + n, blk(n, finalHeight = 6L))))
    query.processAllAvailable()
    val got = spark.table("released_blocks").select("clock.number").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    query.stop()
  }

  test("batch-mode replay matches the pure fold") {
    import spark.implicits._
    val msgs = (0L to 20L).map(n => BlockMsg.data(n, blk(n, finalHeight = n - 3)))
    val expected = graft.state.FinalityBuffer.run(msgs)._2.map(_.clock.number)
    val got = StreamingFinality.released(msgs.toDS())
      .select("clock.number").as[Long].collect().toSeq.sorted
    assert(got === expected.sorted)
    assert(got === (0L to 17L))
  }
}
