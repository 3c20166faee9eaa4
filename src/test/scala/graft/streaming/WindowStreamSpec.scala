package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming window + watermark semantics: append-mode emission only after
  * the watermark passes a window's end, and late rows beyond the watermark
  * are dropped. (The batch equivalents of these plans are oracle-checked via
  * the stream_* queries.) */
class WindowStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 10:$minute%02d:00")

  test("tumbling window with watermark finalizes on advance; late data dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .select(col("window.start").as("start"), col("n"), col("s"))

    val q = agg.writeStream.format("memory").queryName("win_out").outputMode("append").start()

    // window [10:00,10:10): 2 events; then event at 10:16 pushes watermark to
    // 10:11 > 10:10 -> first window finalizes
    input.addData((ts(1), 1.0), (ts(4), 2.0))
    q.processAllAvailable()
    input.addData((ts(16), 4.0))
    q.processAllAvailable()
    val afterAdvance = spark.table("win_out").as[(Timestamp, Long, Double)].collect()
    assert(afterAdvance.toSeq === Seq((ts(0), 2L, 3.0)))

    // late event at 10:03 (< watermark 10:11) must be DROPPED, not revive the
    // closed window; on-time event at 10:17 keeps the open window growing
    input.addData((ts(3), 100.0), (ts(17), 8.0))
    q.processAllAvailable()
    // push watermark past 10:20 to close the second window
    input.addData((ts(27), 0.5))
    q.processAllAvailable()
    val all = spark.table("win_out").as[(Timestamp, Long, Double)].collect().sortBy(_._1.getTime)
    assert(all.toSeq === Seq((ts(0), 2L, 3.0), (ts(10), 2L, 12.0)))
    q.stop()
  }
}
