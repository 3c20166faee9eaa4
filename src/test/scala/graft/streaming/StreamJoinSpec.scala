package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream equi-join with watermarks + a time-range condition — the
  * remaining Structured Streaming surface beyond the reference's own needs
  * (its only join analog is the broadcast schema lookup). State on both
  * sides is bounded by the watermark/range bound. */
class StreamJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 12:$minute%02d:00")

  test("stream-stream join matches clicks to impressions within the window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]

    val imp = impressions.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "10 minutes")
    val clk = clicks.toDF().toDF("c_ad_id", "click_ts").withWatermark("click_ts", "10 minutes")

    val joined = imp.join(clk,
      col("ad_id") === col("c_ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 5 MINUTES"))
      .select(col("ad_id"), col("imp_ts"), col("click_ts"))

    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()

    impressions.addData((1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
    clicks.addData((1L, ts(3)), (2L, ts(9)), (4L, ts(4))) // 2 clicks too late/no imp
    q.processAllAvailable()

    val got = spark.table("attrib").as[(Long, Timestamp, Timestamp)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L), s"only ad 1 clicked within 5 min, got $got")
    q.stop()
  }
}
