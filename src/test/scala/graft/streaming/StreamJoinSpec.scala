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

  test("stream-static enrichment: broadcast dim join + windowed agg equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static dimension (the stream_enrich_static lane's shape): never
    // watermarked, re-read per micro-batch, broadcast onto the stream
    val dim = Seq((1L, "A"), (2L, "B"), (3L, "A"), (5L, "C"))
      .toDF("user_id", "segment")
    val rows = Seq(
      (1L, ts(1), 10.0), (2L, ts(2), 20.0), (3L, ts(8), 30.0),
      (4L, ts(9), 99.0), // no dim row -> dropped by the inner join
      (1L, ts(12), 5.0), (5L, ts(14), 7.0))
    val events = MemoryStream[(Long, Timestamp, Double)]
    val enriched = events.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
      .join(broadcast(dim), "user_id")
      .groupBy(window(col("ts"), "10 minutes"), col("segment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("window.start").as("win_start"), col("segment"), col("n"), col("sum_v"))
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    events.addData(rows.take(4): _*); q.processAllAvailable()
    events.addData(rows.drop(4): _*); q.processAllAvailable()
    events.addData((1L, ts(45), 1.0)); q.processAllAvailable() // close windows
    q.stop()
    val streamed = spark.table("enrich")
      .as[(Timestamp, String, Long, Double)].collect().sortBy(r => (r._1.getTime, r._2))
    val batch = rows.toDF("user_id", "ts", "value")
      .join(broadcast(dim), "user_id")
      .groupBy(window(col("ts"), "10 minutes"), col("segment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
      .select(col("window.start").as("win_start"), col("segment"), col("n"), col("sum_v"))
      .as[(Timestamp, String, Long, Double)].collect().sortBy(r => (r._1.getTime, r._2))
    assert(streamed.toSeq === batch.toSeq,
      "stream-static enrichment must equal the batch twin on closed windows")
    assert(streamed.nonEmpty && !streamed.exists(_._2 == null))
  }
}
