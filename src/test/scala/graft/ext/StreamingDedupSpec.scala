package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 09:$minute%02d:00")

  test("streaming exact dedup drops duplicates within the watermark window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = Dedup.streamingExactDedup(
      input.toDF().toDF("ts", "text"), "text", "ts", "10 minutes")

    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    // batch 1: two distinct texts + one duplicate
    input.addData((ts(0), "alpha doc"), (ts(1), "beta doc"), (ts(2), "alpha doc"))
    q.processAllAvailable()
    // batch 2: duplicate arriving in a later batch is still dropped
    input.addData((ts(3), "beta doc"), (ts(4), "gamma doc"))
    q.processAllAvailable()
    val texts = spark.table("dedup_out").select("text").as[String].collect().sorted
    assert(texts.toSeq === Seq("alpha doc", "beta doc", "gamma doc"))
    q.stop()
  }
}
