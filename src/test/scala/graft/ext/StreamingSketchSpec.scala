package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming HLL: the register frame IS a streaming aggregate — groupBy(idx)
  * max(r) is bounded state (≤ 2^p rows forever, the reference's BUFFER_LEN
  * discipline applied to a sketch), so the distinct-count estimate runs
  * over an unbounded stream with constant memory. These specs pin that the
  * STREAMED sketch equals the batch sketch exactly (same registers, same
  * estimate), regardless of how the input is split into micro-batches —
  * the property that lets per-day sketches from a streaming job merge with
  * batch sketches (agg_hll_daily_merge) without a parity caveat. */
class StreamingSketchSpec extends SparkSpec {

  private def regMap(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("streamed register aggregation equals the batch sketch exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val values = (1 to 4000).map(i => s"user_${i % 731}")

    val input = MemoryStream[String]
    val regs = Hll.registers(input.toDF().toDF("v"), "v")
    val q = regs.writeStream.format("memory").queryName("sketch_out")
      .outputMode("complete").start()
    // three uneven micro-batches
    input.addData(values.take(100))
    q.processAllAvailable()
    input.addData(values.slice(100, 2500))
    q.processAllAvailable()
    input.addData(values.drop(2500))
    q.processAllAvailable()
    val streamed = regMap(spark.table("sketch_out"))
    q.stop()

    val batch = regMap(Hll.registers(values.toDF("v"), "v"))
    assert(streamed === batch, "streamed registers must equal the batch sketch")
    assert(streamed.size <= 256, "state exceeded the 2^p register bound")
  }

  test("micro-batch split does not move the sketch (order invariance)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val values = (1 to 1500).map(i => s"k$i")

    def run(batches: Seq[Seq[String]], name: String): Map[Long, Int] = {
      val input = MemoryStream[String]
      val q = Hll.registers(input.toDF().toDF("v"), "v")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val m = regMap(spark.table(name))
      q.stop()
      m
    }
    val a = run(Seq(values), "sk_a")
    val b = run(values.reverse.grouped(7).toSeq, "sk_b")
    assert(a === b, "sketch must be independent of arrival order and batching")
  }
}
