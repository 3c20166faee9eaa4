package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class MetricsListenerSpec extends SparkSpec {

  test("listener records per-batch input rows and duration") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new MetricsListener()
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[Int]
      val q = input.toDS().toDF("v").writeStream
        .format("memory").queryName("metrics_out").outputMode("append").start()
      input.addData(1 to 10: _*)
      q.processAllAvailable()
      input.addData(11 to 13: _*)
      q.processAllAvailable()
      q.stop()
      // listener delivery is async; allow it to drain
      val deadline = System.currentTimeMillis() + 10000
      while (listener.recent.map(_.numInputRows).sum < 13 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val batches = listener.recent.filter(_.numInputRows > 0)
      assert(batches.map(_.numInputRows).sum === 13)
      assert(batches.forall(_.durationMs >= 0))
    } finally spark.streams.removeListener(listener)
  }

  test("log format is env-switched like the reference LogConfig") {
    val m = MetricsListener.BatchMetric(7L, 100L, 2500.0, 40L)
    val dev = new MetricsListener(env = _ => None)
    assert(!dev.structured)
    assert(dev.formatLine(m) === "batch 7: 100 rows, 2500.0 rows/s, 40 ms")
    val prod = new MetricsListener(env = k => Option.when(k == "K_SERVICE")("svc"))
    assert(prod.structured)
    assert(prod.formatLine(m) ===
      """{"batch":7,"rows":100,"rows_per_sec":2500.0,"duration_ms":40}""")
    // Spark reports NaN rates on 0-row triggers; NaN is not valid JSON
    val nan = MetricsListener.BatchMetric(8L, 0L, Double.NaN, 0L)
    assert(prod.formatLine(nan) ===
      """{"batch":8,"rows":0,"rows_per_sec":null,"duration_ms":0}""")
  }
}
