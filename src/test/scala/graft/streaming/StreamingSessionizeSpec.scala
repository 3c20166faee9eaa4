package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.EventAnalytics

/** Custom-state streaming sessionization: append-mode exactly-once session
  * emission (gap close inline, watermark close via event-time timeout),
  * bit-for-bit parity with the batch sessionStats on the same events. */
class StreamingSessionizeSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 10:$minute%02d:00")
  private val gapUs = 10L * 60L * 1000000L // 10 minutes

  private def runStream(batches: Seq[Seq[(Long, Timestamp, Long, String)]],
      name: String, watermarkDelay: String = "0 seconds")
      : Map[(Long, Long), (Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamingSessionize.sessions(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      gapUs, watermarkDelay)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
  }

  test("sessions close on gap inline and on watermark timeout; numbering is sequential") {
    // user 1: events at 10:00, 10:05 (one session), then 10:30 (gap > 10 min
    // -> session 2); user 2: single event at 10:02
    val sessions = runStream(Seq(
      Seq((1L, ts(0), 1L, "view"), (1L, ts(5), 2L, "click"), (2L, ts(2), 3L, "view")),
      // 10:30 closes user 1's first session INLINE (gap exceeded) and opens
      // session 2; watermark advances to 10:30
      Seq((1L, ts(30), 4L, "purchase")),
      // sentinel far-future event (user 99) pushes the watermark past every
      // open session's end + gap -> timeouts fire for users 1 and 2
      Seq((99L, ts(59), 9L, "view"))
    ), "sess_out")

    def us(m: Int): Long = ts(m).getTime * 1000L
    assert(sessions((1L, 1L)) === ((2L, us(0), us(5), us(5) - us(0), 2L)))
    assert(sessions((1L, 2L)) === ((1L, us(30), us(30), 0L, 1L)))
    assert(sessions((2L, 1L)) === ((1L, us(2), us(2), 0L, 1L)))
    // user 99's session is still open (nothing advanced the watermark past
    // it) — append mode must NOT have emitted it
    assert(!sessions.keySet.exists(_._1 == 99L))
  }

  test("out-of-order on-time events merge without regressing session bounds") {
    import spark.implicits._
    // batch 1 delivers 10:05 first; batch 2 delivers 10:00 and 10:03 LATE
    // but on time under the 10-minute watermark delay (watermark after
    // batch 1 is 09:55) — they must extend start backwards and leave end
    // alone, and the timeout must still fire at end + gap, not earlier
    val streamed = runStream(Seq(
      Seq((1L, ts(5), 2L, "click")),
      Seq((1L, ts(0), 1L, "view"), (1L, ts(3), 3L, "view")),
      Seq((99L, ts(59), 99L, "view"))
    ), "sess_ooo", watermarkDelay = "10 minutes")

    def us(m: Int): Long = ts(m).getTime * 1000L
    assert(streamed((1L, 1L)) === ((3L, us(0), us(5), us(5) - us(0), 2L)))

    val batch = EventAnalytics.sessionStats(
      Seq((1L, ts(0), 1L, "view"), (1L, ts(3), 3L, "view"), (1L, ts(5), 2L, "click"))
        .toDF("user_id", "ts", "event_id", "event_type")
        .withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id", "event_type", gapUs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(streamed((1L, 1L)) === batch((1L, 1L)))
  }

  test("a late bridging event merges sessions an eager close would have split") {
    // gap 10 min, delay 10 min. 10:20 arrives; then 10:31 (11 min later —
    // LOOKS like a new session); then 10:25 arrives late but on time and
    // BRIDGES the two. The watermark-final fold must produce ONE session
    // [10:20, 10:31] n=3 — the eager-inline-close design emitted
    // [10:20, 10:20] + [10:25, 10:31] here.
    val streamed = runStream(Seq(
      Seq((1L, ts(20), 1L, "view")),
      Seq((1L, ts(31), 2L, "click")),
      Seq((1L, ts(25), 3L, "view")),
      Seq((99L, Timestamp.valueOf("2023-01-01 11:30:00"), 99L, "view"))
    ), "sess_bridge", watermarkDelay = "10 minutes")
    def us(m: Int): Long = ts(m).getTime * 1000L
    assert(streamed((1L, 1L)) === ((3L, us(20), us(31), us(31) - us(20), 2L)))
    assert(!streamed.keySet.exists(k => k._1 == 1L && k._2 == 2L),
      "no phantom second session")
    val batch = EventAnalytics.sessionStats(
      {
        import spark.implicits._
        Seq((1L, ts(20), 1L, "view"), (1L, ts(25), 3L, "view"), (1L, ts(31), 2L, "click"))
          .toDF("user_id", "ts", "event_id", "event_type")
          .withColumn("ts_us", unix_micros(col("ts")))
      },
      "user_id", "ts_us", "event_id", "event_type", gapUs)
      .as[(Long, Long, Long, Long, Long, Long, Long)](
        org.apache.spark.sql.Encoders.product).collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(streamed((1L, 1L)) === batch((1L, 1L)))
  }

  test("randomized: shuffled-arrival sessions equal batch once the horizon passes") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(12).toLong + 1L, ts(rnd.nextInt(50)), i.toLong,
        Seq("view", "click", "purchase")(rnd.nextInt(3)))
    }
    // 3 shuffled batches under a 2-hour delay (nothing late), then a
    // far-future sentinel closes every session
    val shuffled = rnd.shuffle(rows)
    val third = (shuffled.length + 2) / 3
    val far = Timestamp.valueOf("2023-01-01 14:00:00")
    val streamed = runStream(
      shuffled.grouped(third).toSeq :+ Seq((999L, far, 999L, "view")),
      "sess_rand", watermarkDelay = "2 hours")
    val batch = EventAnalytics.sessionStats(
      rows.toDF("user_id", "ts", "event_id", "event_type")
        .withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id", "event_type", gapUs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(streamed === batch,
      "every session must equal the batch rollup, whatever the arrival order")
    assert(batch.nonEmpty)
  }

  test("streaming sessions match batch sessionStats bit-for-bit once closed") {
    import spark.implicits._
    val rows = Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(5), 2L, "click"), (1L, ts(9), 3L, "view"),
      (1L, ts(25), 4L, "purchase"), (1L, ts(31), 5L, "view"),
      (2L, ts(2), 6L, "view"), (2L, ts(2), 7L, "click"), // ts tie -> one session
      (3L, ts(40), 8L, "signup"))
    val streamed = runStream(Seq(rows, Seq((99L, ts(59), 99L, "view"))), "sess_parity")

    val batch = EventAnalytics.sessionStats(
      rows.toDF("user_id", "ts", "event_id", "event_type")
        .withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_id", "event_type", gapUs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap

    assert(streamed === batch,
      "every closed streaming session must equal the batch rollup row")
  }
}

/** The same battery under the RocksDB state store — state on local disk,
  * bounded block cache; the 100 TB key-cardinality provider (VERDICT r15 #3). */
class StreamingSessionizeRocksDbSpec extends StreamingSessionizeSpec with graft.RocksDbState
