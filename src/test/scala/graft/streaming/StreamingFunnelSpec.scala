package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.EventAnalytics

/** Streaming ordered funnel: buffered close-out at anchor+window, unanchored
  * GC, and bit-for-bit parity with the batch funnelSteps fold. */
class StreamingFunnelSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 10:$minute%02d:00")
  private def us(minute: Int): Long = ts(minute).getTime * 1000L
  private val steps = Seq("signup", "view", "purchase")
  private val windowUs = 20L * 60L * 1000000L // 20 minutes

  private def runStream(batches: Seq[Seq[(Long, Timestamp, String)]],
      name: String, watermarkDelay: String = "0 seconds"): Map[Long, Seq[Any]] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFunnel.funnel(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, windowUs, watermarkDelay)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
  }

  private def runBatch(rows: Seq[(Long, Timestamp, String)]): Map[Long, Seq[Any]] = {
    import spark.implicits._
    EventAnalytics.funnelSteps(
      rows.toDF("user_id", "ts", "event_type")
        .withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", "event_type", steps, windowUs)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
  }

  test("funnel closes at anchor+window; strict order and window enforced; unanchored users emit nothing") {
    val rows = Seq(
      // user 1 completes in order inside the window
      (1L, ts(0), "signup"), (1L, ts(5), "view"), (1L, ts(10), "purchase"),
      // user 2: purchase BEFORE view -> t2 stays null (strict order)
      (2L, ts(0), "signup"), (2L, ts(6), "purchase"), (2L, ts(8), "view"),
      // user 3: view outside the 20-min anchor window -> t1 null
      (3L, ts(0), "signup"), (3L, ts(25), "view"),
      // user 4: never signs up -> no row at all
      (4L, ts(2), "view"), (4L, ts(3), "purchase"))
    val streamed = runStream(Seq(rows, Seq((99L, ts(59), "signup"))), "funnel_base")
    assert(streamed(1L) === Seq(us(0), us(5), us(10)))
    assert(streamed(2L) === Seq(us(0), us(8), null))
    assert(streamed(3L) === Seq(us(0), null, null))
    assert(!streamed.contains(4L), "anchor-less users never emit")
    assert(!streamed.contains(99L), "the sentinel's own window is still open")
    val batch = runBatch(rows)
    assert(streamed === batch, "closed funnels must equal the batch rows")
  }

  test("out-of-order on-time events replay into the correct fold order") {
    // the view at 10:03 arrives a batch AFTER the purchase at 10:07 —
    // buffering + sorted close-out must still fill view before purchase
    val rows = Seq(
      (1L, ts(0), "signup"), (1L, ts(7), "purchase"), (1L, ts(3), "view"))
    val streamed = runStream(Seq(
      Seq(rows(0), rows(1)), Seq(rows(2)), Seq((99L, ts(59), "signup"))),
      "funnel_ooo", watermarkDelay = "15 minutes")
    assert(streamed(1L) === Seq(us(0), us(3), us(7)),
      "the late view must slot in ahead of the already-seen purchase")
    assert(streamed === streamed.keySet.map(k => k -> runBatch(rows)(k)).toMap)
  }

  test("a second anchor after close-out does NOT re-emit (one row per user, as in batch)") {
    val streamed = runStream(Seq(
      Seq((1L, ts(0), "signup"), (1L, ts(5), "view")),
      Seq((98L, ts(30), "signup")), // watermark 10:30 > 10:00+20min -> user 1 closes
      Seq((1L, ts(35), "signup")), // late second anchor: must hit the tombstone
      Seq((99L, ts(59), "signup"))), "funnel_tombstone")
    assert(streamed(1L) === Seq(us(0), us(5), null))
    assert(spark.table("funnel_tombstone")
      .filter(org.apache.spark.sql.functions.col("user_id") === 1L).count() === 1L,
      "batch emits ONE row per user; the tombstone must swallow re-anchors")
    val batch = runBatch(Seq(
      (1L, ts(0), "signup"), (1L, ts(5), "view"), (1L, ts(35), "signup")))
    assert(streamed(1L) === batch(1L),
      "the single row must equal batch over the FULL log incl. the late signup")
  }

  test("randomized: the close-out fold equals the batch funnelSteps on shuffled arrival") {
    import spark.implicits._
    val rnd = new scala.util.Random(987)
    val types = steps ++ Seq("noise") // non-step events are filtered upstream
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(20).toLong + 1L, ts(rnd.nextInt(58)), types(rnd.nextInt(types.length)))
    }.filter(_._3 != "noise")
    // deliver in 3 SHUFFLED batches under a 2-hour delay (every event
    // stays on time however the shuffle lands), then a far-future
    // sentinel pushes the watermark past every anchor window
    val shuffled = rnd.shuffle(rows)
    val third = (shuffled.length + 2) / 3
    val far = java.sql.Timestamp.valueOf("2023-01-01 14:00:00")
    val batches = shuffled.grouped(math.max(third, 1)).toSeq :+
      Seq((999L, far, "signup"))
    val streamed = runStream(batches, "funnel_rand", watermarkDelay = "2 hours")
    val batch = runBatch(rows)
    batch.foreach { case (u, expect) =>
      assert(streamed.get(u) === Some(expect), s"user $u diverged from batch")
    }
    assert(streamed.size === batch.size + 0, // the sentinel's funnel stays open
      "exactly the batch's anchored users must have emitted")
    assert(batch.nonEmpty)
  }

  test("TTL: the tombstone is dropped at the horizon (state returns to zero) and a later anchor re-emits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(s: String): Timestamp = Timestamp.valueOf(s"2023-01-01 $s:00")
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFunnel.funnel(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", steps, windowUs, "0 seconds",
      ttlUs = Some(30L * 60L * 1000000L)) // 30-minute retention horizon
    val q = out.writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").start()
    def push(rows: (Long, Timestamp, String)*): Unit = {
      input.addData(rows: _*); q.processAllAvailable()
    }
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    push((1L, ts(0), "signup"), (1L, ts(5), "view"))
    // wm 10:30 closes user 1's window (10:20): row emits, tombstone armed
    // to expire at 10:00 + 20min + 30min = 10:50
    push((99L, at("10:30"), "signup"))
    // wm 11:00 passes BOTH user 1's 10:50 horizon and the sentinel's own
    // close-out (10:50); the extra push lets the timeout batch run
    push((99L, at("11:00"), "signup"))
    push((99L, at("11:01"), "signup"))
    assert(stateRows === 1L,
      "only the sentinel's own tombstone may remain: user 1's state must be ZERO")
    // past the horizon, a fresh anchor is a NEW funnel (re-anchor trade)
    push((1L, at("11:05"), "signup"))
    push((99L, at("12:00"), "signup"))
    q.stop()
    val rows1 = spark.table("funnel_ttl").filter(col("user_id") === 1L)
      .collect().map(_.toSeq.tail).toSeq
    assert(rows1.size === 2, "post-TTL anchor must emit a second row")
    assert(rows1.contains(Seq(us(0), us(5), null)))
    assert(rows1.contains(Seq(at("11:05").getTime * 1000L, null, null)))
  }

  test("a LATE anchor (on-time under the delay) re-anchors the funnel") {
    // the signup at 10:02 arrives after the view at 10:05 was buffered;
    // parity requires the anchor to move back to 10:02
    val rows = Seq((1L, ts(5), "view"), (1L, ts(2), "signup"))
    val streamed = runStream(Seq(
      Seq(rows(0)), Seq(rows(1)), Seq((99L, ts(59), "signup"))),
      "funnel_late_anchor", watermarkDelay = "15 minutes")
    assert(streamed(1L) === Seq(us(2), us(5), null))
    assert(streamed(1L) === runBatch(rows)(1L))
  }
}

/** The same battery under the RocksDB state store — state on local disk,
  * bounded block cache; the 100 TB key-cardinality provider (VERDICT r15 #3). */
class StreamingFunnelRocksDbSpec extends StreamingFunnelSpec with graft.RocksDbState
