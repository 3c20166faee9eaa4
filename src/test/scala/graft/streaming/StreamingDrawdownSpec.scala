package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming drawdown twin: update-mode snapshots whose final row per user
  * matches the batch `events_drawdown` fold bit-for-bit, including under
  * out-of-order on-time delivery and buffered events flushed by timeout
  * (no further data for the user). */
class StreamingDrawdownSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 10:$minute%02d:00")

  /** Latest (= max n_events) snapshot per user from the update-mode sink. */
  private def runStream(batches: Seq[Seq[(Long, Timestamp, Long, Double)]],
      name: String, watermarkDelay: String = "0 seconds")
      : Map[Long, (Long, Double, Double)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, Double)]
    val out = StreamingDrawdown.drawdowns(
      input.toDF().toDF("user_id", "ts", "event_id", "value"), watermarkDelay)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[(Long, Long, Double, Double)].collect()
      .groupBy(_._1)
      .map { case (u, rows) =>
        val last = rows.maxBy(_._2)
        u -> ((last._2, last._3, last._4))
      }
  }

  /** Batch replica of the events_drawdown fold (plain Scala, shared-code-free). */
  private def batchFold(events: Seq[(Long, Timestamp, Long, Double)])
      : Map[Long, (Long, Double, Double)] =
    events.groupBy(_._1).map { case (u, es) =>
      val ordered = es.sortBy(e => (e._2.getTime, e._3))
      var peak = Double.NegativeInfinity
      var worst = Double.PositiveInfinity
      ordered.foreach { case (_, _, _, v) =>
        peak = math.max(peak, v); worst = math.min(worst, v - peak)
      }
      u -> ((es.size.toLong, worst, peak))
    }

  test("final snapshot matches the batch fold; updates only on folded progress") {
    // user 1 rises then falls (drawdown -7.0), user 2 monotone up (0.0)
    val evs = Seq(
      (1L, ts(0), 1L, 10.0), (1L, ts(5), 2L, 15.0), (1L, ts(10), 3L, 8.0),
      (1L, ts(15), 4L, 12.0), (2L, ts(2), 5L, 1.0), (2L, ts(8), 6L, 2.0))
    // zero watermark delay: each batch must not carry events older than
    // the previous batch's max (they'd be late and dropped) — user 2 rides
    // in batch 1, user 1's last event in batch 2
    val got = runStream(Seq(
      evs.take(3) ++ evs.slice(4, 6), Seq(evs(3)),
      Seq((99L, ts(59), 9L, 0.0))), "draw_out") // sentinel advances watermark
    val expect = batchFold(evs)
    assert(got(1L) === expect(1L))
    assert(got(2L) === expect(2L))
    assert(got(1L) === ((4L, -7.0, 15.0)))
  }

  test("out-of-order on-time events fold in event-time order, not arrival order") {
    // arrival: 10:10 first, then 10:00/10:05 late-but-on-time under a
    // 15-minute delay. Event-time order 10,15,8 gives worst −7; arrival
    // order 8,10,15 would give 0 — the buffer-until-final discipline is
    // what's being pinned.
    val evs = Seq(
      (1L, ts(10), 3L, 8.0), (1L, ts(0), 1L, 10.0), (1L, ts(5), 2L, 15.0))
    val got = runStream(Seq(
      Seq(evs(0)), Seq(evs(1), evs(2)),
      Seq((99L, ts(59), 9L, 0.0))), "draw_ooo", watermarkDelay = "15 minutes")
    assert(got(1L) === ((3L, -7.0, 15.0)))
  }

  test("buffered events flush via timeout when the user gets no more data") {
    // user 1's events are all delivered in batch 1; batches 2-3 carry only
    // the sentinel user — user 1's fold must still complete via the
    // event-time timeout wake-up
    val got = runStream(Seq(
      Seq((1L, ts(0), 1L, 10.0), (1L, ts(5), 2L, 4.0)),
      Seq((99L, ts(30), 8L, 0.0)),
      Seq((99L, ts(59), 9L, 0.0))), "draw_flush", watermarkDelay = "0 seconds")
    assert(got(1L) === ((2L, -6.0, 10.0)))
  }

  test("fixture parity: streaming snapshot equals the events_drawdown lane") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    // carry ts_ns so ties inside one µs sort exactly like the batch lane
    val src = graft.Tables.events(spark, d)
      .filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("ts_ns"), col("event_id"),
        col("value"))
      .as[(Long, Timestamp, Long, Long, Double)].collect().toSeq
    // two arrival batches split mid-stream + a far-future sentinel; the
    // delay must exceed the fixture's full time SPAN (arbitrary split ⇒
    // batch 2 can be arbitrarily older than batch 1's max) and the
    // sentinel must clear max + delay so everything folds
    val (a, b) = src.splitAt(src.size / 2)
    val sentMs = src.map(_._2.getTime).max + 401L * 86400000L
    val sentinel = Seq((Long.MaxValue, new Timestamp(sentMs),
      sentMs * 1000000L, Long.MaxValue, 0.0))
    val input = MemoryStream[(Long, Timestamp, Long, Long, Double)]
    val out = StreamingDrawdown.drawdowns(
      input.toDF().toDF("user_id", "ts", "ts_ns", "event_id", "value"),
      watermarkDelay = "400 days")
    val q = out.writeStream.format("memory").queryName("draw_fixture")
      .outputMode("update").start()
    Seq(a, b, sentinel).foreach { batch =>
      input.addData(batch: _*); q.processAllAvailable()
    }
    q.stop()
    val got = spark.table("draw_fixture")
      .as[(Long, Long, Double, Double)].collect()
      .groupBy(_._1)
      .map { case (u, rows) =>
        val last = rows.maxBy(_._2); u -> ((last._2, last._3, last._4))
      }
      .filter(_._1 != Long.MaxValue)
    val lane = graft.SparkEntry.queries("events_drawdown")(spark, d)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet === lane.keySet)
    got.foreach { case (u, (n, worst, peak)) =>
      val (ln, lworst, lpeak) = lane(u)
      assert(n === ln, s"user $u n")
      // the lane rounds at 6; round the streaming fold the same way
      def r6(x: Double) = new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(r6(worst) === lworst, s"user $u worst")
      assert(r6(peak) === lpeak, s"user $u peak")
    }
  }
}

/** The same battery under the RocksDB state store — state on local disk,
  * bounded block cache; the 100 TB key-cardinality provider (VERDICT r15 #3). */
class StreamingDrawdownRocksDbSpec extends StreamingDrawdownSpec with graft.RocksDbState
