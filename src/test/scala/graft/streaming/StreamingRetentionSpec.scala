package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.EventAnalytics

/** Streaming retention facts: exactly-once per (user, active day), gated on
  * the cohort turning final; fact-set and rollup parity with the batch
  * retention lane. */
class StreamingRetentionSpec extends SparkSpec {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2023-01-${day + 1}%02d $hour%02d:00:00")
  /** absolute epoch day of fixture day `i` (cohort_day is absolute) */
  private def day(i: Int): Long = ts(i, 0).getTime / 86400000L

  private def runStream(batches: Seq[Seq[(Long, Timestamp)]],
      name: String, watermarkDelay: String = "0 seconds"): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = StreamingRetention.facts(
      input.toDF().toDF("user_id", "ts"), "user_id", "ts", watermarkDelay)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[(Long, Long, Long)].collect().toSeq
  }

  private def batchFacts(rows: Seq[(Long, Timestamp)]): Set[(Long, Long, Long)] = {
    val byUser = rows.groupBy(_._1)
    byUser.flatMap { case (u, es) =>
      val days = es.map(e => e._2.getTime * 1000L / (86400L * 1000000L)).distinct
      val cohort = days.min
      days.map(d => (u, cohort, d - cohort))
    }.toSet
  }

  test("facts emit exactly once, after the cohort is final; set and rollup match batch") {
    val rows = Seq(
      (1L, ts(0, 10)), (1L, ts(0, 14)), // day 0 twice -> ONE fact
      (1L, ts(2, 9)), (2L, ts(1, 8)), (2L, ts(3, 8)), (3L, ts(0, 23)))
    val all = runStream(Seq(rows, Seq((99L, ts(9, 0)))), "ret_base")
    assert(all.size === all.distinct.size, "append-exactly-once")
    // the sentinel's own fact emits too (watermark == its cohort start is
    // final: nothing admissible can precede it); compare the real users
    val streamed = all.filter(_._1 != 99L)
    val expect = batchFacts(rows)
    assert(streamed.toSet === expect)
    // the batch lane's rollup over the SAME facts
    import spark.implicits._
    val rollup = EventAnalytics.retention(
      rows.toDF("user_id", "ts").withColumn("ts_us", unix_micros(col("ts"))),
      "user_id", "ts_us", ticksPerDay = 86400L * 1000000L)
      .select(col("cohort_day"), col("day_offset"), col("n_active"))
      .as[(Long, Long, Long)].collect().toSet
    val streamedRollup = streamed.groupBy(f => (f._2, f._3))
      .map { case ((c, o), fs) => (c, o, fs.map(_._1).distinct.size.toLong) }.toSet
    assert(streamedRollup === rollup)
  }

  test("a LATE earlier-day event re-cohorts BEFORE any fact is emitted") {
    // day-2 event arrives first; the day-0 event arrives late but on time
    // (watermark still below day 0's start) — facts must anchor at day 0
    val rows = Seq((1L, ts(2, 6)), (1L, ts(0, 6)))
    val streamed = runStream(Seq(
      Seq(rows(0)), Seq(rows(1)), Seq((99L, ts(9, 0)))),
      "ret_late", watermarkDelay = "3 days")
    assert(streamed.toSet === batchFacts(rows),
      "offsets must be relative to the LATE day-0 cohort")
    assert(streamed.toSet === Set((1L, day(0), 0L), (1L, day(0), 2L)))
  }

  test("TTL: departed-user state is dropped at the horizon (returns to zero); a later return re-cohorts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = StreamingRetention.facts(
      input.toDF().toDF("user_id", "ts"), "user_id", "ts", "0 seconds",
      ttlUs = Some(5L * 86400L * 1000000L)) // 5-day retention horizon
    val q = out.writeStream.format("memory").queryName("ret_ttl")
      .outputMode("append").start()
    def push(rows: (Long, Timestamp)*): Unit = {
      input.addData(rows: _*); q.processAllAvailable()
    }
    def stateRows: Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    push((1L, ts(0, 10))) // user 1 active on day 0 only
    // wm day 3 finalizes user 1's cohort: fact emits; TTL deadline =
    // end of day 0 + 5 days = day 6 start
    push((9L, ts(3, 0)))
    // wm day 8 passes the deadline; the extra push lets the timeout batch run
    push((9L, ts(8, 0)))
    push((9L, ts(8, 1)))
    assert(stateRows === 1L,
      "only the still-active sentinel may remain: user 1's state must be ZERO")
    // a return AFTER the horizon re-cohorts at the return day (the trade)
    push((1L, ts(10, 5)))
    push((9L, ts(15, 0)))
    q.stop()
    val facts1 = spark.table("ret_ttl").as[(Long, Long, Long)].collect()
      .filter(_._1 == 1L).toSet
    assert(facts1 === Set((1L, day(0), 0L), (1L, day(10), 0L)),
      "pre-horizon fact keeps the old cohort; the post-horizon return is a fresh cohort")
  }

  test("post-cohort new days emit as they arrive (no re-buffering)") {
    val streamed = runStream(Seq(
      Seq((1L, ts(0, 10))),
      Seq((7L, ts(4, 0))), // watermark -> day 4: user 1's cohort is final
      Seq((1L, ts(5, 2))), // a new active day after finality
      Seq((99L, ts(9, 0)))), "ret_flow")
    assert(streamed.filter(_._1 != 99L).toSet ===
      Set((1L, day(0), 0L), (1L, day(0), 5L), (7L, day(4), 0L)))
  }
}

/** The same battery under the RocksDB state store — state on local disk,
  * bounded block cache; the 100 TB key-cardinality provider (VERDICT r15 #3). */
class StreamingRetentionRocksDbSpec extends StreamingRetentionSpec with graft.RocksDbState
