package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.EventAnalytics

/** Streaming SCD2: closed versions emitted exactly once, in batch parity;
  * out-of-order on-time changes fold in (ts, id) order. */
class StreamingScd2Spec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 10:$minute%02d:00")
  private def us(minute: Int): Long = ts(minute).getTime * 1000L

  private def runStream(batches: Seq[Seq[(Long, Timestamp, Long, String)]],
      name: String, watermarkDelay: String = "0 seconds")
      : Set[(Long, Option[String], Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamingScd2.history(
      input.toDF().toDF("key", "ts", "id", "attr"),
      "key", "ts", "id", "attr", watermarkDelay)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .as[(Long, Option[String], Long, Long, Long)].collect().toSet
  }

  private def runBatch(rows: Seq[(Long, Timestamp, Long, String)])
      : Set[(Long, Option[String], Long, Long, Long)] = {
    import spark.implicits._
    EventAnalytics.scd2(
      rows.toDF("key", "ts", "id", "attr")
        .withColumn("ts_us", unix_micros(col("ts"))),
      "key", "ts_us", "id", "attr")
      .filter(col("effective_to").isNotNull)
      .select(col("key"), col("attr"), col("effective_from"),
        col("effective_to"), col("version_id"))
      .as[(Long, Option[String], Long, Long, Long)].collect().toSet
  }

  test("closed versions match the batch history; the open version is state, not output") {
    val rows = Seq(
      (1L, ts(0), 1L, "bronze"), (1L, ts(5), 2L, "bronze"), // no boundary
      (1L, ts(10), 3L, "silver"), (1L, ts(20), 4L, "gold"),
      (2L, ts(2), 5L, "trial"))
    val streamed = runStream(Seq(rows, Seq((99L, ts(59), 99L, "x"))), "scd2_base")
    assert(streamed === Set(
      (1L, Some("bronze"), us(0), us(10), 1L),
      (1L, Some("silver"), us(10), us(20), 3L)))
    assert(streamed === runBatch(rows),
      "every closed streaming version must equal a batch closed row")
    // key 2's only version and key 1's gold version are open -> no rows
    assert(!streamed.exists(_._1 == 2L))
  }

  test("randomized: shuffled-arrival closed versions equal the batch history") {
    val rnd = new scala.util.Random(1337)
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(10).toLong + 1L, ts(rnd.nextInt(50)), i.toLong,
        Seq("bronze", "silver", "gold", "bronze")(rnd.nextInt(4)))
    }
    val shuffled = rnd.shuffle(rows)
    val third = (shuffled.length + 2) / 3
    val far = Timestamp.valueOf("2023-01-01 14:00:00")
    val streamed = runStream(
      shuffled.grouped(third).toSeq :+ Seq((999L, far, 999L, "x")),
      "scd2_rand", watermarkDelay = "2 hours")
    // every version CLOSED in batch must stream identically; open versions
    // (each key's last, incl. the sentinel's only one) stay in state
    val batch = runBatch(rows)
    assert(streamed.filterNot(_._1 == 999L) === batch,
      "closed-version sets must match whatever the arrival order")
    assert(batch.nonEmpty)
  }

  test("an out-of-order on-time change folds into its (ts, id) slot") {
    // the silver change at 10:04 arrives AFTER the gold change at 10:08
    // was seen; the buffered fold must order silver before gold
    val rows = Seq(
      (1L, ts(0), 1L, "bronze"), (1L, ts(8), 3L, "gold"), (1L, ts(4), 2L, "silver"))
    val streamed = runStream(Seq(
      Seq(rows(0), rows(1)), Seq(rows(2)), Seq((99L, ts(59), 99L, "x"))),
      "scd2_ooo", watermarkDelay = "10 minutes")
    assert(streamed === runBatch(rows))
    assert(streamed === Set(
      (1L, Some("bronze"), us(0), us(4), 1L),
      (1L, Some("silver"), us(4), us(8), 2L)))
  }
}

/** The same battery under the RocksDB state store — state on local disk,
  * bounded block cache; the 100 TB key-cardinality provider (VERDICT r15 #3). */
class StreamingScd2RocksDbSpec extends StreamingScd2Spec with graft.RocksDbState
