package graft.sink

import java.nio.file.Files
import java.sql.{DriverManager, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.streaming.GraftStream

/** O13 JDBC variant: the reference's database-loading role against an
  * embedded JDBC target (Derby, already on the Spark classpath), proving
  * exactly-once-EFFECTIVE delivery across restart and under batch
  * re-delivery — the replace-on-PK upgrade over the reference's plain
  * at-least-once inserts (`/root/reference/src/loader.rs:49-80`). */
class JdbcSinkSpec extends SparkSpec {
  import graft.model.ChType._

  System.setProperty("derby.system.home",
    Files.createTempDirectory("derbyhome").toString)

  private val catalog = Seq(ChTable("t", Seq(ChColumn("v", ChInt32))))

  private def blk(n: Long, finalHeight: Long): BlockScoped =
    BlockScoped(Clock(s"b$n", n, Timestamp.valueOf("2023-01-01 00:00:00")), s"c$n", finalHeight,
      Seq(ChangeRec("t", "", Map.empty, Seq(FieldKV("v", n.toString, "")))))

  private def writeMsgs(dir: String, name: String, msgs: Seq[BlockMsg]): Unit = {
    import spark.implicits._
    Seq(msgs).flatten.toDS()
      .coalesce(1).write.mode("append").parquet(s"$dir/tmp_$name")
    val src = new java.io.File(s"$dir/tmp_$name").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    Files.move(src.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
  }

  private def readInts(url: String, sql: String): Seq[Int] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(sql)
      Iterator.continually(rs).takeWhile(_.next()).map(_.getInt(1)).toList
    } finally conn.close()
  }

  test("stream -> jdbc sink -> cursor; exactly-once across restart") {
    val root = Files.createTempDirectory("graftjdbc").toString
    val srcDir = s"$root/src"; val ckpt = s"$root/ckpt"
    val url = s"jdbc:derby:$root/db;create=true"
    new java.io.File(srcDir).mkdirs()

    // phase 1: blocks 1..5, finality trailing by 2 -> releases 1,2,3
    writeMsgs(srcDir, "batch1", (1L to 5L).map(n => BlockMsg.data(n, blk(n, n - 2))))
    val q1 = GraftStream.startJdbc(GraftStream.fileSource(spark, srcDir), catalog,
      url, ckpt, "chainA")
    q1.processAllAvailable(); q1.stop()

    val sink = new JdbcMultiTableSink(catalog, url, "chainA")
    assert(readInts(url, """SELECT "v" FROM "t" ORDER BY "v"""") === Seq(1, 2, 3))
    assert(sink.loadCursor(spark).map(_.blockNum) === Some(3L))

    // phase 2: RESTART from checkpoint; blocks 6..8 -> releases 4,5,6
    writeMsgs(srcDir, "batch2", (6L to 8L).map(n => BlockMsg.data(n, blk(n, n - 2))))
    val q2 = GraftStream.startJdbc(GraftStream.fileSource(spark, srcDir), catalog,
      url, ckpt, "chainA")
    q2.processAllAvailable(); q2.stop()

    assert(readInts(url, """SELECT "v" FROM "t" ORDER BY "v"""") === Seq(1, 2, 3, 4, 5, 6),
      "each released block written exactly once")
    val cur = sink.loadCursor(spark)
    assert(cur.map(_.blockNum) === Some(6L))
    assert(cur.map(_.cursor) === Some("c6"))
  }

  test("re-delivered batch replaces itself (idempotent on PK), multi-row blocks") {
    import spark.implicits._
    val root = Files.createTempDirectory("graftjdbc2").toString
    val url = s"jdbc:derby:$root/db;create=true"
    // block 1 carries TWO changes -> the PK (block_num) is a group key
    val blocks = Seq(
      BlockScoped(Clock("b1", 1L, Timestamp.valueOf("2023-01-01 00:00:00")), "c1", 1L,
        Seq(ChangeRec("t", "", Map.empty, Seq(FieldKV("v", "10", ""))),
          ChangeRec("t", "", Map.empty, Seq(FieldKV("v", "11", ""))))),
      BlockScoped(Clock("b2", 2L, Timestamp.valueOf("2023-01-01 00:00:00")), "c2", 2L,
        Seq(ChangeRec("t", "", Map.empty, Seq(FieldKV("v", "20", "")))))
    ).toDS()
    val sink = new JdbcMultiTableSink(catalog, url, "chainB", batchSize = 1)
    sink.writeBatch(blocks, 0L)
    sink.writeBatch(blocks, 0L) // foreachBatch retry: same batch again
    assert(readInts(url, """SELECT "v" FROM "t" ORDER BY "v"""") === Seq(10, 11, 20),
      "replace-on-pk must absorb the re-delivery")
    // cursor is append + latest-wins: two inserts, max wins
    assert(sink.loadCursor(spark).map(_.blockNum) === Some(2L))
  }

  test("loadCursor on empty store -> None") {
    val root = Files.createTempDirectory("graftjdbc3").toString
    val sink = new JdbcMultiTableSink(catalog, s"jdbc:derby:$root/db;create=true", "nope")
    assert(sink.loadCursor(spark).isEmpty)
  }
}
