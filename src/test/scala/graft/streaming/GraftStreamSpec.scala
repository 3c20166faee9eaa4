package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.sink.MultiTableSink

class GraftStreamSpec extends SparkSpec {
  import graft.model.ChType._

  private val catalog = Seq(ChTable("t", Seq(ChColumn("v", ChInt32))))

  private def blk(n: Long, finalHeight: Long): BlockScoped =
    BlockScoped(Clock(s"b$n", n, Timestamp.valueOf("2023-01-01 00:00:00")), s"c$n", finalHeight,
      Seq(ChangeRec("t", "", Map.empty, Seq(FieldKV("v", n.toString, "")))))

  private def writeMsgs(dir: String, name: String, msgs: Seq[BlockMsg]): Unit = {
    import spark.implicits._
    Seq(msgs).flatten.toDS()
      .coalesce(1).write.mode("append").parquet(s"$dir/tmp_$name")
    // move the part file in as one atomic-ish unit so each file = one batch
    val src = new java.io.File(s"$dir/tmp_$name").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).head
    Files.move(src.toPath, new java.io.File(s"$dir/$name.parquet").toPath)
  }

  test("stream -> buffer -> route/cast -> sink -> cursor; exactly-once across restart") {
    val root = Files.createTempDirectory("graftstream").toString
    val srcDir = s"$root/src"; val outDir = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()

    // phase 1: blocks 1..5, finality trailing by 2 -> releases 1,2,3
    writeMsgs(srcDir, "batch1", (1L to 5L).map(n => BlockMsg.data(n, blk(n, n - 2))))
    val q1 = GraftStream.start(GraftStream.fileSource(spark, srcDir), catalog, outDir, ckpt, "chainA")
    q1.processAllAvailable(); q1.stop()

    val sink = new MultiTableSink(catalog, outDir, "chainA")
    val afterPhase1 = spark.read.parquet(sink.dataPath("t")).select("v").collect().map(_.getInt(0)).sorted
    assert(afterPhase1.toSeq === Seq(1, 2, 3))
    assert(sink.loadCursor(spark).map(_.blockNum) === Some(3L))

    // phase 2: RESTART from checkpoint (new query, same dirs); blocks 6..8
    // -> releases 4,5,6; blocks 1..3 must NOT be re-delivered or re-written
    writeMsgs(srcDir, "batch2", (6L to 8L).map(n => BlockMsg.data(n, blk(n, n - 2))))
    val q2 = GraftStream.start(GraftStream.fileSource(spark, srcDir), catalog, outDir, ckpt, "chainA")
    q2.processAllAvailable(); q2.stop()

    val rows = spark.read.parquet(sink.dataPath("t")).select("v").collect().map(_.getInt(0)).sorted
    assert(rows.toSeq === Seq(1, 2, 3, 4, 5, 6), "each released block written exactly once")
    val cur = sink.loadCursor(spark)
    assert(cur.map(_.blockNum) === Some(6L))
    assert(cur.map(_.cursor) === Some("c6"))
    assert(spark.read.parquet(sink.dataPath("t")).columns.toSeq ===
      Seq("block_num", "block_id", "cursor", "v"))
  }

  test("loadCursor on empty store -> None (start from start_block)") {
    val root = Files.createTempDirectory("graftcur").toString
    val sink = new MultiTableSink(catalog, root, "nope")
    assert(sink.loadCursor(spark).isEmpty)
  }
}
