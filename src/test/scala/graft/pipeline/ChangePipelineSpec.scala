package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._

class ChangePipelineSpec extends SparkSpec {
  import graft.model.ChType._

  private def clock(n: Long): Clock =
    Clock(s"block-$n", n, Timestamp.valueOf("2023-08-04 13:53:29"))

  private def change(table: String, fields: (String, String)*): ChangeRec =
    ChangeRec(table, "", Map.empty, fields.map { case (k, v) => FieldKV(k, v, "") })

  private def block(n: Long, changes: ChangeRec*): BlockScoped =
    BlockScoped(clock(n), s"cursor-$n", n, changes)

  // Parity with the reference's `test_process_data` (src/loader.rs:352-421):
  // table `test` with a single UInt64 column, two changes "1","2" → rows
  // {1},{2} in order.
  test("test_process_data parity: route + cast two changes on one table") {
    import spark.implicits._
    val catalog = Seq(ChTable("test", Seq(ChColumn("test", ChUInt64))))
    val blocks = Seq(block(1L, change("test", "test" -> "1"), change("test", "test" -> "2"))).toDS()
    val out = ChangePipeline.process(blocks, catalog)("test")
    assert(out.columns.toSeq === Seq("block_num", "block_id", "cursor", "test"))
    val rows = out.select(col("test").cast("long")).as[Long].collect().toSeq
    assert(rows === Seq(1L, 2L))
  }

  test("duplicate field names collapse latest-wins (reference src/main.rs:291-297)") {
    import spark.implicits._
    val catalog = Seq(ChTable("t", Seq(ChColumn("a", ChString))))
    val blocks = Seq(block(1L,
      change("t", "a" -> "first", "a" -> "second", "a" -> "last"))).toDS()
    val out = ChangePipeline.process(blocks, catalog)("t")
    assert(out.select("a").as[String].collect().toSeq === Seq("last"))
  }

  test("composite PK keys merge over fields, PK wins on collision (loader.rs:143-149)") {
    import spark.implicits._
    val catalog = Seq(ChTable("t", Seq(ChColumn("id", ChString), ChColumn("v", ChString))))
    val rec = ChangeRec("t", "", Map("id" -> "pk-id"),
      Seq(FieldKV("id", "field-id", ""), FieldKV("v", "x", "")))
    val blocks = Seq(block(1L, rec)).toDS()
    val out = ChangePipeline.process(blocks, catalog)("t")
    val r = out.select("id", "v").as[(String, String)].collect().head
    assert(r === (("pk-id", "x")))
  }

  test("missing schema column yields NULL (divergence: reference skips silently)") {
    import spark.implicits._
    val catalog = Seq(ChTable("t", Seq(ChColumn("present", ChString), ChColumn("absent", ChInt32))))
    val blocks = Seq(block(1L, change("t", "present" -> "here"))).toDS()
    val out = ChangePipeline.process(blocks, catalog)("t")
    val r = out.select("present", "absent").collect().head
    assert(r.getString(0) === "here")
    assert(r.isNullAt(1))
  }

  test("full cast matrix lane-by-lane (FIXTURES.md A.3)") {
    import spark.implicits._
    val catalog = Seq(ChTable("evt", Seq(
      ChColumn("contract_address", ChFixedString(40)),
      ChColumn("evt_tx_hash", ChString),
      ChColumn("evt_index", ChUInt32),
      ChColumn("evt_block_time", ChDateTime),
      ChColumn("value", ChUInt256),
      ChColumn("flag", ChBool),
      ChColumn("ratio", ChFloat64),
      ChColumn("neg", ChInt64),
      ChColumn("big", ChInt128))))
    val u256max = "115792089237316195423570985008687907853269984665640564039457584007913129639935"
    val blocks = Seq(block(5L, change("evt",
      "contract_address" -> "abcdef",
      "evt_tx_hash" -> "0xdeadbeef",
      "evt_index" -> "5",
      "evt_block_time" -> "2023-08-04T13:53:29+00:00",
      "value" -> u256max,
      "flag" -> "true",
      "ratio" -> "0.0125",
      "neg" -> "-42",
      "big" -> "-170141183460469231731687303715884105728"))).toDS()
    val out = ChangePipeline.process(blocks, catalog)("evt")
    val r = out.collect().head
    val fs = r.getAs[Array[Byte]]("contract_address")
    assert(fs.length === 40 && new String(fs.take(6)) === "abcdef" && fs.drop(6).forall(_ == 0))
    assert(r.getAs[String]("evt_tx_hash") === "0xdeadbeef")
    assert(r.getAs[Long]("evt_index") === 5L)
    assert(r.getAs[Timestamp]("evt_block_time") === Timestamp.valueOf("2023-08-04 13:53:29"))
    assert(r.getAs[String]("value") === u256max)
    assert(r.getAs[Boolean]("flag") === true)
    assert(r.getAs[Double]("ratio") === 0.0125)
    assert(r.getAs[Long]("neg") === -42L)
    assert(r.getAs[String]("big") === "-170141183460469231731687303715884105728")
  }

  test("Date / Decimal / Nullable / LowCardinality lanes (unimplemented in reference)") {
    import spark.implicits._
    val catalog = Seq(ChTable("t", Seq(
      ChColumn("d", ChDate),
      ChColumn("dec", ChDecimal(10, 3)),
      ChColumn("n", ChNullable(ChInt32)),
      ChColumn("lc", ChLowCardinality(ChString)))))
    val blocks = Seq(block(1L, change("t",
      "d" -> "2024-02-29", "dec" -> "12345.6789", "n" -> "7", "lc" -> "tag"))).toDS()
    val r = ChangePipeline.process(blocks, catalog)("t").collect().head
    assert(r.getAs[java.sql.Date]("d").toString === "2024-02-29")
    assert(r.getAs[java.math.BigDecimal]("dec").toPlainString === "12345.679") // scale-3 rounding
    assert(r.getAs[Int]("n") === 7)
    assert(r.getAs[String]("lc") === "tag")
  }

  test("unsigned lanes reject negatives; permissive mode nulls malformed values") {
    import spark.implicits._
    val catalog = Seq(ChTable("t", Seq(
      ChColumn("u", ChUInt32), ChColumn("n", ChInt32), ChColumn("f", ChFloat64))))
    val blocks = Seq(block(1L, change("t", "u" -> "-7", "n" -> "notanumber", "f" -> "1.5"))).toDS()
    val r = ChangePipeline.process(blocks, catalog)("t").collect().head
    assert(r.isNullAt(r.fieldIndex("u")))
    assert(r.isNullAt(r.fieldIndex("n")))
    assert(r.getAs[Double]("f") === 1.5)
  }

  test("unsigned lanes reject overflow above the uN max (parse::<uN> parity)") {
    import spark.implicits._
    val catalog = Seq(ChTable("t", Seq(
      ChColumn("u8", ChUInt8), ChColumn("u16", ChUInt16),
      ChColumn("u32", ChUInt32), ChColumn("u64", ChUInt64))))
    // one row at each max (kept), one row just above (nulled)
    val blocks = Seq(
      block(1L, change("t", "u8" -> "255", "u16" -> "65535",
        "u32" -> "4294967295", "u64" -> "18446744073709551615")),
      block(2L, change("t", "u8" -> "256", "u16" -> "65536",
        "u32" -> "4294967296", "u64" -> "18446744073709551616"))).toDS()
    val rows = ChangePipeline.process(blocks, catalog)("t")
      .orderBy(col("block_num")).collect()
    val atMax = rows(0)
    assert(atMax.getAs[Short]("u8") === 255)
    assert(atMax.getAs[Int]("u16") === 65535)
    assert(atMax.getAs[Long]("u32") === 4294967295L)
    assert(atMax.getAs[java.math.BigDecimal]("u64").toPlainString === "18446744073709551615")
    val over = rows(1)
    Seq("u8", "u16", "u32", "u64").foreach { c =>
      assert(over.isNullAt(over.fieldIndex(c)), s"$c should overflow to NULL")
    }
  }

  test("strict mode raises on malformed value (reference panic parity)") {
    import spark.implicits._
    val catalog = Seq(ChTable("t", Seq(ChColumn("n", ChInt32))))
    val blocks = Seq(block(1L, change("t", "n" -> "boom"))).toDS()
    val e = intercept[Exception] {
      ChangePipeline.process(blocks, catalog, strict = true)("t").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.getMessage != null), e.toString)
  }

  test("routing: one frame per table, empty for absent tables, no cross-talk") {
    import spark.implicits._
    val catalog = Seq(
      ChTable("a", Seq(ChColumn("x", ChInt32))),
      ChTable("b", Seq(ChColumn("y", ChString))),
      ChTable("never", Seq(ChColumn("z", ChInt32))))
    val blocks = Seq(
      block(1L, change("a", "x" -> "1"), change("b", "y" -> "one")),
      block(2L, change("a", "x" -> "2"))).toDS()
    val out = ChangePipeline.process(blocks, catalog)
    assert(out("a").count() === 2)
    assert(out("b").count() === 1)
    assert(out("never").count() === 0)
    assert(out("a").select("x").as[Int].collect().sorted.toSeq === Seq(1, 2))
  }
}
