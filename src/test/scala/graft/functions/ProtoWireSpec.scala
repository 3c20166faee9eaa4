package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.pipeline.ChangePipeline

/** Wire-format parity for the DatabaseChanges codec (operator O8).
  *
  * The golden byte vectors are hand-derived from the public protobuf wire
  * spec for the exact fixture the reference's `test_process_data` builds with
  * prost (`/root/reference/src/loader.rs:373-421`): two TableChanges on table
  * "test", fields name="test" old="0" new="1"/"2". If either the encoder or
  * the decoder drifted off the real wire layout, these literals would catch
  * it — round-trip tests alone cannot. */
class ProtoWireSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // DatabaseChanges{table_changes=[TableChange{table:"test",
  //   fields:[Field{name:"test", new_value:"1", old_value:"0"}]}]} — prost
  // field order: table(1), fields(5); Field: name(1), new_value(2), old_value(3).
  private val goldenChange1 =
    "0a14 0a04 74657374 2a0c 0a04 74657374 1201 31 1a01 30"
  private val goldenChange2 =
    "0a14 0a04 74657374 2a0c 0a04 74657374 1201 32 1a01 30"

  test("decode matches the hand-derived golden bytes (two-change payload)") {
    import spark.implicits._
    // message concatenation == repeated-field concatenation per the wire spec
    val payload = hex(goldenChange1) ++ hex(goldenChange2)
    val df = Seq(Tuple1(payload)).toDF("payload")
      .select(explode(ProtoWire.pb_decode_changes(col("payload"))).as("c"))
      .select(col("c.table"), col("c.pk"), col("c.ordinal"), col("c.operation"),
        col("c.fields"))
    val rows = df.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getString(0)).toSeq === Seq("test", "test"))
    assert(rows.forall(_.isNullAt(1)), "no pk arm was set")
    val fields = rows.map(_.getSeq[org.apache.spark.sql.Row](4).map(f =>
      (f.getString(0), f.getString(1), f.getString(2))))
    assert(fields(0) === Seq(("test", "1", "0")))
    assert(fields(1) === Seq(("test", "2", "0")))
  }

  test("encoder emits golden bytes for the same fixture (minus old_value)") {
    import spark.implicits._
    // our encoder writes name+new_value only; the golden trimmed accordingly:
    // Field len 9, TableChange len 17
    val expected = hex("0a11 0a04 74657374 2a09 0a04 74657374 1201 31")
    val got = Seq(1).toDF("x")
      .select(ProtoWire.pb_encode_change(lit("test"), lit(null).cast("string"),
        lit(0L), lit(0), map(lit("test"), lit("1"))).as("b"))
      .as[Array[Byte]].collect().head
    assert(got.toSeq === expected.toSeq)
  }

  test("ordinal, operation, pk and composite_pk lanes decode") {
    import spark.implicits._
    // TableChange{table:"t", pk:"p", ordinal:7, operation:2 (UPDATE)}
    val withPk = hex("0a0a 0a01 74 1201 70 1807 2002")
    // TableChange{table:"t", composite_pk:{keys:{"k1":"v1"}}}
    val withComposite = hex("0a0f 0a01 74 320a 0a08 0a02 6b31 1202 7631")
    val df = Seq(Tuple1(withPk ++ withComposite)).toDF("payload")
      .select(explode(ProtoWire.pb_decode_changes(col("payload"))).as("c"))
      .select(col("c.table"), col("c.pk"), col("c.composite_pk"),
        col("c.ordinal"), col("c.operation"))
    val rows = df.collect()
    assert(rows.length === 2)
    assert((rows(0).getString(0), rows(0).getString(1), rows(0).getLong(3),
      rows(0).getInt(4)) === ("t", "p", 7L, 2))
    assert(rows(1).isNullAt(1), "composite arm clears pk")
    assert(rows(1).getMap[String, String](2) === Map("k1" -> "v1"))
  }

  test("unknown fields are skipped; malformed payloads decode to NULL") {
    import spark.implicits._
    // golden change 1 + an unknown field 9 (varint) appended inside TableChange:
    // extend tc len 0x14 -> 0x16, add tag 0x48 value 0x05
    val withUnknown = hex("0a16 0a04 74657374 2a0c 0a04 74657374 1201 31 1a01 30 4805")
    val truncated = hex("0a14 0a04 7465")
    val df = Seq(("ok", withUnknown), ("bad", truncated)).toDF("k", "payload")
      .select(col("k"), ProtoWire.pb_decode_changes(col("payload")).as("cs"))
    val byK = df.collect().map(r => r.getString(0) -> r).toMap
    assert(byK("bad").isNullAt(1), "truncated payload must yield NULL")
    val ok = byK("ok").getSeq[org.apache.spark.sql.Row](1)
    assert(ok.length === 1 && ok.head.getString(0) === "test")
  }

  test("hostile length varint near Int.MaxValue decodes to NULL, not a crash") {
    import spark.implicits._
    // field 1, length 0x7FFFFFFF: pos + n would overflow Int if the bounds
    // check were written as an addition
    val hostile = hex("0a ffffffff07")
    val out = Seq(Tuple1(hostile)).toDF("payload")
      .select(ProtoWire.pb_decode_changes(col("payload")).as("cs"))
      .collect().head
    assert(out.isNullAt(0))
    // Spkg documents IllegalArgumentException for the same corruption
    intercept[IllegalArgumentException] {
      graft.sources.Spkg.decodePackage(hex("32 ffffffff07"))
    }
  }

  test("end-to-end from bytes: decode -> ChangePipeline matches test_process_data") {
    import spark.implicits._
    val payload = hex(goldenChange1) ++ hex(goldenChange2)
    val decoded = Seq(Tuple1(payload)).toDF("payload")
      .select(explode(ProtoWire.pb_decode_changes(col("payload"))).as("c"))
      .select(col("c.table").as("table"),
        coalesce(col("c.pk"), lit("")).as("pk"),
        col("c.composite_pk").as("compositePk"),
        expr("transform(c.fields, f -> struct(f.name as name, " +
          "f.new_value as newValue, f.old_value as oldValue))").as("fields"))
      .as[ChangeRec].collect().toSeq
    val blocks = Seq(BlockScoped(
      Clock("block-1", 1L, Timestamp.valueOf("2023-08-04 13:53:29")),
      "cursor-1", 1L, decoded)).toDS()
    val catalog = Seq(ChTable("test", Seq(ChColumn("test", ChType.ChUInt64))))
    val out = ChangePipeline.process(blocks, catalog)("test")
    assert(out.columns.toSeq === Seq("block_num", "block_id", "cursor", "test"))
    assert(out.select(col("test").cast("long")).as[Long].collect().toSeq === Seq(1L, 2L))
  }

  test("spark-side round trip: encode then decode restores every lane") {
    import spark.implicits._
    val df = Seq((5L, "orders", "pk-5"), (6L, "orders", "pk-6")).toDF("i", "t", "p")
      .select(ProtoWire.pb_decode_changes(ProtoWire.pb_encode_change(
        col("t"), col("p"), col("i"), lit(1),
        map(lit("amount"), concat(lit("v"), col("i"))))).as("cs"))
      .select(explode(col("cs")).as("c"))
      .select(col("c.table"), col("c.pk"), col("c.ordinal"), col("c.operation"),
        expr("map_from_entries(transform(c.fields, f -> struct(f.name, f.new_value)))"))
    val rows = df.collect().sortBy(_.getLong(2))
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3),
      r.getMap[String, String](4))).toSeq ===
      Seq(("orders", "pk-5", 5L, 1, Map("amount" -> "v5")),
        ("orders", "pk-6", 6L, 1, Map("amount" -> "v6"))))
  }
}
