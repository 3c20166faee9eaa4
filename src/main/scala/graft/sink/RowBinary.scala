package graft.sink

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.ChType._
import graft.model.{ChTable, ChType}

/** ClickHouse RowBinary row encoder — the exact bytes the reference's sink
  * puts on its insert socket.
  *
  * The reference streams every insert as RowBinary positional tuples: the
  * forked `SchemaInserter` serializes each `DynamicInsert` as a serde tuple
  * (`src/table_info.rs:73-167`) whose elements the clickhouse crate's
  * RowBinary serializer writes back-to-back, columns in SORTED column-name
  * order (discovery `ORDER BY column_name`, `src/table_info.rs:221-236`),
  * and the cursor row the same way in struct-field order
  * (`src/loader.rs:34-40`). RowBinary itself is ClickHouse's public format:
  *
  *  - String: LEB128 varint byte-length + UTF-8 bytes
  *  - FixedString(n): exactly n bytes — zero-padded, silently truncated
  *    (the reference writes `bytes[i]` for i < n, `table_info.rs:140-146`)
  *  - U?Int8/16/32/64/128/256: little-endian two's complement of the width
  *  - Float32/64: IEEE-754 bits, little-endian
  *  - Bool: one byte 0/1
  *  - DateTime: epoch SECONDS as 4 bytes LE (the reference parses RFC-3339
  *    and truncates `timestamp() as i32`, `table_info.rs:151-156`)
  *  - Date: days since epoch as UInt16 LE (reference `unimplemented!`;
  *    supported here — documented §1.2 divergence)
  *  - Nullable(T): flag byte (1 = NULL, then nothing; 0 then the value)
  *  - LowCardinality(T): plain T (dictionary encoding is server-side)
  *  - Decimal(p,s): the scaled unscaled-value as the narrowest CH decimal
  *    width for p (Int32/Int64/Int128/Int256 LE)
  *
  * Divergence (SURVEY §1.2, same stance as [[graft.cast.DynamicCast]]):
  * Int128/Int256 negatives encode correctly as two's complement — the
  * reference routes Int256 through an unsigned decimal parser and panics.
  *
  * Input values are the sink's canonical STRINGS (the reference encodes from
  * its `HashMap<String, String>`), so this composes directly with the
  * DynamicCast fields-map: `rowbinary_encode(fieldsMap, table)` yields the
  * full positional row as BINARY. Golden byte vectors are pinned in
  * RowBinarySpec; the `pipe_o13_rowbinary` lane replays the hex encoding in
  * the DuckDB oracle.
  */
object RowBinary {

  /** Column-API entry: MAP<STRING,STRING> fields → BINARY RowBinary row in
    * `table`'s sorted-column order. */
  def rowbinary_encode(fieldsMap: Column, table: ChTable): Column =
    ColumnBridge.column(RowBinaryEncode(ColumnBridge.expression(fieldsMap), table))

  /** Growable little-endian byte sink (driver- and executor-side; one per
    * row encode — rows are small, the array is right-sized on toBytes). */
  final class Buf(initial: Int = 64) {
    private var a = new Array[Byte](initial)
    private var n = 0
    private def ensure(k: Int): Unit =
      if (n + k > a.length) {
        val grown = new Array[Byte](math.max(a.length * 2, n + k))
        System.arraycopy(a, 0, grown, 0, n); a = grown
      }
    def byte(b: Int): Unit = { ensure(1); a(n) = b.toByte; n += 1 }
    def bytes(bs: Array[Byte]): Unit = { ensure(bs.length); System.arraycopy(bs, 0, a, n, bs.length); n += bs.length }
    /** `width` bytes of `v`, little-endian (sign bits beyond width dropped). */
    def intLE(v: Long, width: Int): Unit = {
      ensure(width)
      var i = 0
      while (i < width) { a(n + i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
      n += width
    }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(a, n)
  }

  /** LEB128 unsigned varint — RowBinary's length prefix. */
  def writeVarint(out: Buf, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0L) { out.byte(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.byte((v & 0x7F).toInt)
  }

  def writeString(out: Buf, s: String): Unit = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    writeVarint(out, b.length.toLong)
    out.bytes(b)
  }

  /** Two's complement little-endian at exactly `width` bytes (BigInteger is
    * big-endian minimal — sign-extend then reverse). */
  def writeWideLE(out: Buf, v: BigInteger, width: Int): Unit = {
    val be = v.toByteArray // minimal two's complement, big-endian
    val pad: Byte = if (v.signum() < 0) 0xFF.toByte else 0
    var i = 0
    while (i < width) {
      val beIdx = be.length - 1 - i // LE position i = BE position from the end
      out.byte(if (beIdx >= 0) be(beIdx) else pad)
      i += 1
    }
  }

  private def parseEpochSeconds(s: String): Long = {
    val t = s.trim
    if (t.matches("-?[0-9]+"))
      t.toLong // already epoch seconds (the DynamicCast-canonical form)
    else
      try java.time.OffsetDateTime.parse(t).toEpochSecond // the reference's RFC-3339
      catch { case _: java.time.format.DateTimeParseException =>
        // "yyyy-MM-dd HH:mm:ss" (ClickHouse's own text form), taken as UTC
        java.time.LocalDateTime.parse(t.replace(' ', 'T'))
          .toEpochSecond(java.time.ZoneOffset.UTC)
      }
  }

  /** One value in RowBinary. `v == null` is only legal under Nullable. */
  def writeValue(out: Buf, t: ChType, v: String): Unit = t match {
    case ChNullable(inner) =>
      if (v == null) out.byte(1)
      else { out.byte(0); writeValue(out, inner, v) }
    case _ if v == null =>
      throw new IllegalArgumentException(s"NULL value for non-Nullable $t")
    case ChString => writeString(out, v)
    case ChFixedString(width) =>
      val b = v.getBytes(StandardCharsets.UTF_8)
      var i = 0
      while (i < width) { out.byte(if (i < b.length) b(i) else 0); i += 1 }
    case ChUInt8 => out.intLE(java.lang.Short.parseShort(v.trim).toLong, 1)
    case ChInt8 => out.intLE(java.lang.Byte.parseByte(v.trim).toLong, 1)
    case ChUInt16 => out.intLE(Integer.parseInt(v.trim).toLong, 2)
    case ChInt16 => out.intLE(java.lang.Short.parseShort(v.trim).toLong, 2)
    case ChUInt32 => out.intLE(java.lang.Long.parseLong(v.trim), 4)
    case ChInt32 => out.intLE(Integer.parseInt(v.trim).toLong, 4)
    case ChUInt64 => writeWideLE(out, new BigInteger(v.trim), 8)
    case ChInt64 => out.intLE(java.lang.Long.parseLong(v.trim), 8)
    case ChUInt128 => writeWideLE(out, new BigInteger(v.trim), 16)
    case ChInt128 => writeWideLE(out, new BigInteger(v.trim), 16)
    case ChUInt256 => writeWideLE(out, new BigInteger(v.trim), 32)
    case ChInt256 => writeWideLE(out, new BigInteger(v.trim), 32)
    case ChFloat32 => out.intLE(java.lang.Float.floatToIntBits(v.trim.toFloat).toLong, 4)
    case ChFloat64 => out.intLE(java.lang.Double.doubleToLongBits(v.trim.toDouble), 8)
    case ChBool =>
      val b = v.trim.toLowerCase match {
        case "true" | "1" => 1
        case "false" | "0" => 0
        case other => throw new IllegalArgumentException(s"bad Bool '$other'")
      }
      out.byte(b)
    case ChDateTime => out.intLE(parseEpochSeconds(v), 4)
    case ChDate => out.intLE(java.time.LocalDate.parse(v.trim).toEpochDay, 2)
    case ChDecimal(p, s) =>
      // setScale with no rounding mode throws ArithmeticException on excess
      // fractional digits — rethrow inside the encoder's documented
      // IllegalArgumentException taxonomy with the offending value (review
      // r13 finding; in-contract inputs are DynamicCast-canonical and exact)
      val unscaled =
        try new java.math.BigDecimal(v.trim).setScale(s).unscaledValue()
        catch { case e: ArithmeticException =>
          throw new IllegalArgumentException(
            s"value '$v' does not fit Decimal($p,$s) without rounding", e)
        }
      val width = if (p <= 9) 4 else if (p <= 18) 8 else if (p <= 38) 16 else 32
      writeWideLE(out, unscaled, width)
    case ChLowCardinality(inner) => writeValue(out, inner, v)
  }

  /** One table row: `table`'s columns in sorted-name order (the reference's
    * discovery ORDER BY), each value pulled from the string-valued map. */
  def encodeRow(table: ChTable, valueOf: String => String): Array[Byte] = {
    val out = new Buf()
    table.sortedColumns.foreach { c => writeValue(out, c.chType, valueOf(c.name)) }
    out.toBytes
  }

  /** The cursor row (reference `src/loader.rs:34-40`): struct-field order
    * `(id, cursor, block_num: UInt64, block_id)` — NOT name-sorted; derive
    * rows keep their declaration order. */
  def encodeCursor(id: String, cursor: String, blockNum: Long, blockId: String): Array[Byte] = {
    val out = new Buf()
    writeString(out, id)
    writeString(out, cursor)
    out.intLE(blockNum, 8)
    writeString(out, blockId)
    out.toBytes
  }

  /** Executor entry for codegen: MapData of UTF8String → row bytes. */
  def encodeFromMap(table: ChTable, fields: MapData): Array[Byte] = {
    val keys = fields.keyArray()
    val vals = fields.valueArray()
    val m = new java.util.HashMap[String, String](fields.numElements() * 2)
    var i = 0
    while (i < fields.numElements()) {
      val v = if (vals.isNullAt(i)) null else vals.getUTF8String(i).toString
      m.put(keys.getUTF8String(i).toString, v)
      i += 1
    }
    encodeRow(table, m.get)
  }
}

/** MAP<STRING,STRING> → BINARY RowBinary row. Codegen emits a static call
  * (the ChTable travels as a codegen reference object), so the expression
  * stays inside whole-stage codegen like the ProtoWire codec. */
case class RowBinaryEncode(child: Expression, table: ChTable) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RowBinary.encodeFromMap(table, input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("chTable", table, classOf[ChTable].getName)
    nullSafeCodeGen(ctx, ev, m =>
      s"${ev.value} = graft.sink.RowBinary.encodeFromMap($tableRef, $m);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
