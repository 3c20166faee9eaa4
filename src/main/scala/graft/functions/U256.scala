package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Wide-integer (128/256-bit) support.
  *
  * ClickHouse UInt128/Int128/UInt256/Int256 exceed Spark's DecimalType(38,0)
  * at the extremes (i128::MIN has 39 digits), so values are encoded as fixed
  * bits/8-byte big-endian binaries whose unsigned lexicographic byte order
  * equals numeric order — Spark's native BinaryType comparator (unsigned,
  * lexicographic) then gives free ORDER BY / range predicates / joins on
  * wide values with zero custom physical operators. Signed values use
  * offset-binary (sign bit flipped) to stay order-compatible under the same
  * unsigned comparator.
  *
  * The reference parses UInt256 via `U256::from_dec_str` into 4×u64 limbs
  * (`src/table_info.rs:112-115`) and — bug — uses the same *unsigned* parser
  * for Int256 so negatives panic (`src/table_info.rs:136-139`); we parse
  * signed values correctly (deliberate divergence, SURVEY §1.2).
  *
  * Semantics: malformed / out-of-range input → NULL (permissive mode;
  * `graft.cast.DynamicCast` adds a strict wrapper that raises instead, to
  * mirror the reference's panic).
  *
  * The expressions are codegen'd (static helper calls, nullSafeCodeGen with
  * explicit result nullability), so wide-int parse/format/arith stays inside
  * whole-stage-codegen spans; comparisons/sorts on the encoded binary are
  * built-in BinaryType ops and need nothing custom at all.
  */
object U256 {
  val Bits = 256
  val Width = 32
  def width(bits: Int): Int = bits / 8
  def uMax(bits: Int): BigInteger = BigInteger.ONE.shiftLeft(bits).subtract(BigInteger.ONE)
  def iMax(bits: Int): BigInteger = BigInteger.ONE.shiftLeft(bits - 1).subtract(BigInteger.ONE)
  def iMin(bits: Int): BigInteger = BigInteger.ONE.shiftLeft(bits - 1).negate()
  private def offset(bits: Int): BigInteger = BigInteger.ONE.shiftLeft(bits - 1)

  val UMax: BigInteger = uMax(Bits)
  val IMax: BigInteger = iMax(Bits)
  val IMin: BigInteger = iMin(Bits)

  /** unsigned value -> bits/8-byte big-endian */
  def encodeUnsigned(v: BigInteger, bits: Int = Bits): Array[Byte] = {
    require(v.signum() >= 0 && v.compareTo(uMax(bits)) <= 0, s"out of UInt$bits range: $v")
    toFixed(v, width(bits))
  }

  /** signed value -> offset-binary bits/8 bytes (order-preserving) */
  def encodeSigned(v: BigInteger, bits: Int = Bits): Array[Byte] = {
    require(v.compareTo(iMin(bits)) >= 0 && v.compareTo(iMax(bits)) <= 0,
      s"out of Int$bits range: $v")
    toFixed(v.add(offset(bits)), width(bits))
  }

  def decodeUnsigned(b: Array[Byte], bits: Int = Bits): BigInteger = {
    require(b.length == width(bits), s"expected ${width(bits)} bytes, got ${b.length}")
    new BigInteger(1, b)
  }

  def decodeSigned(b: Array[Byte], bits: Int = Bits): BigInteger =
    decodeUnsigned(b, bits).subtract(offset(bits))

  private def toFixed(nonNeg: BigInteger, w: Int): Array[Byte] = {
    val raw = nonNeg.toByteArray // may have a leading 0x00 sign byte or be short
    val out = new Array[Byte](w)
    val src = if (raw.length > w) raw.length - w else 0
    val dst = if (raw.length < w) w - raw.length else 0
    val n = math.min(raw.length, w)
    System.arraycopy(raw, src, out, dst, n)
    out
  }

  // ---- static helpers shared by interpreted eval and generated code ------
  def fromDecStrOrNull(s: UTF8String, signed: Boolean, bits: Int): Array[Byte] =
    try {
      val bi = new BigInteger(s.toString.trim)
      if (signed) encodeSigned(bi, bits) else encodeUnsigned(bi, bits)
    } catch { case _: NumberFormatException | _: IllegalArgumentException => null }

  def toDecStrOrNull(b: Array[Byte], signed: Boolean, bits: Int): UTF8String =
    if (b.length != width(bits)) null
    else UTF8String.fromString(
      (if (signed) decodeSigned(b, bits) else decodeUnsigned(b, bits)).toString)

  def arithOrNull(a: Array[Byte], b: Array[Byte], op: String, signed: Boolean,
      bits: Int): Array[Byte] = {
    if (a.length != width(bits) || b.length != width(bits)) return null
    val (x, y) =
      if (signed) (decodeSigned(a, bits), decodeSigned(b, bits))
      else (decodeUnsigned(a, bits), decodeUnsigned(b, bits))
    val z = op match {
      case "add" => x.add(y)
      case "sub" => x.subtract(y)
      case "mul" => x.multiply(y)
      case _ => return null
    }
    try { if (signed) encodeSigned(z, bits) else encodeUnsigned(z, bits) }
    catch { case _: IllegalArgumentException => null }
  }

  // ---- Column API --------------------------------------------------------
  def u256_from_str(c: Column, signed: Boolean = false, bits: Int = Bits): Column =
    ColumnBridge.column(U256FromDecStr(ColumnBridge.expression(c), signed, bits))
  def u256_to_str(c: Column, signed: Boolean = false, bits: Int = Bits): Column =
    ColumnBridge.column(U256ToDecStr(ColumnBridge.expression(c), signed, bits))
  def u256_add(a: Column, b: Column, signed: Boolean = false, bits: Int = Bits): Column =
    ColumnBridge.column(U256Arith(ColumnBridge.expression(a), ColumnBridge.expression(b), "add", signed, bits))
  def u256_mul(a: Column, b: Column, signed: Boolean = false, bits: Int = Bits): Column =
    ColumnBridge.column(U256Arith(ColumnBridge.expression(a), ColumnBridge.expression(b), "mul", signed, bits))
  def u256_sub(a: Column, b: Column, signed: Boolean = false, bits: Int = Bits): Column =
    ColumnBridge.column(U256Arith(ColumnBridge.expression(a), ColumnBridge.expression(b), "sub", signed, bits))
  def u256_sum(c: Column, signed: Boolean = false, bits: Int = Bits): Column =
    ColumnBridge.column(
      U256Sum(ColumnBridge.expression(c), signed, bits).toAggregateExpression())

  // ---- U256Sum helpers (residue arithmetic over the encoded bytes) -------

  /** running-sum buffer: 1 seen-flag byte + bits/8 unsigned residue bytes */
  def sumZero(bits: Int): Array[Byte] = new Array[Byte](1 + width(bits))

  /** fold one encoded value (offset-binary when signed) into the buffer,
    * wrapping mod 2^bits — ClickHouse sum semantics over wide ints
    * (native wrap-around adds), deliberately unlike the permissive-NULL
    * scalar [[arithOrNull]]: a distributed fold cannot usefully
    * null-propagate a transient overflow. */
  def sumUpdate(buf: Array[Byte], v: Array[Byte], signed: Boolean,
      bits: Int): Array[Byte] = {
    if (v.length != width(bits)) return buf // malformed input rows are skipped
    val x = if (signed) decodeSigned(v, bits) else decodeUnsigned(v, bits)
    addResidue(buf, x, bits)
  }

  /** merge two buffers: residues add mod 2^bits, seen-flags OR */
  def sumMerge(a: Array[Byte], b: Array[Byte], bits: Int): Array[Byte] = {
    if (b(0) == 0) return a
    val r = addResidue(a, new BigInteger(1, java.util.Arrays.copyOfRange(b, 1, b.length)), bits)
    r(0) = 1; r
  }

  private def addResidue(buf: Array[Byte], x: BigInteger, bits: Int): Array[Byte] = {
    val cur = new BigInteger(1, java.util.Arrays.copyOfRange(buf, 1, buf.length))
    val next = cur.add(x.mod(BigInteger.ONE.shiftLeft(bits)))
      .mod(BigInteger.ONE.shiftLeft(bits))
    val out = sumZero(bits)
    out(0) = 1
    val enc = toFixed(next, width(bits))
    System.arraycopy(enc, 0, out, 1, enc.length)
    out
  }

  /** SQL semantics: NULL for an empty group; otherwise the residue read as
    * unsigned (or two's-complement when signed) re-encoded in the
    * order-preserving column encoding. */
  def sumEval(buf: Array[Byte], signed: Boolean, bits: Int): Array[Byte] = {
    if (buf(0) == 0) return null
    val residue = new BigInteger(1, java.util.Arrays.copyOfRange(buf, 1, buf.length))
    if (!signed) encodeUnsigned(residue, bits)
    else {
      val v = if (residue.testBit(bits - 1))
        residue.subtract(BigInteger.ONE.shiftLeft(bits))
      else residue
      encodeSigned(v, bits)
    }
  }
}

/** decimal string -> bits/8-byte encoding; NULL on malformed/out-of-range.
  * Codegen'd via a static helper call so surrounding whole-stage spans stay
  * intact; result nullability handled explicitly. */
case class U256FromDecStr(child: Expression, signed: Boolean, bits: Int = U256.Bits)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    U256.fromDecStrOrNull(v.asInstanceOf[UTF8String], signed, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.U256.fromDecStrOrNull($c, $signed, $bits);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bits/8-byte encoding -> canonical decimal string. */
case class U256ToDecStr(child: Expression, signed: Boolean, bits: Int = U256.Bits)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    U256.toDecStrOrNull(v.asInstanceOf[Array[Byte]], signed, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.U256.toDecStrOrNull($c, $signed, $bits);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** add/sub/mul over encoded wide values; NULL on overflow (permissive). */
case class U256Arith(left: Expression, right: Expression, op: String, signed: Boolean,
    bits: Int = U256.Bits)
    extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any =
    U256.arithOrNull(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], op, signed, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.U256.arithOrNull($a, $b, "$op", $signed, $bits);
      ${ev.isNull} = (${ev.value} == null);""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** SUM over encoded wide ints — a [[TypedImperativeAggregate]] whose buffer
  * is the running residue mod 2^bits (1 seen-flag byte + bits/8 bytes), so
  * partial aggregation, map-side combine, and buffer serialization are all
  * fixed-width byte copies. Wraps on overflow (ClickHouse wide-int sum
  * semantics — see [[U256.sumUpdate]]); NULL for an empty group (SQL SUM).
  * Closes SURVEY §7.4's "aggregation over wide ints" gap: ORDER BY / joins
  * were already free on the encoding, now the fold is too. */
case class U256Sum(child: Expression, signed: Boolean = false,
    bits: Int = U256.Bits,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): Array[Byte] = U256.sumZero(bits)
  override def update(buf: Array[Byte], input: org.apache.spark.sql.catalyst.InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else U256.sumUpdate(buf, v.asInstanceOf[Array[Byte]], signed, bits)
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    U256.sumMerge(a, b, bits)
  override def eval(buf: Array[Byte]): Any = U256.sumEval(buf, signed, bits)
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int): U256Sum =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): U256Sum =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}
