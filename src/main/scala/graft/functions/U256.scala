package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** 256-bit integer support.
  *
  * ClickHouse UInt256/Int256 exceed Spark's DecimalType(38,0) (≈126 bits),
  * so values are encoded as fixed 32-byte big-endian binaries whose unsigned
  * lexicographic byte order equals numeric order — Spark's native BinaryType
  * comparator (unsigned, lexicographic) then gives free ORDER BY / range
  * predicates / joins on 256-bit values with zero custom physical operators.
  * Signed Int256 uses offset-binary (sign bit flipped) to stay
  * order-compatible under the same unsigned comparator.
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
  * These are interpreted expressions (CodegenFallback): 256-bit columns are
  * rare sink-boundary values, not hot-path scan columns, so breaking a
  * whole-stage-codegen span here is acceptable; comparisons/sorts on the
  * encoded binary stay fully codegen'd because they use built-in BinaryType
  * ops.
  */
object U256 {
  val Width = 32
  val UMax: BigInteger = BigInteger.ONE.shiftLeft(256).subtract(BigInteger.ONE)
  val IMax: BigInteger = BigInteger.ONE.shiftLeft(255).subtract(BigInteger.ONE)
  val IMin: BigInteger = BigInteger.ONE.shiftLeft(255).negate()
  private val Offset = BigInteger.ONE.shiftLeft(255)

  /** unsigned value -> 32-byte big-endian */
  def encodeUnsigned(v: BigInteger): Array[Byte] = {
    require(v.signum() >= 0 && v.compareTo(UMax) <= 0, s"out of UInt256 range: $v")
    toFixed(v)
  }

  /** signed value -> offset-binary 32 bytes (order-preserving) */
  def encodeSigned(v: BigInteger): Array[Byte] = {
    require(v.compareTo(IMin) >= 0 && v.compareTo(IMax) <= 0, s"out of Int256 range: $v")
    toFixed(v.add(Offset))
  }

  def decodeUnsigned(b: Array[Byte]): BigInteger = {
    require(b.length == Width, s"expected $Width bytes, got ${b.length}")
    new BigInteger(1, b)
  }

  def decodeSigned(b: Array[Byte]): BigInteger =
    decodeUnsigned(b).subtract(Offset)

  private def toFixed(nonNeg: BigInteger): Array[Byte] = {
    val raw = nonNeg.toByteArray // may have a leading 0x00 sign byte or be short
    val out = new Array[Byte](Width)
    val src = if (raw.length > Width) raw.length - Width else 0
    val dst = if (raw.length < Width) Width - raw.length else 0
    val n = math.min(raw.length, Width)
    System.arraycopy(raw, src, out, dst, n)
    out
  }

  // ---- Column API --------------------------------------------------------
  def u256_from_str(c: Column, signed: Boolean = false): Column =
    ColumnBridge.column(U256FromDecStr(ColumnBridge.expression(c), signed))
  def u256_to_str(c: Column, signed: Boolean = false): Column =
    ColumnBridge.column(U256ToDecStr(ColumnBridge.expression(c), signed))
  def u256_add(a: Column, b: Column, signed: Boolean = false): Column =
    ColumnBridge.column(U256Arith(ColumnBridge.expression(a), ColumnBridge.expression(b), "add", signed))
  def u256_mul(a: Column, b: Column, signed: Boolean = false): Column =
    ColumnBridge.column(U256Arith(ColumnBridge.expression(a), ColumnBridge.expression(b), "mul", signed))
  def u256_sub(a: Column, b: Column, signed: Boolean = false): Column =
    ColumnBridge.column(U256Arith(ColumnBridge.expression(a), ColumnBridge.expression(b), "sub", signed))
}

/** decimal string -> 32-byte encoding; NULL on malformed/out-of-range. */
case class U256FromDecStr(child: Expression, signed: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    try {
      val s = v.asInstanceOf[UTF8String].toString.trim
      val bi = new BigInteger(s)
      if (signed) U256.encodeSigned(bi) else U256.encodeUnsigned(bi)
    } catch { case _: NumberFormatException | _: IllegalArgumentException => null }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 32-byte encoding -> canonical decimal string. */
case class U256ToDecStr(child: Expression, signed: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    if (b.length != U256.Width) null
    else {
      val bi = if (signed) U256.decodeSigned(b) else U256.decodeUnsigned(b)
      UTF8String.fromString(bi.toString)
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** add/sub/mul over encoded 256-bit values; NULL on overflow (permissive). */
case class U256Arith(left: Expression, right: Expression, op: String, signed: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
    if (a.length != U256.Width || b.length != U256.Width) return null
    val (x, y) =
      if (signed) (U256.decodeSigned(a), U256.decodeSigned(b))
      else (U256.decodeUnsigned(a), U256.decodeUnsigned(b))
    val z = op match {
      case "add" => x.add(y)
      case "sub" => x.subtract(y)
      case "mul" => x.multiply(y)
      case _ => return null
    }
    try { if (signed) U256.encodeSigned(z) else U256.encodeUnsigned(z) }
    catch { case _: IllegalArgumentException => null }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
