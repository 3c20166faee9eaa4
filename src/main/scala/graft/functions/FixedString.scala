package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse FixedString(n) semantics: a value is written as exactly n
  * bytes — the first min(len, n) bytes of the UTF-8 value, zero-padded to n
  * (reference `src/table_info.rs:140-146`; parameter parse `:185-192`).
  *
  * Codegen'd (defineCodeGen): FixedString columns can appear on every row of
  * a change stream, so this must not break whole-stage codegen spans.
  */
object FixedString {
  def fixed_string_encode(c: Column, n: Int): Column =
    ColumnBridge.column(FixedStringEncode(ColumnBridge.expression(c), n))
  def fixed_string_decode(c: Column): Column =
    ColumnBridge.column(FixedStringDecode(ColumnBridge.expression(c)))

  def encode(bytes: Array[Byte], n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    System.arraycopy(bytes, 0, out, 0, math.min(bytes.length, n))
    out
  }

  /** strip trailing zero padding (for reading FixedString back as text) */
  def decode(b: Array[Byte]): Array[Byte] = {
    var end = b.length
    while (end > 0 && b(end - 1) == 0) end -= 1
    java.util.Arrays.copyOf(b, end)
  }
}

case class FixedStringEncode(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0, s"FixedString width must be positive, got $n")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    FixedString.encode(v.asInstanceOf[UTF8String].getBytes, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FixedString.encode($c.getBytes(), $n)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class FixedStringDecode(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromBytes(FixedString.decode(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromBytes(graft.functions.FixedString.decode($c))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
