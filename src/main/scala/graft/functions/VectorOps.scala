package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector primitives for embedding columns (ARRAY<FLOAT> / ARRAY<DOUBLE>).
  *
  * `zip_with` + `aggregate` express a dot product declaratively but run
  * interpreted (Spark higher-order functions have no codegen), costing a
  * lambda invocation per element per row. These expressions do the loop in
  * one static call, participate in whole-stage codegen, and read both
  * element types without conversion. Null/length-mismatch → NULL.
  */
object VectorOps {

  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  // element accessors chosen once per expression, not per element
  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** dot(a,b) or null when lengths differ. */
  def dotOrNull(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += get(a, i, aF) * get(b, i, bF); i += 1 }
    s
  }

  /** cosine(a,b) in one pass (dot + both norms); null on length mismatch or
    * zero-norm input. */
  def cosineOrNull(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, aF); val y = get(b, i, bF)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null else dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

abstract class VectorBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  protected def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }
}

case class ArrayDot(left: Expression, right: Expression) extends VectorBinary {
  override def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.dotOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.functions.VectorOps.dotOrNull($a, $b, ${isFloat(left)}, ${isFloat(right)});
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class CosineSim(left: Expression, right: Expression) extends VectorBinary {
  override def nullSafeEval(l: Any, r: Any): Any =
    VectorOps.cosineOrNull(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double r = graft.functions.VectorOps.cosineOrNull($a, $b, ${isFloat(left)}, ${isFloat(right)});
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r.doubleValue(); }""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
