package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{array, coalesce}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram spans built IN-ROW as one codegen'd expression (r17,
  * guide §2.3/§2.4 — "aggregate before you shuffle" / "remove shuffles
  * outright").
  *
  * The previous shingle stream (`Dedup.shingleFramePos`) posexploded the
  * token array and rebuilt each n-gram from window `lead`s over (id, pos):
  * correct, but it EXCHANGED the corpus-sized token stream (one row per
  * token) and sorted it per doc before a single shingle existed — the
  * single largest shuffle shared by the ~20 dedup/text/graph lanes that
  * consume shingles. Every shingle of a document is a pure function of
  * that document's row, so the spans can be built inside the scan task and
  * exploded with ZERO exchanges; downstream per-id aggregates then get
  * map-side partial aggregation over locally-grouped rows (all of a doc's
  * spans sit consecutively in its scan task), so what finally shuffles is
  * the REDUCED frame (e.g. one signature row per doc), not the token
  * stream.
  *
  * Output semantics are IDENTICAL to the window formulation (differential-
  * pinned in DedupSpec): docs with >= n tokens emit one (ntok, pos,
  * shingle) struct per full-width n-gram; shorter non-empty docs emit one
  * (ntok, 0, whole-token-string) struct; empty/null docs emit one
  * (0, null, "") struct.
  */
object Shingles {
  private val SEP = UTF8String.fromString(" ")

  val spanStructType: StructType = StructType(Seq(
    StructField("ntok", LongType, nullable = false),
    StructField("pos", IntegerType, nullable = true),
    StructField("shingle", StringType, nullable = false)))

  /** static helper the generated code calls */
  def spans(arr: ArrayData, n: Int): ArrayData = {
    val ntok = arr.numElements()
    if (ntok == 0)
      return new GenericArrayData(Array[Any](
        new GenericInternalRow(Array[Any](0L, null, UTF8String.EMPTY_UTF8))))
    val toks = new Array[UTF8String](ntok)
    var i = 0
    while (i < ntok) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (ntok < n) {
      // short doc: its whole token string once (concat_ws semantics)
      return new GenericArrayData(Array[Any](new GenericInternalRow(
        Array[Any](ntok.toLong, 0, UTF8String.concatWs(SEP, toks: _*)))))
    }
    val out = new Array[Any](ntok - n + 1)
    var p = 0
    while (p <= ntok - n) {
      val win = java.util.Arrays.copyOfRange(toks, p, p + n)
      out(p) = new GenericInternalRow(
        Array[Any](ntok.toLong, p, UTF8String.concatWs(SEP, win: _*)))
      p += 1
    }
    new GenericArrayData(out)
  }

  /** ARRAY<STRING> tokens → ARRAY<STRUCT<ntok, pos, shingle>> spans. A null
    * token array (null text) behaves like an empty one, matching the old
    * `posexplode_outer` row. */
  def spansCol(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleSpans(ColumnBridge.expression(
      coalesce(tokens, array().cast("array<string>"))), n))
}

/** ARRAY<STRING> → ARRAY<STRUCT<ntok LONG, pos INT, shingle STRING>> span
  * structs; static-call codegen keeps the whole-stage span intact. */
case class ShingleSpans(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType =
    ArrayType(Shingles.spanStructType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Shingles.spans(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingles.spans($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
