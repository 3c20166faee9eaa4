package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit string hash as a codegen'd Catalyst expression.
  *
  * Exists alongside the built-in `xxhash64` for one reason: PORTABILITY.
  * MinHash signature tables are materialized to storage and re-derived by
  * other engines — the correctness oracle replays them in DuckDB SQL byte
  * for byte, and any downstream consumer (a Python audit job, another
  * warehouse) can do the same — because FNV-1a is a four-line xor/multiply
  * loop every engine can reproduce, while XXH64's striped lanes + avalanche
  * merge are not realistically replayable in SQL. Throughput is within
  * noise of xxhash64 on shingle-sized (tens of bytes) inputs, and the
  * static-call codegen keeps whole-stage spans intact.
  *
  * The byte loop itself lives in [[graft.ext.SimHash.fnv1a]] (shared with
  * the SimHash token hash, so the two sketches agree on their hash basis).
  */
object Fnv {
  /** static helper the generated code calls */
  def compute(s: UTF8String): Long = graft.ext.SimHash.fnv1a(s.getBytes)

  /** STRING column -> 64-bit FNV-1a of its UTF-8 bytes (signed long). */
  def fnv1a64(c: Column): Column =
    ColumnBridge.column(Fnv1a64(ColumnBridge.expression(c)))
}

/** string -> LONG FNV-1a hash */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Fnv.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv.compute($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
