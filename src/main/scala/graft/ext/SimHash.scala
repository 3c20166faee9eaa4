package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, ExpectsStringArrayInput}
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash over a token array: every token hashes to 64 bits; each
  * bit position accumulates +1/−1 votes across tokens; the sign of each
  * accumulator becomes the output bit. Near-duplicate documents land within
  * a few bits of Hamming distance, so `bit_count(a ^ b) <= k` is the
  * near-dup predicate — cheap enough to run pairwise inside LSH buckets, or
  * to band the 64 bits themselves into LSH keys.
  *
  * Token hashing is FNV-1a (stable, dependency-free). The per-row loop is a
  * custom codegen'd expression (a static call, so whole-stage codegen spans
  * stay intact); everything around it is built-in column algebra.
  */
object SimHash {
  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def fnv1a(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** static helper the generated code calls */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}

/** tokens ARRAY<STRING> -> LONG simhash; wrong-typed children are rejected
  * at analysis time (ExpectsStringArrayInput), not as a runtime cast failure. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsStringArrayInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = SimHash.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.SimHash.compute($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
