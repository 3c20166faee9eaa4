package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{ColumnBridge, ExpectsStringInput}
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

  /** murmur3's public fmix64 finalizer. FNV-1a alone is the right basis for
    * equality-style sketches (MinHash/SimHash compare hashes for equality,
    * where FNV's structure is harmless), but BIT-SLICING the hash — HLL's
    * register index from some bits, rank from others — needs avalanche in
    * every output bit, which FNV lacks on short/sequential keys (high bits
    * barely move; low bits come out under-dispersed, i.e. MORE even than
    * random). The three xor-shift/multiply rounds fix both, and stay
    * SQL-replayable: xor + 32-bit-split multiply mod 2^64 in HUGEINT. */
  def fmix64(h0: Long): Long = {
    var h = h0
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 29); h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 32)
  }

  /** static helper the generated code calls */
  def computeMixed(s: UTF8String): Long = fmix64(compute(s))

  /** STRING column -> 64-bit FNV-1a of its UTF-8 bytes (signed long). */
  def fnv1a64(c: Column): Column =
    ColumnBridge.column(Fnv1a64(ColumnBridge.expression(c)))

  /** STRING column -> fmix64(FNV-1a): full-avalanche 64-bit hash for
    * bit-slicing consumers (HLL). */
  def fnv1a64mixed(c: Column): Column =
    ColumnBridge.column(FnvMix64(ColumnBridge.expression(c)))
}

/** string -> LONG FNV-1a hash; non-STRING children are rejected at analysis
  * time (ExpectsStringInput), not as a codegen/ClassCastException at runtime. */
case class Fnv1a64(child: Expression) extends UnaryExpression with ExpectsStringInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Fnv.compute(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv.compute($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** string -> LONG fmix64(FNV-1a) full-avalanche hash */
case class FnvMix64(child: Expression) extends UnaryExpression with ExpectsStringInput {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = Fnv.computeMixed(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv.computeMixed($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
