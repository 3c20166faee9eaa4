package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, ExpectsLongInput}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** A portable Bloom filter over LONG keys, as a pair of codegen'd Catalyst
  * expressions sharing ONE static position function — the build side and the
  * probe side can never drift apart.
  *
  * Purpose: runtime join pruning at shuffle-join scale. When the dimension
  * side of an equi-join is too large to broadcast but its KEY SET compresses
  * into a few KB of bits, filtering the fact side against those bits BEFORE
  * the exchange removes most non-matching rows from the shuffle — the same
  * idea as Spark's own `spark.sql.optimizer.runtime.bloomFilter` rewrite,
  * made explicit, deterministic, and engine-portable (the k probe positions
  * derive from fmix64(FNV-basis mixing) + double hashing — plain shifts and
  * multiplies any engine can replay).
  *
  * False positives only: a key that passes might not join (the join itself
  * removes it); a key that fails CANNOT join. The composed pre-filtered join
  * is therefore result-identical to the plain join — which is exactly what
  * its correctness oracle checks.
  *
  * Position math lives in Java-wrapping Scala (NOT Spark SQL arithmetic):
  * `h1 + i*h2` overflows by design, and ANSI mode would throw on the
  * column-algebra form.
  */
object Bloom {
  /** mixes the raw key before slicing — adjacent keys (TPC-H surrogate ids)
    * must not map to adjacent bit positions */
  private val h2Salt = 0x9e3779b97f4a7c15L // 2^64 / golden ratio

  /** the k bit positions of `key` in an m-bit filter (double hashing:
    * pos_i = (h1 + i·h2) mod m, h2 forced odd so the probe sequence cycles
    * through all residues for power-of-two m) */
  def positions(key: Long, mBits: Int, k: Int): ArrayData = {
    val h1 = Fnv.fmix64(key)
    val h2 = Fnv.fmix64(key ^ h2Salt) | 1L
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      out(i) = java.lang.Math.floorMod(h1 + i * h2, mBits.toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** true iff all k positions of `key` are set in `bits` (words of 64,
    * little-endian bit order within a word) */
  def contains(key: Long, bits: Array[Long], k: Int): Boolean = {
    val m = bits.length.toLong * 64
    val h1 = Fnv.fmix64(key)
    val h2 = Fnv.fmix64(key ^ h2Salt) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Math.floorMod(h1 + i * h2, m)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** LONG key column -> ARRAY<LONG> of its k bit positions (build side) */
  def bloomPositions(c: Column, mBits: Int, k: Int): Column =
    ColumnBridge.column(BloomPositions(ColumnBridge.expression(c), mBits, k))

  /** LONG key column -> BOOLEAN membership probe against `bits` */
  def mightContain(c: Column, bits: Array[Long], k: Int): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bits, k))
}

/** LONG key -> ARRAY<LONG> of k Bloom bit positions. */
case class BloomPositions(child: Expression, mBits: Int, k: Int)
    extends UnaryExpression with ExpectsLongInput {
  require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(k > 0, s"k must be positive, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    Bloom.positions(v.asInstanceOf[Long], mBits, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bloom.positions($c, $mBits, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LONG key -> does the broadcast-ed bit array possibly contain it. The bit
  * array rides into generated code as a referenced object (one array per
  * task, not per row). */
case class BloomMightContain(child: Expression, bits: Array[Long], k: Int)
    extends UnaryExpression with ExpectsLongInput {
  require(bits.nonEmpty, "empty bit array")
  require(k > 0, s"k must be positive, got $k")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any =
    Bloom.contains(v.asInstanceOf[Long], bits, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bloom.contains($c, $ref, $k)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
