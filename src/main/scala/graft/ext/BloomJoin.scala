package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Bloom

/** Runtime Bloom pre-filtering for shuffle equi-joins.
  *
  * The 100-TB shape this solves: fact ⋈ dim where dim is too big to
  * broadcast (so Catalyst picks a sort-merge/shuffled-hash join) but most
  * fact rows have no partner. Both sides then pay a full shuffle — including
  * every fact row that will be dropped by the join anyway. Building a Bloom
  * filter over dim's join keys (a few KB–MB of bits for millions of keys)
  * and filtering fact BEFORE the exchange removes those rows from the
  * shuffle entirely; the filter rides into the fact-side SCAN stage, inside
  * whole-stage codegen.
  *
  * Guarantees: no false negatives — the pre-filtered join is
  * result-identical to the plain join (false positives are eliminated by
  * the join itself). The build is one pass over dim's keys: k explode'd bit
  * positions, grouped into 64-bit words, `bit_or`-combined per word; only
  * the mBits/64 word values reach the driver (4 KB at the default 2^18
  * bits), never the keys.
  *
  * Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k. The 2^18-bit default
  * holds ~25k keys at k=5 under 1% FPR; size mBits ≈ 10·n for ~1% at the
  * optimal k ≈ 0.7·m/n.
  */
object BloomJoin {

  /** Build the bit array over `keys`' LONG column `keyCol` — distributed
    * bit_or, driver sees only mBits/64 longs. */
  def buildBits(keys: DataFrame, keyCol: String, mBits: Int, k: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    val words = keys
      .select(explode(Bloom.bloomPositions(col(keyCol).cast("long"), mBits, k)).as("pos"))
      .select(shiftright(col("pos"), 6).as("word"),
        expr("shiftleft(1L, cast(pos & 63 as int))").as("bit"))
      .groupBy("word").agg(expr("bit_or(bit)").as("bits"))
      .collect()
    val arr = new Array[Long](mBits / 64)
    words.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** fact ⋈ dim on factKey = dimKey, with fact Bloom-pruned before the
    * exchange. `joinType` must be fact-witnessed (inner/left-semi): an outer
    * fact row dropped by the Bloom would lose its null-padded output. */
  def prefilteredJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, mBits: Int = 1 << 18, k: Int = 5,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "semi", "leftsemi", "left_semi")(
      joinType.toLowerCase(java.util.Locale.ROOT)),
      s"prefilteredJoin supports inner/semi joins only, got '$joinType'")
    val bits = buildBits(dim.select(col(dimKey)), dimKey, mBits, k)
    val pruned = prefilter(fact, col(factKey), bits, k)
    pruned.join(dim, pruned(factKey) === dim(dimKey),
      if (joinType == "inner") "inner" else "left_semi")
  }

  /** The probe-side predicate on its own, for callers composing manually
    * (e.g. pruning before an aggregation instead of a join). */
  def prefilter(df: DataFrame, key: Column, bits: Array[Long], k: Int): DataFrame =
    df.filter(Bloom.mightContain(key.cast("long"), bits, k))
}
