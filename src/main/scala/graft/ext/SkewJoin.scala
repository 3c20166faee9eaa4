package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salting for skewed equi-joins — the manual fallback when AQE's skew-join
  * split isn't available (e.g. bucketed inputs) or the skew lives in a
  * broadcast-ineligible dimension.
  *
  * Big side: each row gets a deterministic salt in [0, n) hashed from the
  * whole row, splitting a hot key's rows across n reducer partitions.
  * Small side: exploded n× (one copy per salt) so every (key, salt) pair
  * still matches. Join keys become (key, salt); results are identical to
  * the unsalted join, but the hot key's work spreads over n tasks instead
  * of one straggler.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // Only join types where every output row is witnessed by a big-side row
    // are salting-safe: with right/full outer, an unmatched small-side row
    // exists `salt` times and would surface as `salt` null-padded duplicates.
    // Normalized like Spark's own JoinType parsing (case/underscore-blind).
    require(Set("inner", "left", "leftouter")(
      joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType'")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salt)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall,
      saltedBig(key) === saltedSmall(key) && saltedBig("__salt") === saltedSmall("__salt"),
      joinType)
      .drop(saltedSmall(key))
      .drop("__salt")
  }
}
