package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fnv

/** Portable HyperLogLog on the fmix64(FNV-1a) hash basis.
  *
  * Exists alongside the built-in `approx_count_distinct` for the same
  * reason [[graft.functions.Fnv]] exists alongside `xxhash64`: the built-in
  * HLL's internals (hash, register layout, bias tables) are engine-specific
  * and can never be value-checked across engines, while this one is a few
  * columns + one groupBy whose every intermediate an independent engine can
  * replay exactly — register index from the hash's top `p` bits, rank =
  * leading zeros of the remaining bits + 1, max-rank per register, harmonic
  * mean (Flajolet et al., "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm", AofA 2007) with the standard
  * small-range linear-counting correction.
  *
  * The hash is FNV-1a passed through murmur3's fmix64 finalizer
  * ([[graft.functions.Fnv.fmix64]]): raw FNV bit-slices terribly (measured
  * on sequential keys: top-8-bit register index collapsed to 1-2 registers;
  * low bits came out under-dispersed, skewing linear counting +50%), while
  * the finalizer's avalanche brings every tested cardinality within 1.5σ of
  * truth and remains exactly SQL-replayable.
  *
  * Exactness discipline (what makes the estimate REPLAYABLE, not just
  * approximately equal):
  *  - rank comes from `bin()` string length (both engines print minimal
  *    binary), never `log2` — a 56-bit value converted to double can round
  *    UP across a power-of-two boundary and shift the rank;
  *  - the harmonic sum Σ 2^-rank is computed SCALED BY 2^maxRank as exact
  *    DECIMAL integer terms `2^(maxRank-rank)` — the unscaled double sum
  *    needs ~65 mantissa bits and would be association-order-sensitive;
  *  - the numerator α·m²·2^maxRank is folded to ONE double literal on the
  *    Scala side and interpolated into both engines, so the estimate is a
  *    single IEEE division both sides;
  *  - the `ln` in the small-range branch is absorbed by score rounding
  *    (the repo's established 1-ulp-libm convention).
  *
  * Scale: one projection + one `groupBy(idx)` over at most 2^p groups —
  * map-side partial max means the shuffle carries ≤ m rows per partition
  * regardless of input size. At 100 TB this is the cheapest distinct-count
  * available; the exact `count(distinct)` sibling is the expensive one.
  */
object Hll {

  /** α_m · m² · 2^maxRank — the whole estimate numerator as one double
    * (shared with the oracle builder so both engines divide the SAME
    * literal by the scaled sum). */
  private[graft] def numerator(p: Int): Double = {
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    alpha * m * m * math.pow(2.0, 65 - p)
  }

  /** The shared hash→(idx, rank) projection — ONE definition for every
    * register builder (ungrouped, grouped, and approxDistinct's
    * exact-witness variant), so the estimator basis can never drift
    * between paths. */
  private def idxRank(valueCol: String, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val maxRank = 64 - p + 1
    val h: Column = Fnv.fnv1a64mixed(col(valueCol).cast("string"))
    val idx = shiftrightunsigned(h, 64 - p)
    val w = h.bitwiseAND(lit((1L << (64 - p)) - 1))
    val rank = when(w === 0, lit(maxRank))
      .otherwise(lit(maxRank) - length(bin(w)))
    (idx, rank)
  }

  /** Register frame keyed by 0+ group columns — the one implementation
    * behind [[registers]] and [[registersBy]]. */
  private def regFrame(values: DataFrame, valueCol: String,
      groupCols: Seq[String], p: Int): DataFrame = {
    val (idx, rank) = idxRank(valueCol, p)
    values.select(groupCols.map(col) :+ idx.as("idx") :+ rank.as("rank"): _*)
      // NULL values hash to NULL and must not occupy a register: an
      // (idx=null, r=null) row would count in m_used but add nothing to
      // s_used, shrinking v_empty/z_scaled and inflating the estimate
      .where(col("idx").isNotNull)
      .groupBy(groupCols.map(col) :+ col("idx"): _*)
      .agg(max(col("rank")).as("r"))
  }

  /** The scaled-harmonic-mean + linear-counting estimate over a register
    * frame keyed by 0+ group columns — the one implementation behind
    * [[estimate]] and [[estimateBy]]. */
  private def estFrame(regs: DataFrame, groupCols: Seq[String],
      p: Int): DataFrame = {
    val m = 1 << p
    val maxRank = 64 - p + 1
    val aggs = Seq(count(lit(1)).as("m_used"),
      sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $maxRank - r) AS DECIMAL(38,0))"))
        .as("s_used"))
    val agged =
      if (groupCols.isEmpty) regs.agg(aggs.head, aggs.tail: _*)
      else regs.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    agged
      .select(groupCols.map(col) :+
        (lit(m.toLong) - col("m_used")).as("v_empty") :+
        (col("s_used") +
          (lit(m.toLong).cast("decimal(38,0)") - col("m_used").cast("decimal(38,0)")) *
            lit(1L << maxRank).cast("decimal(38,0)")).as("z_scaled"): _*)
      .select(groupCols.map(col) :+ round(
        when(
          lit(numerator(p)) / col("z_scaled").cast("double") <= lit(2.5 * m) &&
            col("v_empty") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
          .otherwise(lit(numerator(p)) / col("z_scaled").cast("double")),
        4).as("est_hll"): _*)
  }

  /** The mergeable sketch state: (idx, r) register frame of `valueCol`
    * (cast to string, fmix64(FNV-1a) hashed) — ≤ 2^p rows after the
    * map-side max, whatever the input size. */
  def registers(values: DataFrame, valueCol: String, p: Int = 8): DataFrame =
    regFrame(values, valueCol, Nil, p)

  /** Sketch merge = register-wise max — the property every distributed /
    * multi-set HLL use rests on: registers(A ∪ B) ≡ merge(registers(A),
    * registers(B)), exactly (pinned in HllSpec). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("idx")).agg(max(col("r")).as("r"))

  /** Per-group register frames in ONE pass: (groupCol, idx, r), ≤
    * |groups|·2^p rows — the materialized-sketch layout (one HLL per day /
    * partition / tenant) that [[mergeGrouped]] then rolls up without ever
    * rescanning the input. Same hash/rank pipeline as [[registers]]. */
  def registersBy(values: DataFrame, valueCol: String, groupCol: String,
      p: Int = 8): DataFrame =
    regFrame(values, valueCol, Seq(groupCol), p)

  /** Merge a grouped register frame down to one sketch (register-wise max
    * across all groups). */
  def mergeGrouped(regsBy: DataFrame): DataFrame =
    regsBy.groupBy(col("idx")).agg(max(col("r")).as("r"))

  /** [[registersBy]] carrying an exact per-register distinct count beside
    * the max rank (r17): a value hashes to exactly ONE register, so
    * `sum(nd)` over a group's registers is the group's exact NDV — the
    * grouped twin of [[approxDistinct]]'s exact witness, letting a lane
    * compute estimate + witness from ONE input scan. The extra `nd`/`v`
    * columns ride beside the estimator basis; [[estimateBy]] ignores them. */
  def registersByWithExact(values: DataFrame, valueCol: String,
      groupCol: String, p: Int = 8): DataFrame = {
    val (idx, rank) = idxRank(valueCol, p)
    values.select(col(groupCol), idx.as("idx"), rank.as("rank"),
        col(valueCol).cast("string").as("v"))
      .where(col("idx").isNotNull)
      .groupBy(col(groupCol), col("idx"))
      .agg(max(col("rank")).as("r"), countDistinct(col("v")).as("nd"))
  }

  /** Per-group estimates from a [[registersBy]] frame: (groupCol, est_hll)
    * — the grouped approximate-distinct shape (NDV per tenant/day/type)
    * with the same scaled-harmonic-mean + linear-counting branch as
    * [[estimate]], one ≤|groups|-row output. */
  def estimateBy(regsBy: DataFrame, groupCol: String, p: Int = 8): DataFrame =
    estFrame(regsBy, Seq(groupCol), p)

  /** One-row (est_hll) estimate from a register frame — the same scaled
    * harmonic mean + linear-counting branch as [[approxDistinct]], rounded
    * to 4 (replayable: integer registers in, one double division + one
    * log, both correctly rounded). */
  def estimate(regs: DataFrame, p: Int = 8): DataFrame =
    estFrame(regs, Nil, p)

  /** One-row frame: (m, v_empty, z_scaled STRING, est_hll, n_exact,
    * rel_err) for the distinct count of `valueCol` (cast to string and
    * FNV-1a hashed; duplicates collapse by construction).
    *
    * `p` in [4, 16] sets m = 2^p registers (default 8 → ~6.5% std error).
    * `z_scaled` (the exact scaled harmonic sum) is exported as STRING: it
    * can exceed 2^63 and decimal/int128 dataframe exports differ between
    * engines, while digit strings compare exactly.
    */
  def approxDistinct(values: DataFrame, valueCol: String, p: Int = 8): DataFrame = {
    val m = 1 << p
    val maxRank = 64 - p + 1
    val (idx, rank) = idxRank(valueCol, p)
    val regs = values
      .select(idx.as("idx"), rank.as("rank"),
        col(valueCol).cast("string").as("v"))
      .where(col("idx").isNotNull) // NULLs don't count (COUNT DISTINCT semantics)
      .groupBy(col("idx"))
      .agg(max(col("rank")).as("r"), countDistinct(col("v")).as("nd"))
    regs
      .agg(
        count(lit(1)).as("m_used"),
        sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $maxRank - r) AS DECIMAL(38,0))"))
          .as("s_used"),
        sum(col("nd")).as("n_exact"))
      .select(
        lit(m).as("m"),
        (lit(m.toLong) - col("m_used")).as("v_empty"),
        (col("s_used") +
          (lit(m.toLong).cast("decimal(38,0)") - col("m_used").cast("decimal(38,0)")) *
            lit(1L << maxRank).cast("decimal(38,0)")).as("z_scaled"),
        col("n_exact"))
      .select(col("m"), col("v_empty"),
        col("z_scaled").cast("string").as("z_scaled"),
        round(
          when(
            lit(numerator(p)) / col("z_scaled").cast("double") <= lit(2.5 * m) &&
              col("v_empty") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
            .otherwise(lit(numerator(p)) / col("z_scaled").cast("double")),
          4).as("est_hll"),
        col("n_exact"))
      .withColumn("rel_err",
        round((col("est_hll") - col("n_exact")) / col("n_exact").cast("double"), 4))
  }
}
