package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Fnv

/** One-pass multi-column table profiling — the ANALYZE-shaped statistics
  * pass a planner (or a pipeline operator choosing join strategies and
  * salt factors) runs before touching 100 TB: per column, row count, null
  * count, EXACT distinct count, and the portable-HLL estimate, all from a
  * SINGLE scan of the input.
  *
  * Shape: the chosen columns are melted to (col_name, value-as-string)
  * pairs with one `explode` (k× rows, still one scan — the alternative,
  * k `count(distinct)`s in one aggregate, plans an Expand with a shuffle
  * k+1× the input and no reuse), then ONE two-level aggregate:
  * (col, register) partials — bounded by k·2^p groups after map-side
  * combine — roll up to per-column stats. The exact NDV rides the same
  * pass as the sketch because per-register distinct counts sum to the
  * global (a value hashes to exactly one register — the
  * [[Hll.approxDistinct]] identity); at true scale the exact column is
  * the expensive part and callers drop it, leaving a shuffle bounded by
  * k·2^p rows regardless of input size.
  *
  * NULL semantics match SQL: nulls count in `n_null`, never in either
  * NDV (the FNV hash null-propagates, so null values fall into a null
  * register that the estimate excludes).
  */
object Profile {

  /** Equi-WIDTH histogram of a numeric column: bucket = floor((v − lo) /
    * width) clamped to [0, buckets), with per-bucket count and observed
    * min/max. TWO passes and no global sort — the 1-row (lo, hi) frame
    * broadcasts back onto the scan. (The equi-DEPTH variant needs a total
    * order: fine on an ANALYZE sample, a single-partition ntile sort on
    * the full table — deliberately not offered at this layer.) Nulls are
    * excluded, like every SQL aggregate here. A constant column collapses
    * to one bucket 0. */
  def equiWidthHistogram(df: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val g = df.agg(min(col(valueCol)).as("__lo"), max(col(valueCol)).as("__hi"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(g))
      .withColumn("bucket",
        when(col("__hi") === col("__lo"), lit(0)).otherwise(
          least(lit(buckets - 1),
            floor((col(valueCol) - col("__lo")) /
              ((col("__hi") - col("__lo")) / buckets)))).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi"))
  }

  def profile(df: DataFrame, cols: Seq[String], p: Int = 8): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val maxRank = 64 - p + 1
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.c").as("c"), col("e.v").as("v"))
    val h: Column = Fnv.fnv1a64mixed(col("v")) // null in -> null out
    val idx = shiftrightunsigned(h, 64 - p)
    val w = h.bitwiseAND(lit((1L << (64 - p)) - 1))
    val rank = when(w === 0, lit(maxRank))
      .otherwise(lit(maxRank) - length(bin(w)))
    val perReg = melted
      .select(col("c"), col("v"), idx.as("idx"), rank.as("rank"))
      .groupBy(col("c"), col("idx"))
      .agg(max(col("rank")).as("r"),
        countDistinct(col("v")).as("nd"),
        count(lit(1)).as("cnt"),
        count(col("v")).as("nn"))
    val live = col("idx").isNotNull
    perReg
      .groupBy(col("c"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        (sum(col("cnt")) - sum(col("nn"))).as("n_null"),
        sum(col("nd")).as("ndv_exact"),
        count(when(live, lit(1))).as("m_used"),
        sum(when(live,
          expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $maxRank - r) AS DECIMAL(38,0))")))
          .as("s_used"))
      .select(col("c").as("col_name"), col("n_rows"), col("n_null"),
        col("ndv_exact"),
        (coalesce(col("s_used"), lit(0).cast("decimal(38,0)")) +
          (lit(m.toLong).cast("decimal(38,0)") - col("m_used").cast("decimal(38,0)")) *
            lit(1L << maxRank).cast("decimal(38,0)")).as("z_scaled"),
        (lit(m.toLong) - col("m_used")).as("v_empty"))
      .select(col("col_name"), col("n_rows"), col("n_null"), col("ndv_exact"),
        round(
          when(
            lit(Hll.numerator(p)) / col("z_scaled").cast("double") <= lit(2.5 * m) &&
              col("v_empty") > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / col("v_empty").cast("double")))
            .otherwise(lit(Hll.numerator(p)) / col("z_scaled").cast("double")),
          4).as("ndv_est"))
  }
}
