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
    * broadcasts back onto the scan. (The equi-DEPTH variant,
    * [[equiDepthHistogram]], needs a total order — see its sampling
    * contract.) Nulls are excluded, like every SQL aggregate here. A
    * constant column collapses to one bucket 0. */
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

  /** Equi-DEPTH histogram of a numeric column: `buckets` quantile groups
    * of (near-)equal population via `ntile` over the (value, id) total
    * order, reporting each group's count and [lo, hi] boundary — the
    * ANALYZE statistic planners build range predicates and sort-merge
    * splits from. The unique `idCol` tiebreaker makes the tiling a pure
    * function of the data (standard ntile remainder rule: the first
    * n mod k tiles take one extra row — identical in every SQL engine, so
    * the whole frame replays value-for-value).
    *
    * Scale contract: a total order cannot be sharded, so the ordered
    * window IS single-partition. That is correct usage at ANALYZE scale —
    * pass `sampleRate < 1` to bound the sorted row count first (the same
    * deterministic seeded-md5 fence as [[Sampling.stratifiedSample]], a
    * zero-shuffle scan-side filter that an independent engine replays
    * exactly); boundaries from a t-row sample are within O(1/sqrt(t)) of
    * the true quantiles, which is what a planner statistic needs. The
    * full-table exact form (`sampleRate = 1`) is for modest inputs. */
  def equiDepthHistogram(df: DataFrame, valueCol: String, idCol: String,
      buckets: Int = 10, sampleRate: Double = 1.0,
      seed: String = "depth", withNdv: Boolean = false): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bounded =
      if (sampleRate >= 1.0) df
      else Sampling.weightedSample(df, lit(sampleRate), idCol, seed)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(valueCol), col(idCol))
    val aggs = Seq(count(lit(1)).as("n"),
      min(col(valueCol)).as("lo"), max(col(valueCol)).as("hi")) ++
      // per-bin distinct count — what the CBO's HistogramBin carries
      // (CboStats.feedHistogram); opt-in so the lane schema stays fixed
      (if (withNdv) Seq(count_distinct(col(valueCol)).as("ndv")) else Nil)
    bounded.filter(col(valueCol).isNotNull)
      .withColumn("bucket", ntile(buckets).over(w))
      .groupBy(col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** `exact = false` is the 100 TB mode: the per-register
    * `countDistinct(v)` leg is dropped, so the map-side partial no longer
    * tracks the distinct value set per (col, register) group — the shuffle
    * stays k·2^p rows but each row shrinks from a value set to three
    * counters, and `ndv_exact` comes back NULL (same schema, HLL-only
    * estimates). The 10× delta is recorded in PLANS.md. */
  def profile(df: DataFrame, cols: Seq[String], p: Int = 8,
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val maxRank = 64 - p + 1
    // r17: the melt + hash/rank projection + per-(col, register) partial
    // aggregation all run inside the scan task — on a single-row-group
    // input that serializes k·rows of work onto one core. The guard
    // hash-repartitions the narrow source rows only when the scan yields
    // fewer partitions than the session parallelism (identity at scale).
    val melted = Dedup.withMinParallelism(df.select(cols.map(col): _*), cols: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("e"))
      .select(col("e.c").as("c"), col("e.v").as("v"))
    val h: Column = Fnv.fnv1a64mixed(col("v")) // null in -> null out
    val idx = shiftrightunsigned(h, 64 - p)
    val w = h.bitwiseAND(lit((1L << (64 - p)) - 1))
    val rank = when(w === 0, lit(maxRank))
      .otherwise(lit(maxRank) - length(bin(w)))
    val ndLeg =
      if (exact) countDistinct(col("v")).as("nd")
      else max(lit(null).cast("long")).as("nd")
    val perReg = melted
      .select(col("c"), col("v"), idx.as("idx"), rank.as("rank"))
      .groupBy(col("c"), col("idx"))
      .agg(max(col("rank")).as("r"),
        ndLeg,
        count(lit(1)).as("cnt"),
        count(col("v")).as("nn"))
    val live = col("idx").isNotNull
    perReg
      .groupBy(col("c"))
      .agg(
        sum(col("cnt")).as("n_rows"),
        (sum(col("cnt")) - sum(col("nn"))).as("n_null"),
        (if (exact) sum(col("nd")) else max(lit(null).cast("long"))).as("ndv_exact"),
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

  // ---- data-quality constraint suite ---------------------------------------
  // The validation gate a pipeline runs before training on (or publishing)
  // a table: each check reduces a full scan to ONE (n_rows, n_violations)
  // row, so the whole suite is a union of broadcast-sized frames — cost is
  // one pass per involved table regardless of corpus size, and every check
  // is a plain aggregate the oracle replays verbatim.

  /** Row-predicate check: rows where `violation` is true. */
  def predicateCheck(name: String, df: DataFrame, violation: Column): DataFrame =
    df.agg(count(lit(1)).as("n_rows"), count_if(violation).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))

  /** Uniqueness check on a key column: violations = rows − distinct keys
    * (NULL keys are each their own violation — count_distinct skips them). */
  def uniqueCheck(name: String, df: DataFrame, keyCol: String): DataFrame =
    df.agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count_distinct(col(keyCol))).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))

  /** Referential check: child rows whose key has no parent (left-anti
    * against the DISTINCT parent keys).
    *
    * `broadcastParent = true` pins the anti-join broadcast-side — correct
    * when the parent is dimension-sized. For a FACT-sized parent (the
    * `diag_constraints` lane checks lineitem→orders) a forced hint risks
    * exceeding the broadcast limit at scale, so the default leaves the
    * strategy to Catalyst/AQE, which broadcasts anyway whenever the
    * distinct-key set measures small at runtime. */
  def fkCheck(name: String, child: DataFrame, keyCol: String,
      parent: DataFrame, parentKeyCol: String,
      broadcastParent: Boolean = false): DataFrame = {
    val keys = parent.select(col(parentKeyCol).as(keyCol)).distinct()
    val orphans = child.join(
      if (broadcastParent) org.apache.spark.sql.functions.broadcast(keys)
      else keys,
      Seq(keyCol), "left_anti")
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_violations")))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"))
  }
}
