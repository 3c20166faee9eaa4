package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Count-Min Sketch for heavy-hitter counting.
  *
  * The fourth portable sketch on the FNV-1a basis (after MinHash, SimHash,
  * and the HLL in [[Hll]]): a d×w counter grid where item i increments
  * counter (j, bucket_j(i)) for each of d hash rows, and the estimate for
  * an item is the MIN over its d counters (Cormode & Muthukrishnan, "An
  * improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005). Collisions only ever ADD counts, so
  * the error is one-sided: estimate ≥ true count always, and ≤ true count
  * + εN with probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Why this beats exact counting at 100 TB: the exact token→count table is
  * as large as the vocabulary (billions of rows for web-scale n-gram
  * streams), while the sketch is d·w counters REGARDLESS of input size —
  * and it is mergeable (cell-wise sum), so per-partition sketches combine
  * map-side exactly like any algebraic aggregate. The build below is one
  * explode of d (row, bucket) cells per item followed by one hash-agg whose
  * map-side combine means at most d·w rows per partition ever shuffle.
  *
  * Portability discipline (same as MinHash/HLL): bucket_j(i) =
  * ((fnv1a(i) mod P) · a_j + b_j mod P) mod w with P = 2^31-1 and seeded
  * affine params — every intermediate fits a signed 64-bit lane (no ANSI
  * overflow: (P-1)·a_j + b_j < 2^62) and any engine with md5-class string
  * ops can replay the exact grid and estimates in SQL.
  */
object Cms {

  /** Same modulus as the MinHash affine family — hashes reduced mod P keep
    * every downstream product inside a signed 64-bit lane. */
  private val Prime = 2147483647L // 2^31 - 1

  /** Seeded affine row parameters (a odd so the map permutes, b arbitrary).
    * Distinct seed from the MinHash family: sketch independence should not
    * silently hinge on two operators sharing constants. */
  def cmsParams(d: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(d)((math.abs(r.nextLong()) % Prime | 1L, math.abs(r.nextLong()) % Prime))
  }

  /** FNV-1a base hash of the item, reduced mod P (ANSI-safe for the affine
    * rows). */
  private[ext] def baseHash(item: Column): Column =
    pmod(graft.functions.Fnv.fnv1a64(item), lit(Prime))

  /** Bucket of hash `h` in row (a, b): ((h·a + b) mod P) mod w. */
  private[ext] def bucket(h: Column, a: Long, b: Long, w: Int): Column =
    pmod(h * a + b, lit(Prime)) % w

  /** Build the sketch over `items(itemCol)` (one increment per ROW — feed
    * an exploded token stream for token counts): returns (row, bucket, cnt)
    * with at most d·w rows. One generate + one hash-agg; map-side combine
    * bounds the shuffle at d·w rows per partition regardless of input
    * size. */
  def sketch(items: DataFrame, itemCol: String, d: Int = 4, w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1 and w >= 1, got d=$d w=$w")
    val h = baseHash(col(itemCol))
    val cells = cmsParams(d).zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("row"), bucket(h, a, b, w).as("bucket"))
    }
    items.select(explode(array(cells: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate counts for `candidates(itemCol)` against a built
    * sketch: min over the d row counters. The sketch is at most d·w rows —
    * Catalyst broadcasts it, so estimation never shuffles the candidate
    * side. Items absent from the build see only collision mass (still ≥ 0,
    * still one-sided). */
  def estimate(sk: DataFrame, candidates: DataFrame, itemCol: String,
      d: Int = 4, w: Int = 256): DataFrame = {
    val h = baseHash(col(itemCol))
    val cells = cmsParams(d).zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("row"), bucket(h, a, b, w).as("bucket"))
    }
    val passthrough = candidates.columns.map(col)
    candidates
      .select(passthrough :+ explode(array(cells: _*)).as("rb"): _*)
      .join(broadcast(sk),
        col("rb.row") === sk("row") && col("rb.bucket") === sk("bucket"), "left")
      .groupBy(passthrough: _*)
      // a row with no counter means nothing ever hashed there: count 0
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }
}
