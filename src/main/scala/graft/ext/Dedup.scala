package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (the whole point — these run over billions of documents):
  *  - exact dedup is one hash-aggregate on a 128-bit fingerprint: map-side
  *    partial aggregation, single shuffle on the fingerprint;
  *  - MinHash signatures are computed scan-side in one codegen'd pass (no
  *    shuffle, no UDF: shingle → xxhash64 → k affine min-hashes as column
  *    algebra); only the b banded keys shuffle, so the join that finds
  *    candidates is equi-join on (band, band_hash) — never an all-pairs
  *    product. Pair verification (signature agreement) happens only inside
  *    buckets;
  *  - SimHash is a single LONG per doc; near-dup = bit_count(xor) ≤ k over
  *    LSH-bucketed candidates;
  *  - exact pairwise n-gram Jaccard is for SMALL slices / verification only
  *    (it is quadratic by nature and says so in its name).
  */
object Dedup {

  // ---- exact ---------------------------------------------------------------

  /** One row per distinct content: keeps the smallest id (deterministic
    * survivor), with the duplicate count. */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_dups"))

  /** Survivor rows only — the deduplicated corpus. */
  def exactDedup(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---- MinHash + LSH -------------------------------------------------------

  /** Large prime > any 32-bit hash bucket; affine perms stay positive. */
  private val Prime = 2147483647L // 2^31 - 1
  /** Fixed seeded affine permutation parameters (a odd, b arbitrary). */
  def minhashParams(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(r.nextLong()) % Prime | 1L, math.abs(r.nextLong()) % Prime))
  }

  /** Word n-gram shingles of the canonical tokens. Documents shorter than n
    * tokens contribute their full token string as a single shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** k-wide MinHash signature (ARRAY<BIGINT>) — pure column algebra. */
  def minhashSignature(text: Column, k: Int = 32, shingleN: Int = 3): Column = {
    // reduce the 64-bit shingle hash mod p BEFORE the affine map: both
    // factors stay < 2^31, so a*x+b < 2^62 never overflows (ANSI-safe)
    val sh = transform(shingles(text, shingleN), s => pmod(xxhash64(s), lit(Prime)))
    array(minhashParams(k).map { case (a, b) =>
      array_min(transform(sh, x => pmod(x * a + b, lit(Prime))))
    }: _*)
  }

  /** (id, band, band_hash) — one row per band per doc; the LSH key stream. */
  def lshBands(docs: DataFrame, textCol: String, idCol: String,
      bands: Int = 8, rows: Int = 4): DataFrame = {
    val sig = minhashSignature(col(textCol), k = bands * rows)
    docs.select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"), col("sig"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(array_join(
            transform(slice(col("sig"), b * rows + lit(1), lit(rows)), x => x.cast("string")), ","))
            .as("band_hash")))).as("bh"))
      .select(col("id"), col("sig"), col("bh.band").as("band"), col("bh.band_hash").as("band_hash"))
  }

  /** Candidate near-dup pairs from band collisions, verified by signature
    * agreement ≥ `threshold` (the MinHash Jaccard estimate). */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      bands: Int = 8, rows: Int = 4, threshold: Double = 0.5): DataFrame = {
    val b = lshBands(docs, textCol, idCol, bands, rows)
    val left = b.select(col("band"), col("band_hash"), col("id").as("id1"), col("sig").as("sig1"))
    val right = b.select(col("band"), col("band_hash"), col("id").as("id2"), col("sig").as("sig2"))
    left.join(right, Seq("band", "band_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sig1"), col("sig2"))
      .distinct()
      .withColumn("est_jaccard", round(sigAgreement(col("sig1"), col("sig2")), 6))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  /** Signature agreement fraction — the MinHash Jaccard estimator. */
  def sigAgreement(sig1: Column, sig2: Column): Column =
    size(filter(zip_with(sig1, sig2, (x, y) => x === y), b => b)).cast("double") /
      size(sig1)

  // ---- SimHash -------------------------------------------------------------

  /** doc → 64-bit simhash of its canonical tokens. */
  def simhash(text: Column): Column = SimHash.simhash64(TextAnalysis.tokens(text))

  /** Near-dup pairs by simhash: LSH over 4 16-bit bands of the fingerprint
    * (a pair within Hamming ≤ maxHamming almost surely agrees on ≥1 band),
    * then exact bit_count verification. */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 6): DataFrame = {
    val withSig = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = withSig.select(col("id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("sh"), b * 16).bitwiseAND(0xffffL).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sh"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.select(col("band"), col("key"), col("id").as("id1"), col("sh").as("sh1"))
    val r = banded.select(col("band"), col("key"), col("id").as("id2"), col("sh").as("sh2"))
    l.join(r, Seq("band", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sh1"), col("sh2")).distinct()
      .withColumn("hamming", SimHash.hamming(col("sh1"), col("sh2")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id1"), col("id2"), col("hamming"))
  }

  // ---- exact n-gram Jaccard (quadratic; small slices / verification) -------

  /** Pairwise word-set Jaccard over a (small) doc set. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      minJaccard: Double): DataFrame = {
    val withSets = docs.select(col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(col(textCol))).as("words"))
    val a = withSets.select(col("id").as("id1"), col("words").as("w1"))
    val b = withSets.select(col("id").as("id2"), col("words").as("w2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("jaccard",
        size(array_intersect(col("w1"), col("w2"))).cast("double") /
          size(array_union(col("w1"), col("w2"))))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }
}
