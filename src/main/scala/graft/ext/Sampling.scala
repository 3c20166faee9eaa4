package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for training-corpus rebalancing.
  *
  * The common move: a web corpus is 80% one language (or one source), and
  * the training mix calls for downsampling the head stratum while keeping
  * the tail whole. Both operators here are pure column algebra over a
  * seeded md5 draw — no RNG state, no `rand()`: the same (seed, key) always
  * lands on the same side, so a re-run, a retry after executor loss, or
  * another engine replaying the pipeline selects the SAME sample. That
  * reproducibility is what makes sampling auditable at 100 TB: the sampled
  * corpus is a deterministic function of the input, not of the cluster's
  * task scheduling.
  *
  * Rate granularity is 1/65536 (16 bits of the draw) — a hex-string
  * comparison, same convention as the train/valid/test split, so any engine
  * with md5 replays the decision byte-for-byte.
  */
object Sampling {

  /** 16-bit draw in [0, 65536) as a 4-hex-char string, from md5(seed||key). */
  private[ext] def draw(seed: String, key: Column): Column =
    substring(md5(concat(lit(seed + ":"), key.cast("string")).cast("binary")), 1, 4)

  private[ext] def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    val t = math.floor(rate * 65536).toLong
    // rate 1.0 must keep EVERY row: 'g' sorts above every hex digit, so
    // `draw < 'g'` is always true ('ffff' would drop the 1/65536 top draw)
    if (t >= 65536) "g" else f"$t%04x"
  }

  /** Keep each row of stratum s with probability ~rates(s) (granularity
    * 1/65536), deterministically in (seed, keyCol). Strata missing from
    * `rates` fall back to `defaultRate`. Zero shuffles: the decision is a
    * per-row projection + filter, and pushes into the scan stage.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      seed: String = "strat"): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.filter(draw(seed, col(keyCol)) < thr)
  }

  /** Exactly min(k, |stratum|) rows per stratum, chosen by the seeded draw
    * (ties broken by the key, so selection is total-ordered and unique).
    * One shuffle on the stratum column — the per-stratum top-k is a window,
    * not a global sort.
    */
  def stratifiedFixedK(df: DataFrame, stratumCol: String, keyCol: String,
      k: Int, seed: String = "strat"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(draw(seed, col(keyCol)), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Per-row weighted (importance) sampling: keep each row with probability
    * ~`rate` (a COLUMN in [0,1], clamped; granularity 1/65536),
    * deterministically in (seed, key) — the quality-weighted downsampling
    * move, where keep probability follows a per-document score instead of a
    * per-stratum constant. Zero shuffles: threshold hex is per-row
    * arithmetic (Spark hex() is uppercase — lower() it to compare against
    * the md5 draw), and rate >= 1 takes the 'g' keep-all sentinel. */
  def weightedSample(df: DataFrame, rate: Column, keyCol: String,
      seed: String = "strat"): DataFrame = {
    val clamped = greatest(lit(0.0), least(lit(1.0), rate))
    val thr = when(clamped >= 1.0, lit("g")).otherwise(
      lower(lpad(hex(floor(clamped * 65536).cast("long")), 4, "0")))
    df.filter(draw(seed, col(keyCol)) < thr)
  }

  /** Rebalance toward a UNIFORM stratum mixture — the "balance the
    * languages" move, with the rates computed FROM THE DATA instead of
    * hand-picked: stratum s gets keep-rate min(1, (N/k)/n_s) (N = corpus
    * size, k = number of strata), so over-represented strata are
    * downsampled toward the equal share and under-represented strata are
    * kept whole. Rates ride as a broadcast stratum-count frame joined back
    * to the rows — nothing is collected — and the keep/drop decision is the
    * same deterministic seeded-md5 draw as every sampler here, so the
    * rebalanced corpus is a pure function of the input. Two passes over
    * `df` (the tiny count aggregate, then the sampling scan). */
  def rebalanceUniform(df: DataFrame, stratumCol: String, keyCol: String,
      seed: String = "strat"): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n_src"))
    val globals = df.agg(count(lit(1)).as("__n_tot"),
      count_distinct(col(stratumCol)).as("__k"))
    val rates = counts.crossJoin(broadcast(globals)) // 1-row global attachment
      .select(col(stratumCol),
        least(lit(1.0), col("__n_tot").cast("double") / col("__k") / col("__n_src"))
          .as("__rate"))
    weightedSample(df.join(broadcast(rates), stratumCol), col("__rate"), keyCol, seed)
      .select(df.columns.map(col): _*)
  }

  /** Temperature-flattened mixture sampling — the multilingual α-sampling
    * move (target share q_s ∝ p_s^α, α = 0.5): head strata are tempered
    * toward, but not all the way to, uniform, which is how multilingual
    * corpora are actually mixed (uniform starves the head; natural
    * starves the tail). Rates realize the target mixture with MAXIMAL
    * retention: t = min_s n_s/q_s, rate_s = t·q_s/n_s — the stratum
    * binding the mixture keeps every row.
    *
    * One scan: stratum counts aggregate once and every global (total,
    * weight sum, t) is a whole-frame window over the k-row counts frame
    * (single-partition by construction — k strata, not data). The weight
    * sum crosses engines order-free: each sqrt weight is quantized to 9
    * decimals and summed as exact DECIMAL terms (the bigram-LM
    * convention). α is FIXED at 0.5 because sqrt is correctly rounded in
    * every IEEE libm — the one temperature that replays bit-for-bit; a
    * general pow is only 1-ulp and would drift cross-engine. The keep
    * decision is the same seeded-md5 fence as every sampler here. */
  def temperatureSampleHalf(df: DataFrame, stratumCol: String, keyCol: String,
      seed: String = "strat"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
    val rates = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__n_tot", sum(col("__n")).over(wAll))
      .withColumn("__w",
        round(sqrt(col("__n").cast("double") / col("__n_tot")), 9)
          .cast("decimal(38,9)"))
      .withColumn("__S", sum(col("__w")).over(wAll))
      .withColumn("__q", col("__w").cast("double") / col("__S").cast("double"))
      .withColumn("__ratio", col("__n").cast("double") / col("__q"))
      .withColumn("__t", min(col("__ratio")).over(wAll))
      .select(col(stratumCol),
        least(lit(1.0), col("__t") * col("__q") / col("__n").cast("double"))
          .as("__rate"))
    weightedSample(df.join(broadcast(rates), stratumCol), col("__rate"), keyCol, seed)
      .select(df.columns.map(col): _*)
  }

  /** Deterministic LEAKAGE-SAFE negative sampling for contrastive training:
    * k pseudo-random negatives per anchor document, excluding the anchor
    * itself BY CONSTRUCTION (step ∈ [1, N-1] on the dense id ring) and —
    * when a near-dup `components` frame is supplied — excluding negatives
    * from the anchor's near-dup cluster (a "negative" that is a paraphrase
    * of the anchor is a false negative that poisons the contrastive loss;
    * same leakage argument as the cluster-keyed split).
    *
    * Derivation is pure column algebra over the portable FNV-1a hash
    * (step = 1 + pmod(fnv("seed:anchor:draw"), N-1), neg = (anchor + step)
    * mod N): zero shuffles for the draw itself, one broadcast-sized join
    * per side for the cluster exclusion, engine-replayable end-to-end.
    * Requires the dense id domain [0, N) (checked — a bounded 1-row agg);
    * sparse corpora rank first.
    *
    * Cluster-excluded draws are DROPPED, not re-drawn (documented: a
    * re-draw loop is state; droppable draws cost a bounded fraction of k
    * and keep the operator a projection). Output (anchor_id, draw, neg_id)
    * with draw in [1, k]. */
  def negativePairs(docs: DataFrame, idCol: String, k: Int,
      components: Option[DataFrame] = None, seed: String = "neg"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val stats = docs.agg(count(lit(1)).as("n"), min(col(idCol)).as("mn"),
      max(col(idCol)).as("mx")).collect().head
    val n = stats.getLong(0)
    require(n >= 2, s"need at least 2 documents, got $n")
    require(stats.getLong(1) == 0L && stats.getLong(2) == n - 1,
      s"dense id domain [0, $n) required, got [${stats.getLong(1)}, ${stats.getLong(2)}]")
    val h = graft.functions.Fnv.fnv1a64(
      concat_ws(":", lit(seed), col("anchor_id"), col("draw")))
    val draws = docs.select(col(idCol).as("anchor_id"))
      .withColumn("draw", explode(sequence(lit(1), lit(k))))
      .withColumn("step", lit(1L) + pmod(h, lit(n - 1)))
      .withColumn("neg_id", pmod(col("anchor_id") + col("step"), lit(n)))
      .select(col("anchor_id"), col("draw"), col("neg_id"))
    components.fold(draws) { c =>
      val ca = c.select(col("id").as("anchor_id"), col("label").as("__la"))
      val cb = c.select(col("id").as("neg_id"), col("label").as("__lb"))
      draws
        .join(ca, Seq("anchor_id"), "left")
        .join(cb, Seq("neg_id"), "left")
        .filter(coalesce(col("__la"), col("anchor_id")) =!=
          coalesce(col("__lb"), col("neg_id")))
        .select(col("anchor_id"), col("draw"), col("neg_id"))
    }
  }

  /** Deterministic ~90/5/5 train/valid/test assignment from the first md5
    * byte of the seeded draw on `key` ("e6" = 230/256 ≈ 89.8% train,
    * "f3" = 243/256 fences the next ≈ 5.1% as valid). Pure column algebra —
    * and the LEAKAGE-SAFE form passes the near-dup CLUSTER id as `key`, so
    * a near-duplicate of a training document can never land in eval. */
  def hashSplit(key: Column, seed: String = "split"): Column = {
    val bucket = substring(
      md5(concat(lit(seed + ":"), key.cast("string")).cast("binary")), 1, 2)
    when(bucket < "e6", "train").when(bucket < "f3", "valid").otherwise("test")
  }

  /** Weighted sampling WITHOUT replacement, k per stratum — the
    * Efraimidis–Spirakis A-ES scheme: each row draws u ∈ (0,1] from the
    * seeded portable FNV hash and ranks by ln(u)/w (equivalent to the
    * classic u^(1/w) key); the k largest keys per stratum are exactly a
    * weight-proportional without-replacement draw. Deterministic in
    * (seed, key, weight) like every sampler here, and one per-stratum
    * window — the [[stratifiedFixedK]] shape with weights.
    *
    * The rank key is rounded to 12 decimals BEFORE ordering (ties then
    * break on the row key): ln/pow may differ by 1 ulp between engines,
    * and an unrounded continuous key would let that flip a selection at
    * the boundary; on the 1e-12 grid both engines see identical keys.
    * Weights must be strictly positive.
    *
    * Output contract: the input columns plus a documented `rank` column
    * (1 = best draw per stratum, ≤ k); the internal A-ES key is dropped —
    * the input must not already carry a `rank` column. */
  def weightedFixedK(df: DataFrame, stratumCol: String, keyCol: String,
      weight: Column, k: Int, seed: String = "aes"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h = graft.functions.Fnv.fnv1a64(
      concat(lit(seed + ":"), col(keyCol).cast("string")))
    val u = (pmod(h, lit(1L << 52)) + 1).cast("double") / lit((1L << 52).toDouble)
    // enforce the documented precondition loudly: w <= 0 would silently
    // invert the ranking (ln(u)/w flips sign), so fail the job instead
    val w0 = when(weight.cast("double") > 0.0, weight.cast("double"))
      .otherwise(raise_error(concat(
        lit("weightedFixedK: weights must be > 0, got "), weight.cast("string"))))
    val aesKey = round(log(u) / w0, 12)
    require(!df.columns.contains("rank"),
      "weightedFixedK: input already has a `rank` column")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__aes_key").desc, col(keyCol))
    df.withColumn("__aes_key", aesKey)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .drop("__aes_key")
  }

  /** Token-budget mixture sampling: each stratum (language, source, domain)
    * keeps documents — in the deterministic seeded-md5 draw order — until its
    * TOKEN budget is spent. This is the knob real pre-training mixtures are
    * specified in (tokens per domain, not document counts or rates); the
    * admission rule is "a document is kept iff its cumulative START offset
    * is under the budget", so the first overshooting document is included
    * and the cut is a pure function of (seed, corpus) — replayable anywhere.
    *
    * The per-stratum running offset uses the same two-phase prefix sum as
    * [[packConcat]], with the draw's first hex byte as the contiguous
    * sub-shard key (the draw is the sort key, so its prefix ranges ARE
    * contiguous spans of the order): phase 1 prefixes ≤256 sub-shard totals
    * per stratum, phase 2 is a within-(stratum, sub-shard) window — no
    * stratum ever sorts as a single partition.
    *
    * Returns the kept rows with `__start` (the stratum token offset) and
    * `__budget` attached. */
  def tokenBudgetSample(docs: DataFrame, stratumCol: String, keyCol: String,
      nTokens: Column, budgets: Map[String, Long], defaultBudget: Long,
      seed: String = "budget"): DataFrame = {
    require(defaultBudget > 0, s"defaultBudget must be positive, got $defaultBudget")
    require(budgets.values.forall(_ > 0), s"budgets must be positive: $budgets")
    val budget = budgets.toSeq.sortBy(_._1).foldLeft(lit(defaultBudget)) {
      case (acc, (stratum, b)) =>
        when(col(stratumCol) === stratum, lit(b)).otherwise(acc)
    }
    val base = docs
      .withColumn("__nt", nTokens.cast("long"))
      .withColumn("__draw", draw(seed, col(keyCol)))
      .withColumn("__sub", substring(col("__draw"), 1, 2))
    val wSub = Window.partitionBy(col(stratumCol)).orderBy(col("__sub"))
    val prefixes = base.groupBy(col(stratumCol), col("__sub"))
      .agg(sum(col("__nt")).as("__tot"))
      .withColumn("__prefix", sum(col("__tot")).over(wSub) - col("__tot"))
      .select(col(stratumCol), col("__sub"), col("__prefix"))
    val wIn = Window.partitionBy(col(stratumCol), col("__sub"))
      .orderBy(col("__draw"), col(keyCol))
    base.join(broadcast(prefixes), Seq(stratumCol, "__sub"))
      .withColumn("__start",
        col("__prefix") + sum(col("__nt")).over(wIn) - col("__nt"))
      .withColumn("__budget", budget)
      .filter(col("__start") < col("__budget"))
      .drop("__draw", "__sub")
  }

  /** Concat-and-chunk sequence packing — the GPT-style pre-training layout:
    * documents are concatenated in id order into one token stream, and the
    * stream is cut into fixed `budget`-token context windows. Per document
    * this emits its global token offset and the first/last window it lands
    * in (a doc may straddle a window boundary; `packs_spanned` counts how
    * many windows carry a piece of it).
    *
    * The global running offset is the one operation here that looks
    * inherently serial, so it is computed as a two-phase prefix sum — the
    * scalable form, never a single-partition global window over the corpus:
    * phase 1 aggregates per-shard token totals (ids are sharded into
    * contiguous `shardSize` blocks, so shard order IS id order) and takes a
    * running sum over that tiny per-shard frame (corpus/shardSize rows —
    * metadata scale, the only single-partition window); phase 2 is a
    * within-shard cumulative sum (parallel across shards) plus the
    * broadcast shard prefix. Requires a dense-ish non-negative id domain
    * (gaps are fine — only contiguity of the shard blocks matters).
    *
    * Empty documents occupy zero tokens: they sit AT their offset,
    * `pack_first = pack_last = floor(start_off / budget)` and
    * `packs_spanned = 0`. */
  def packConcat(docs: DataFrame, idCol: String, nTokens: Column,
      budget: Long, shardSize: Long = 4096L): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val base = docs.select(col(idCol).cast("long").as("id"),
        nTokens.cast("long").as("n_tokens"))
      .withColumn("__shard", floor(col("id") / shardSize.toDouble).cast("long"))
    val wShard = Window.orderBy(col("__shard"))
    val prefixes = base.groupBy(col("__shard"))
      .agg(sum(col("n_tokens")).as("__tot"))
      .withColumn("__prefix", sum(col("__tot")).over(wShard) - col("__tot"))
      .select(col("__shard"), col("__prefix"))
    val wIn = Window.partitionBy(col("__shard")).orderBy(col("id"))
    val b = budget.toDouble
    base.join(broadcast(prefixes), "__shard")
      .withColumn("start_off",
        col("__prefix") + sum(col("n_tokens")).over(wIn) - col("n_tokens"))
      .withColumn("pack_first", floor(col("start_off") / b).cast("long"))
      .withColumn("pack_last",
        floor((col("start_off") + greatest(col("n_tokens"), lit(1L)) - 1) / b)
          .cast("long"))
      .withColumn("packs_spanned",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(col("pack_last") - col("pack_first") + 1))
      .select(col("id"), col("n_tokens"), col("start_off"),
        col("pack_first"), col("pack_last"), col("packs_spanned"))
  }

  /** First-fit-decreasing BIN PACKING of documents into fixed
    * `capacity`-token context windows — the waste-minimizing alternative
    * to [[packConcat]]'s concat-and-chunk (no document straddles a window;
    * the cost is the slack FFD leaves, classically ≤ 11/9·OPT + 1 bins).
    *
    * FFD is inherently sequential, so the corpus is cut into `nShards`
    * deterministic seeded-FNV shards and each shard packs independently
    * with a per-group fold (shards run in parallel; pick nShards so a
    * shard's doc list fits an executor — the same operator-level contract
    * as [[Profile.equiDepthHistogram]]'s total order). Sharding costs a
    * little packing quality (bins never mix shards) and buys full
    * parallelism — the standard large-corpus trade.
    *
    * Fold rule, replayed exactly by the oracle's recursive CTE: docs in
    * (nt DESC, id) order; each goes into the FIRST bin with room, else
    * opens a new bin. Empty docs are excluded; a doc larger than
    * `capacity` opens its own over-full bin (truncation is a downstream
    * concern — [[graft.ext.TextAnalysis.chunkFrame]] is the splitter).
    * Returns one row per shard: doc/token totals, bins used, and the fill
    * ratio. */
  def packFirstFitDecreasing(docs: DataFrame, idCol: String, nTokens: Column,
      capacity: Long, nShards: Int, seed: String = "ffd"): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    val sharded = docs.select(col(idCol).cast("long").as("id"),
        nTokens.cast("long").as("nt"))
      .filter(col("nt") > 0)
      .withColumn("shard", pmod(graft.functions.Fnv.fnv1a64(
          concat(lit(seed + ":"), col("id").cast("string"))),
        lit(nShards.toLong)).cast("int"))
    sharded.select(col("shard"), col("id"), col("nt")).as[(Int, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val items = it.toArray.sortBy { case (_, id, nt) => (-nt, id) }
        val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
        var nd = 0L
        var ntk = 0L
        items.foreach { case (_, _, nt) =>
          nd += 1; ntk += nt
          val i = bins.indexWhere(_ + nt <= capacity)
          if (i >= 0) bins(i) += nt else bins += nt
        }
        (shard, nd, ntk, bins.length.toLong)
      }
      .toDF("shard", "n_docs", "n_tokens", "n_bins")
      .withColumn("fill", round(col("n_tokens").cast("double") /
        (col("n_bins") * capacity), 6))
  }
}
