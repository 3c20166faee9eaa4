package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 4000L)
    .map(i => (i, if (i % 10 < 7) "en" else if (i % 10 < 9) "de" else "zh"))
    .toDF("id", "lang")

  test("rate-based: deterministic, per-stratum rate lands near target") {
    val sampled = Sampling.stratifiedSample(corpus, "lang", "id",
      Map("en" -> 0.25), defaultRate = 1.0)
    val again = Sampling.stratifiedSample(corpus, "lang", "id",
      Map("en" -> 0.25), defaultRate = 1.0)
    assert(sampled.collect().toSet === again.collect().toSet, "not deterministic")
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = corpus.groupBy("lang").count().as[(String, Long)].collect().toMap
    // md5 is uniform: 2800 en draws at 25% → binomial sd ~23, allow 5 sd
    assert(math.abs(byLang("en") - total("en") * 0.25) < 120,
      s"en sampled ${byLang("en")} of ${total("en")}, expected ~25%")
    assert(byLang("de") === total("de"), "default rate 1.0 must keep all")
    assert(byLang("zh") === total("zh"), "default rate 1.0 must keep all")
  }

  test("rate 1.0 keeps every row including the top draw") {
    val all = Sampling.stratifiedSample(corpus, "lang", "id", Map.empty)
    assert(all.count() === corpus.count())
  }

  test("rate 0.0 keeps nothing") {
    val none = Sampling.stratifiedSample(corpus, "lang", "id",
      Map("en" -> 0.0, "de" -> 0.0, "zh" -> 0.0))
    assert(none.count() === 0)
  }

  test("thresholdHex: exact 16-bit thresholds, 'g' sentinel for keep-all") {
    assert(Sampling.thresholdHex(0.25) === "4000")
    assert(Sampling.thresholdHex(0.5) === "8000")
    assert(Sampling.thresholdHex(0.0) === "0000")
    assert(Sampling.thresholdHex(1.0) === "g")
  }

  test("fixed-k: exactly min(k, stratum size) per stratum, deterministic") {
    val k = 50
    val sampled = Sampling.stratifiedFixedK(corpus, "lang", "id", k)
    val counts = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = corpus.groupBy("lang").count().as[(String, Long)].collect().toMap
    total.foreach { case (lang, n) =>
      assert(counts(lang) === math.min(k, n), s"stratum $lang")
    }
    val again = Sampling.stratifiedFixedK(corpus, "lang", "id", k)
    assert(sampled.collect().toSet === again.collect().toSet)
  }

  test("fixed-k with k larger than every stratum is the identity") {
    val sampled = Sampling.stratifiedFixedK(corpus, "lang", "id", 100000)
    assert(sampled.count() === corpus.count())
  }

  test("weighted: per-row rates land near target, deterministic, clamped") {
    // weight ramps 0 -> 1 across ids: overall keep fraction ~= mean ~= 0.5
    val weighted = corpus.withColumn("w", col("id").cast("double") / 4000.0)
    val kept = Sampling.weightedSample(weighted, col("w"), "id")
    val again = Sampling.weightedSample(weighted, col("w"), "id")
    assert(kept.collect().toSet === again.collect().toSet, "not deterministic")
    val n = kept.count()
    // sum of independent Bernoulli(w_i), mean 2000, sd ~= sqrt(sum w(1-w)) ~= 26
    assert(math.abs(n - 2000L) < 150, s"kept $n of 4000 at mean weight 0.5")
    // low ids (w < 0.05) mostly dropped, high ids (w > 0.95) mostly kept
    val lowKept = kept.filter(col("id") <= 200).count()
    val highKept = kept.filter(col("id") > 3800).count()
    assert(lowKept < 25, s"low-weight rows over-sampled: $lowKept of 200")
    assert(highKept > 175, s"high-weight rows under-sampled: $highKept of 200")
  }

  test("rebalanceUniform: head stratum downsampled to the equal share, tail kept whole") {
    // corpus: 2800 en / 800 de / 400 zh, k=3 -> equal share 1333.3
    val kept = Sampling.rebalanceUniform(corpus, "lang", "id")
    val after = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(after("de") === 800L, "under-represented strata must be kept whole")
    assert(after("zh") === 400L)
    // en rate = 1333.3/2800 = 0.476: binomial sd ~= 26, allow 5 sd
    assert(math.abs(after("en") - 1333L) < 135,
      s"en must land near the equal share, got ${after("en")}")
    // determinism and schema preservation
    val again = Sampling.rebalanceUniform(corpus, "lang", "id")
    assert(kept.columns.toSeq === corpus.columns.toSeq)
    assert(kept.collect().toSet === again.collect().toSet)
  }

  test("temperatureSampleHalf: rates match the closed form, binding stratum kept whole") {
    import spark.implicits._
    // 64 a / 16 b / 4 c: w = sqrt(n/84) -> q = (4, 2, 1)/7; t = min n/q = 28
    // -> rates (28*q_s)/n_s = (0.25, 0.5, 1.0)
    val df = (Seq.fill(64)("a") ++ Seq.fill(16)("b") ++ Seq.fill(4)("c"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("id", "lang")
    val kept = Sampling.temperatureSampleHalf(df, "lang", "id")
    // the derivation is the interesting part: mirror the exact IEEE chain
    // (sqrt -> 9-decimal HALF_UP quantization -> decimal sum -> double
    // divisions in the same order) and the kept SET must equal the same
    // seeded fence applied with those rates
    val n = Map("a" -> 64.0, "b" -> 16.0, "c" -> 4.0)
    val w9 = n.view.mapValues(v =>
      BigDecimal(math.sqrt(v / 84.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).toMap
    val s9 = w9.values.sum
    val q = w9.map { case (k, w) => k -> w.toDouble / s9.toDouble }
    val t = q.map { case (k, qk) => n(k) / qk }.min
    val rates = q.map { case (k, qk) => k -> math.min(1.0, t * qk / n(k)) }
    // closed form: q = (4, 2, 1)/7, t = 28 -> rates ~ (0.25, 0.5, 1.0)
    assert(math.abs(rates("a") - 0.25) < 1e-9)
    assert(math.abs(rates("b") - 0.5) < 1e-9)
    assert(rates("c") > 1.0 - 1e-9)
    val literal = Sampling.weightedSample(
      df.withColumn("__r",
        when($"lang" === "a", rates("a")).when($"lang" === "b", rates("b"))
          .otherwise(rates("c"))),
      org.apache.spark.sql.functions.col("__r"), "id")
      .select("id", "lang")
    assert(kept.collect().toSet === literal.collect().toSet)
    assert(kept.columns.toSeq === df.columns.toSeq)
  }

  test("weighted: rate >= 1 keeps every row, rate <= 0 keeps none") {
    val all = Sampling.weightedSample(corpus.withColumn("w", lit(5.0)), col("w"), "id")
    assert(all.count() === corpus.count(), "rate >= 1 must keep the top draw too")
    val none = Sampling.weightedSample(corpus.withColumn("w", lit(-1.0)), col("w"), "id")
    assert(none.count() === 0)
  }

  test("negativePairs: ring draws replicate driver-side, never the anchor, dense-id guard") {
    import spark.implicits._
    val n = 7
    val docs = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = Sampling.negativePairs(docs, "doc_id", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got.size === n * 3, "no components -> every draw kept")
    def fnv(s2: String): Long = graft.functions.Fnv.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s2))
    got.foreach { case ((a, d), neg) =>
      val h = fnv(s"neg:$a:$d")
      val step = 1L + (((h % (n - 1)) % (n - 1)) + (n - 1)) % (n - 1)
      assert(neg === (a + step) % n, s"draw ($a, $d)")
      assert(neg !== a, "step in [1, N-1] can never return the anchor")
      assert(neg >= 0 && neg < n)
    }
    // sparse ids refuse loudly
    intercept[IllegalArgumentException] {
      Sampling.negativePairs(docs.filter(col("doc_id") =!= 3), "doc_id", k = 2)
    }
  }

  test("negativePairs: near-dup cluster exclusion drops in-cluster draws only") {
    import spark.implicits._
    val n = 6
    val docs = (0L until n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // every doc in ONE cluster -> every negative is in the anchor's cluster
    val allOne = (0L until n).map(i => (i, 0L)).toDF("id", "label")
    assert(Sampling.negativePairs(docs, "doc_id", k = 4,
      components = Some(allOne)).count() === 0)
    // docs 0/1 clustered: exactly the draws landing on the partner drop
    val pair = Seq((0L, 0L), (1L, 0L)).toDF("id", "label")
    val kept = Sampling.negativePairs(docs, "doc_id", k = 4,
        components = Some(pair))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val all = Sampling.negativePairs(docs, "doc_id", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val dropped = all -- kept
    assert(dropped.forall { case (a, neg) =>
      Set(a, neg) === Set(0L, 1L) }, s"only 0<->1 draws may drop: $dropped")
    assert((all -- dropped) === kept)
  }

  test("weightedFixedK: exactly k per stratum, deterministic, weight-biased") {
    val docs = (0L until 1000L)
      .map(i => (i, if (i % 2 == 0) "a" else "b",
        if (i < 10) 1000L else 1L)) // 10 heavy docs, all in stratum "a"
      .toDF("id", "st", "w")
    val pick = Sampling.weightedFixedK(docs, "st", "id", col("w") + 0, k = 10)
    val again = Sampling.weightedFixedK(docs, "st", "id", col("w") + 0, k = 10)
    assert(pick.collect().map(_.getLong(0)).toSet ===
      again.collect().map(_.getLong(0)).toSet, "not deterministic")
    val perSt = pick.groupBy("st").count().as[(String, Long)].collect().toMap
    assert(perSt === Map("a" -> 10L, "b" -> 10L))
    // heavy docs carry 10000/10490 of stratum a's weight: A-ES should pick
    // nearly all of them into a's k=10 (allow generous slack)
    val heavyPicked = pick.filter(col("id") < 10).count()
    assert(heavyPicked >= 7, s"only $heavyPicked of 10 heavy docs selected")
    // k >= stratum size is the identity
    val tiny = (0L until 5L).map(i => (i, "x", i + 1)).toDF("id", "st", "w")
    assert(Sampling.weightedFixedK(tiny, "st", "id", col("w"), k = 10)
      .count() === 5)
  }

  test("tokenBudgetSample: two-phase cut equals the naive per-stratum cumsum") {
    val rnd = new scala.util.Random(7)
    val docs = (0L until 1200L)
      .map(i => (i, if (i % 5 < 3) "en" else "de", rnd.nextInt(40).toLong + 1L))
      .toDF("doc_id", "lang", "nt")
    val budgets = Map("en" -> 900L)
    val kept = Sampling.tokenBudgetSample(docs, "lang", "doc_id", col("nt"),
        budgets, defaultBudget = 400L)
      .select("doc_id", "lang", "__nt", "__start", "__budget")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // naive replica: full sort per stratum by (draw, id), running offset
    def hex4(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"budget:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
    }
    val want = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
        val budget = budgets.getOrElse(lang, 400L)
        var off = 0L
        rows.sortBy(t => (hex4(t._1), t._1)).flatMap { case (id, _, n) =>
          val start = off; off += n
          if (start < budget) Some((id, lang, n, start, budget)) else None
        }
      }
    assert(kept.toSet === want.toSet)
    // the admission rule may overshoot by at most the last doc's tokens
    val byLang = kept.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val budget = rows.head._5
      val total = rows.map(_._3).sum
      val lastN = rows.maxBy(_._4)._3
      assert(total < budget + lastN, s"$lang overshoot beyond the last doc")
      assert(total >= budget || rows.size == docs.filter(col("lang") === lang).count(),
        s"$lang stopped early with budget left")
    }
  }

  test("packConcat: two-phase prefix sum equals the naive global cumsum") {
    val rnd = new scala.util.Random(42)
    // gappy ids (every 3rd dropped) + zero-token docs sprinkled in
    val docs = (0L until 900L).filter(_ % 3 != 2)
      .map(i => (i, if (i % 17 == 0) 0L else rnd.nextInt(700).toLong + 1L))
      .toDF("doc_id", "nt")
    val got = Sampling.packConcat(docs, "doc_id", col("nt"), budget = 256L,
        shardSize = 64L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // naive replica: one driver-side pass in id order
    var off = 0L
    val want = docs.orderBy("doc_id").collect().map { r =>
      val (id, n) = (r.getLong(0), r.getLong(1))
      val start = off; off += n
      val first = start / 256L
      val last = (start + math.max(n, 1L) - 1L) / 256L
      (id, n, start, first, last, if (n == 0) 0L else last - first + 1)
    }
    assert(got.toSeq === want.toSeq)
    // at least one doc must straddle a window boundary in this corpus
    assert(got.exists(_._6 > 1), "fixture never straddles a boundary")
    // empty docs sit AT their offset and span zero windows
    assert(got.filter(_._2 == 0).forall(t => t._4 === t._5 && t._6 === 0L))
  }

  test("packFirstFitDecreasing: equals the driver replica; bins respect capacity") {
    val docs = (0L until 400L).map(i => (i, (i * 37 % 97) + 1)).toDF("doc_id", "nt")
    val cap = 100L
    val got = Sampling.packFirstFitDecreasing(docs, "doc_id", col("nt"),
        capacity = cap, nShards = 8)
      .orderBy("shard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // driver replica of the same shard + sort + first-fit fold
    def shardOf(id: Long): Int = {
      val h = graft.functions.Fnv.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"ffd:$id"))
      (((h % 8) + 8) % 8).toInt
    }
    val want = (0L until 400L).map(i => (i, (i * 37 % 97) + 1))
      .groupBy { case (id, _) => shardOf(id) }
      .map { case (shard, items) =>
        val sorted = items.sortBy { case (id, nt) => (-nt, id) }
        val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.foreach { case (_, nt) =>
          val i = bins.indexWhere(_ + nt <= cap)
          if (i >= 0) bins(i) += nt else bins += nt
        }
        // invariant: no bin over capacity (every item here fits one bin)
        assert(bins.forall(_ <= cap), s"overfull bin in shard $shard")
        (shard, items.size.toLong, sorted.map(_._2).sum, bins.length.toLong)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq === want)
    // FFD can never beat the token lower bound or waste more than 2x
    got.foreach { case (_, _, ntok, nbins) =>
      val lower = (ntok + cap - 1) / cap
      assert(nbins >= lower && nbins <= 2 * lower,
        s"bins $nbins outside [$lower, ${2 * lower}]")
    }
  }

  test("packConcat: offsets are a dense token stream (no holes, no overlap)") {
    val docs = (0L until 200L).map(i => (i, (i % 13) + 1)).toDF("doc_id", "nt")
    val rows = Sampling.packConcat(docs, "doc_id", col("nt"), budget = 64L)
      .orderBy("id").collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) + a.getLong(1) === b.getLong(2),
        s"hole/overlap between ${a.getLong(0)} and ${b.getLong(0)}")
    case _ => ()
    }
    assert(rows.head.getLong(2) === 0L)
  }
}
