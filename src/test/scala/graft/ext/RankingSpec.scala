package graft.ext

import graft.SparkSpec

class RankingSpec extends SparkSpec {

  test("bm25: tf saturation, idf weighting, length normalization, fixed-order sum") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark"),              // high tf, short
      (2L, "spark join"),                           // two terms, very short
      (3L, "spark and a lot of other words that make this document much longer than the rest"),
      (4L, "window"),                               // rare term only
      (5L, "nothing relevant here at all")          // no query terms
    ).toDF("doc_id", "text")
    val got = Ranking.bm25TopK(docs, "text", "doc_id",
      Seq("spark", "window", "join"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))

    // doc 5 has no query term -> absent entirely
    assert(!got.map(_._1).contains(5L))
    assert(got.length === 4)

    // replicate the exact formula on the driver
    val k1 = 1.2; val b = 0.75
    val dl = Map(1L -> 4.0, 2L -> 2.0, 3L -> 16.0, 4L -> 1.0, 5L -> 5.0)
    val n = 5.0; val avgdl = dl.values.sum / n
    val dfm = Map("spark" -> 3.0, "window" -> 1.0, "join" -> 1.0)
    val tfm = Map((1L, "spark") -> 4.0, (2L, "spark") -> 1.0, (2L, "join") -> 1.0,
      (3L, "spark") -> 1.0, (4L, "window") -> 1.0)
    def part(id: Long, t: String): Double = tfm.get((id, t)).map { tf =>
      math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
        (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl(id) / avgdl))
    }.getOrElse(0.0)
    val expect = Seq(1L, 2L, 3L, 4L).map { id =>
      id -> BigDecimal(Seq("spark", "window", "join").map(part(id, _)).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    got.foreach { case (id, s) => assert(s === expect(id), s"score for doc $id") }

    // ranking: ordered by score desc then id
    val resorted = got.sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq === resorted.toSeq, "output must be (score DESC, id) ordered")
  }

  test("bm25: k bounds the result and ties break on id") {
    import spark.implicits._
    val docs = (1L to 30L).map(i => (i, "common term here")).toDF("doc_id", "text")
    val got = Ranking.bm25TopK(docs, "text", "doc_id", Seq("common"), k = 7)
      .collect().map(_.getLong(0))
    assert(got.length === 7)
    assert(got.toSeq === (1L to 7L), "identical docs tie-break on ascending id")
  }

  test("bm25 indexed: identical output to the direct path; probe is partition-pruned") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark"),
      (2L, "spark join"),
      (3L, "spark and a lot of other words that make this document much longer than the rest"),
      (4L, "window"),
      (5L, "nothing relevant here at all")
    ).toDF("doc_id", "text")
    val sfKey = "/tmp/graft-bm25spec-" + java.util.UUID.randomUUID().toString
    val store = Ranking.bm25IndexCached(docs, "text", "doc_id", sfKey)
    assert(new java.io.File(store, "_SUCCESS").exists())
    val terms = Seq("spark", "window", "join")
    val direct = Ranking.bm25TopK(docs, "text", "doc_id", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probe = Ranking.bm25TopKIndexed(spark, store, terms, k = 10)
    val indexed = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(indexed === direct, "index route must be bit-identical to direct")
    // the postings scan must prune to the query terms' buckets: every
    // t_bucket surviving in PartitionFilters, nothing scanning all buckets
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), "postings scan missing partition filters")
    assert(plan.contains("t_bucket"), "pruning must key on t_bucket")
    // idempotent cache: a second build call reuses the published store
    assert(Ranking.bm25IndexCached(docs, "text", "doc_id", sfKey) === store)
  }

  test("bm25 incremental: build + append compose to the exact full-corpus ranking") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark spark"),
      (2L, "spark join"),
      (3L, "spark and a lot of other words that make this document much longer than the rest"),
      (4L, "window"),
      (5L, "nothing relevant here at all"),
      (6L, "window join window"),
      (7L, "join join spark window")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "window", "join")
    val direct = Ranking.bm25TopK(docs, "text", "doc_id", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // cached composition (even build + odd append, atomically published)
    val sfKey = "/tmp/graft-bm25incrspec-" + java.util.UUID.randomUUID().toString
    val store = Ranking.bm25IndexIncrementalCached(docs, "text", "doc_id", sfKey)
    val viaStore = Ranking.bm25TopKIndexed(spark, store, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaStore === direct, "build+append must equal the full-corpus ranking")
    // LIVE append against the published store (the production path): new
    // docs change df/N/avgdl — the probe must equal a direct run over the
    // grown corpus, and the merged globals must count every generation
    val extra = Seq((8L, "spark window newcomer"), (9L, "unrelated prose"))
      .toDF("doc_id", "text")
    Ranking.bm25Append(extra, "text", "doc_id", store)
    val grown = docs.unionAll(extra)
    val directGrown = Ranking.bm25TopK(grown, "text", "doc_id", terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probeGrown = Ranking.bm25TopKIndexed(spark, store, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probeGrown === directGrown, "live append must fold into the ranking")
    // three generations of globals partials, merged at probe time
    assert(spark.read.parquet(store + "/globals").count() === 3L)
    // appends leave a file per generation per touched bucket — compaction
    // rewrites the crowded postings partitions and the probe is unchanged
    val report = StoreCompaction.compact(spark, store + "/postings", maxFiles = 1)
    assert(report.partitionsCompacted > 0, "some bucket must have needed compaction")
    val postCompact = Ranking.bm25TopKIndexed(spark, store, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(postCompact === directGrown, "compaction must not change the ranking")
  }
}
