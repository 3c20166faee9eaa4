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
}
