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
}
