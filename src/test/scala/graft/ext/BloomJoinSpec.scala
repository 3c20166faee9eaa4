package graft.ext

import graft.SparkSpec
import graft.functions.Bloom
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 5000L).map(i => (i % 997, s"f$i")).toDF("fk", "payload")
  private def dim = (1L to 997L by 13).map(i => (i, s"d$i")).toDF("dk", "attr")

  test("positions/contains agree: every built key passes the probe") {
    val bits = BloomJoin.buildBits(dim, "dk", mBits = 1 << 12, k = 5)
    val keys = dim.select("dk").as[Long].collect()
    assert(keys.forall(Bloom.contains(_, bits, 5)))
  }

  test("prefiltered join is result-identical to the plain join") {
    val plain = fact.join(dim, $"fk" === $"dk")
      .select($"fk", $"payload", $"attr").collect().toSet
    val pre = BloomJoin.prefilteredJoin(fact, dim, "fk", "dk", mBits = 1 << 12, k = 5)
      .select($"fk", $"payload", $"attr").collect().toSet
    assert(pre === plain)
  }

  test("the filter prunes: passes all matches, drops most non-matches") {
    val bits = BloomJoin.buildBits(dim, "dk", mBits = 1 << 14, k = 5)
    val matches = fact.join(dim, $"fk" === $"dk", "left_semi").count()
    val passed = BloomJoin.prefilter(fact, $"fk", bits, 5).count()
    assert(passed >= matches, "false negative: a joining row was pruned")
    // 77 member keys of 997 → ~7.7% true pass rate; at m/n≈213 the FPR is
    // far below 1%, so the pass rate must stay well under half the input
    assert(passed < fact.count() / 2,
      s"filter barely pruned: $passed of ${fact.count()}")
  }

  test("false-positive rate stays near theory for the sized filter") {
    val n = 1000
    val keys = (1L to n).map(i => i * 7919).toDF("k")
    val bits = BloomJoin.buildBits(keys, "k", mBits = 1 << 14, k = 5)
    // probe disjoint keys (offset keeps them out of the built set)
    val probes = (1L to 20000L).map(_ * 7919 + 3)
    val fp = probes.count(Bloom.contains(_, bits, 5)).toDouble / probes.size
    // theory: (1 - e^(-kn/m))^k ≈ 0.25% at n=1000, m=2^14, k=5
    assert(fp < 0.02, s"observed FPR $fp implausibly high")
  }

  test("non-numeric key column fails at analysis time, not in codegen") {
    val strings = Seq(("a", 1)).toDF("s", "v")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      strings.select(Bloom.bloomPositions($"s", 64, 3)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"))
  }

  test("driver-side word image matches a sequential reference build") {
    val mBits = 1 << 10
    val keys = (1L to 200L).map(_ * 31 + 5)
    val ref = new Array[Long](mBits / 64)
    keys.foreach { key =>
      val arr = Bloom.positions(key, mBits, 5)
      (0 until 5).foreach { i =>
        val pos = arr.getLong(i)
        ref((pos >>> 6).toInt) |= (1L << (pos & 63))
      }
    }
    val built = BloomJoin.buildBits(keys.toDF("k"), "k", mBits, 5)
    assert(built.toSeq === ref.toSeq)
  }
}
