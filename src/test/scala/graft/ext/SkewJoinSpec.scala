package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the unsalted result on skewed data") {
    import spark.implicits._
    // 90% of fact rows hit one key — the classic straggler shape
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, i))
      .toDF("k", "v")
    val small = Seq((42L, "hot"), (0L, "zero"), (3L, "three"), (99L, "unmatched"))
      .toDF("k", "name")

    val plain = big.join(small, "k").select("k", "v", "name")
    val salted = SkewJoin.saltedJoin(big, small, "k", salt = 8).select("k", "v", "name")

    val a = plain.collect().map(_.toSeq).sortBy(_.toString)
    val b = salted.collect().map(_.toSeq).sortBy(_.toString)
    assert(b.length === a.length)
    assert(b.toSeq === a.toSeq)
  }

  test("salt spreads a hot key across partitions") {
    import spark.implicits._
    val big = Seq.fill(1000)((42L, "x")).toDF("k", "v")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    // identical rows hash identically — spreading needs row variety; verify
    // with varied rows instead
    val varied = (1 to 1000).map(i => (42L, i)).toDF("k", "v")
      .withColumn("__salt", pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(varied === 8, s"varied rows should cover all salts, got $varied")
    assert(salts === 1, "identical rows share a salt (documented limitation)")
  }
}
