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

  test("keySkew: shares and straggler multipliers, top-k order, one input scan") {
    import spark.implicits._
    // 3 keys: 60 / 30 / 10 rows -> mean 100/3; skew(60) = 60/(100/3) = 1.8
    val rows = Seq.fill(60)(1L) ++ Seq.fill(30)(2L) ++ Seq.fill(10)(3L)
    val df = rows.zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
    val out = SkewJoin.keySkew(df, "k", k = 2).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L), "top-k by count desc")
    assert(out.head.getLong(1) === 60L)
    assert(out.head.getLong(2) === 3L)
    assert(out.head.getDouble(3) === 0.6)
    assert(out.head.getDouble(4) === 1.8)
    assert(out(1).getDouble(4) === 0.9)
    // the globals frame must be computed FROM the counts via exchange
    // reuse, not a second scan of the input
    val q = SkewJoin.keySkew(df, "k", k = 2)
    q.collect()
    // the AQE tree string prints final AND initial plans — audit only the
    // finalized segment, where the globals side must be a ReusedExchange
    val plan = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("LocalTableScan".r.findAllIn(plan).length === 1,
      s"globals must reuse the counts exchange, not re-scan the input:\n$plan")
    assert(plan.contains("ReusedExchange"), s"expected exchange reuse:\n$plan")
  }

  test("advisedJoin: the skew report flips the strategy, the answer never moves (r12 #9)") {
    import spark.implicits._
    val small = (0L until 50L).map(i => (i, s"dim$i")).toDF("k", "name")
    def plain(big: org.apache.spark.sql.DataFrame) =
      big.join(small, big("k") === small("k"), "inner").drop(small("k"))
        .collect().map(_.toSeq).sortBy(_.toString).toSeq

    // skewed: 90% of rows on key 7 → skew factor ≈ 0.9 * n_keys >> 4
    val skewed = (1 to 2000).map(i =>
      (if (i <= 1800) 7L else (i % 50).toLong, i)).toDF("k", "v")
    val (js, ds) = SkewJoin.advisedJoin(skewed, small, "k", skewThreshold = 4.0, salt = 8)
    assert(ds.salted, s"90%-hot key must trip the threshold: $ds")
    assert(ds.hotKey === Some("7") && ds.maxSkew > 4.0 && ds.hotShare > 0.8)
    assert(js.collect().map(_.toSeq).sortBy(_.toString).toSeq === plain(skewed),
      "the salted arm must be byte-identical to the plain join")

    // uniform: every key equally loaded → skew 1.0, plain arm
    val uniform = (1 to 2000).map(i => ((i % 50).toLong, i)).toDF("k", "v")
    val (ju, du) = SkewJoin.advisedJoin(uniform, small, "k", skewThreshold = 4.0, salt = 8)
    assert(!du.salted, s"uniform keys must keep the plain join: $du")
    assert(math.abs(du.maxSkew - 1.0) < 0.01)
    assert(ju.collect().map(_.toSeq).sortBy(_.toString).toSeq === plain(uniform),
      "the plain arm is the plain join")

    // an outer type is rejected EAGERLY — not data-dependently when skew
    // eventually crosses the threshold (r13 review)
    val e = intercept[IllegalArgumentException] {
      SkewJoin.advisedJoin(uniform, small, "k", joinType = "full_outer")
    }
    assert(e.getMessage.contains("inner/left"))
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
