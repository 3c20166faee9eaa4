package graft.ext

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("one-pass profile: rows, nulls, exact NDV, estimate sanity per column") {
    val df = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]),
      (4L, Option("a"))).toDF("id", "s")
    val out = Profile.profile(df, Seq("id", "s")).orderBy("col_name").collect()
    assert(out.map(_.getString(0)).toSeq === Seq("id", "s"))
    val id = out(0); val s = out(1)
    assert((id.getLong(1), id.getLong(2), id.getLong(3)) === ((4L, 0L, 4L)))
    assert((s.getLong(1), s.getLong(2), s.getLong(3)) === ((4L, 1L, 2L)))
    // tiny cardinalities take the linear-counting branch: estimate hugs exact
    assert(math.abs(id.getDouble(4) - 4.0) < 1.0, s"id est ${id.getDouble(4)}")
    assert(math.abs(s.getDouble(4) - 2.0) < 1.0, s"s est ${s.getDouble(4)}")
  }

  test("equiWidthHistogram: clamped buckets, exact counts, null exclusion, constant column") {
    val df = (Seq(0.0, 1.0, 5.0, 9.9, 10.0) ++ Seq.fill(3)(2.5))
      .map(Option(_)).appended(Option.empty[Double]).toDF("v")
    val out = Profile.equiWidthHistogram(df, "v", buckets = 10)
      .orderBy("bucket").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // width 1.0 over [0,10]: 0.0->b0, 1.0->b1, 2.5 x3 ->b2, 5.0->b5,
    // 9.9->b9, 10.0 clamps into b9; the null row is excluded
    assert(out(0) === ((1L, 0.0, 0.0)))
    assert(out(2) === ((3L, 2.5, 2.5)))
    assert(out(9) === ((2L, 9.9, 10.0)), "the max value clamps into the last bucket")
    assert(out.values.map(_._1).sum === 8L)
    val const = Profile.equiWidthHistogram(Seq(7.0, 7.0).toDF("v"), "v")
      .collect().head
    assert((const.getInt(0), const.getLong(1)) === ((0, 2L)))
  }

  test("equiDepthHistogram: exact ntile boundaries, remainder rule, sampling fence") {
    // 10 values into 4 tiles: first 10%4=2 tiles take 3 rows, rest 2
    val df = (1 to 10).map(i => (i.toLong, i * 10.0)).toDF("id", "v")
    val out = Profile.equiDepthHistogram(df, "v", "id", buckets = 4)
      .orderBy("bucket").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
    assert(out.toSeq === Seq(
      1 -> ((3L, 10.0, 30.0)), 2 -> ((3L, 40.0, 60.0)),
      3 -> ((2L, 70.0, 80.0)), 4 -> ((2L, 90.0, 100.0))))
    // the sampled form is a deterministic subset: tile populations sum to
    // the fence's keep count, and repeat runs are identical
    val big = (1 to 2000).map(i => (i.toLong, (i * 37 % 1000).toDouble))
      .toDF("id", "v")
    val a = Profile.equiDepthHistogram(big, "v", "id", buckets = 8, sampleRate = 0.25)
      .orderBy("bucket").collect()
    val b = Profile.equiDepthHistogram(big, "v", "id", buckets = 8, sampleRate = 0.25)
      .orderBy("bucket").collect()
    assert(a.toSeq === b.toSeq, "seeded fence must be deterministic")
    val kept = a.map(_.getLong(1)).sum
    assert(kept > 300 && kept < 700, s"~25% fence kept $kept of 2000")
  }

  test("profile(exact = false): NDV leg dropped, same schema, HLL estimate intact") {
    val df = (1 to 500).map(i => (i.toLong, s"v${i % 97}")).toDF("id", "s")
    val fast = Profile.profile(df, Seq("id", "s"), exact = false)
      .orderBy("col_name").collect()
    val full = Profile.profile(df, Seq("id", "s"))
      .orderBy("col_name").collect()
    assert(fast.map(_.schema.fieldNames.toSeq).head ===
      full.map(_.schema.fieldNames.toSeq).head, "schema must not change")
    fast.zip(full).foreach { case (f, e) =>
      assert(f.isNullAt(3), "ndv_exact must be NULL in scale mode")
      assert(!e.isNullAt(3))
      assert((f.getLong(1), f.getLong(2)) === ((e.getLong(1), e.getLong(2))))
      assert(f.getDouble(4) === e.getDouble(4),
        "the HLL estimate must be identical with or without the exact leg")
    }
  }

  test("profile of an all-null column: zero NDV, null-register only") {
    val df = Seq(Option.empty[String], Option.empty[String]).toDF("s")
    val out = Profile.profile(df, Seq("s")).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) === ((2L, 2L, 0L)))
    assert(out.getDouble(4) === 0.0, "empty sketch must estimate 0")
  }

  test("constraint suite: uniqueness, FK orphans, predicates count exactly") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq((1L, 5.0), (1L, -2.0), (9L, 1.5), (2L, 0.0))
      .toDF("fk", "v")
    val dup = Seq(1L, 1L, 2L).toDF("k")
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      (r.getString(0), r.getLong(1), r.getLong(2))
    }
    assert(row(Profile.uniqueCheck("u", dup, "k")) === (("u", 3L, 1L)))
    assert(row(Profile.fkCheck("f", child, "fk", parent, "pk")) === (("f", 4L, 1L)),
      "exactly the fk=9 orphan")
    assert(row(Profile.predicateCheck("p", child, col("v") < 0)) === (("p", 4L, 1L)))
    // clean data -> zero violations, n_rows intact
    assert(row(Profile.uniqueCheck("u2", parent, "pk")) === (("u2", 3L, 0L)))
  }
}
