package graft.ext

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

  test("profile of an all-null column: zero NDV, null-register only") {
    val df = Seq(Option.empty[String], Option.empty[String]).toDF("s")
    val out = Profile.profile(df, Seq("s")).collect().head
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) === ((2L, 2L, 0L)))
    assert(out.getDouble(4) === 0.0, "empty sketch must estimate 0")
  }
}
