package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  test("grid-bucketed range join returns exactly the nested-loop result") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 3000).map(i => (i.toLong, rnd.nextDouble() * 1000)).toDF("pid", "x")
    val intervals = (1 to 200).map { i =>
      val lo = rnd.nextDouble() * 990
      (i.toLong, lo, lo + rnd.nextDouble() * 20)
    }.toDF("iid", "lo", "hi")

    val exact = points.join(intervals, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", cell = 16.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === exact)
    assert(exact.nonEmpty, "test data must produce matches")
  }

  test("boundary inclusivity: points exactly at lo/hi match") {
    import spark.implicits._
    val points = Seq((1L, 10.0), (2L, 20.0), (3L, 9.999), (4L, 20.001)).toDF("pid", "x")
    val intervals = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", cell = 5.0)
      .select("pid").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(1L, 2L))
  }

  test("plan: equi-join on the grid cell, not a nested loop") {
    import spark.implicits._
    val points = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("pid", "x")
    val intervals = Seq((1L, 5.0, 15.0)).toDF("iid", "lo", "hi")
    val df = RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi", cell = 8.0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"expected equi-join plan:\n$plan")
  }
}
