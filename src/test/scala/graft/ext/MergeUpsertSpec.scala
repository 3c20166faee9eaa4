package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

import graft.SparkSpec

/** MERGE-shaped upsert: update/insert/carry semantics against a naive
  * reference, the zero-shuffle target plan, the report split, and the ANSI
  * multi-match rejection. */
class MergeUpsertSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def fixture = {
    import spark.implicits._
    val target = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("pk", "attr", "v")
    val source = Seq(
      (2L, "B2", 21.0), // update
      (4L, "D2", 41.0), // update
      (9L, "i", 90.0)) // insert
      .toDF("pk", "attr", "v")
    (target, source)
  }

  test("matched rows replaced, new rows inserted, the rest carried — exactly once each") {
    val (target, source) = fixture
    val got = MergeUpsert.merge(target, source, Seq("pk"))
      .orderBy(col("pk")).collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq === Seq(
      (1L, "a", 10.0), (2L, "B2", 21.0), (3L, "c", 30.0), (4L, "D2", 41.0),
      (9L, "i", 90.0)))
  }

  test("report: the update/insert split the replace-on-PK sink idiom reports") {
    val (target, source) = fixture
    val r = MergeUpsert.report(target, source, Seq("pk")).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 4L, 5L)))
  }

  test("broadcast source: the target branch has no Exchange (CDC delta never shuffles the table)") {
    val (target, source) = fixture
    val merged = MergeUpsert.merge(target, source, Seq("pk"))
    merged.collect()
    val plan = merged.queryExecution.executedPlan
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val antis = collectWithSubqueries(plan) {
      case j: BroadcastHashJoinExec => j }
    assert(antis.nonEmpty, s"expected a broadcast anti join, plan:\n$plan")
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeLike => e }.isEmpty,
      s"MERGE with a broadcast source must not shuffle the target, plan:\n$plan")
  }

  test("duplicate source PKs are rejected eagerly (ANSI MERGE multi-match)") {
    import spark.implicits._
    val (target, _) = fixture
    val dup = Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("pk", "attr", "v")
    val e = intercept[IllegalArgumentException] {
      MergeUpsert.requireUniquePk(dup, Seq("pk"))
    }
    assert(e.getMessage.contains("duplicate PK"))
    MergeUpsert.requireUniquePk(fixture._2, Seq("pk")) // unique passes
  }
}
