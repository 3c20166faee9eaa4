package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins the bounded-window invariants (VERDICT r11 #6): four lane
  * families run a GLOBAL (or per-key) window whose input is bounded by
  * construction — distinct survivor values, distinct activity levels,
  * calendar days, in-bucket values — but until now only comments said
  * so. These tests assert the actual row bounds on the current fixtures
  * so a fixture regeneration (or a lane edit) that silently turns one of
  * these into a row-scale single-task sort fails HERE, loudly, instead
  * of shipping a scale-killer that still passes its oracle.
  */
class BoundedWindowSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.01"

  test("skyline: the phase-2 global window reads local-frontier survivors, not rows") {
    val pts = Extensions.skylinePoints(spark, d)
    val rows = pts.count()
    val surv = Extensions.skylineSurvivors(pts).count()
    assert(rows > 100, s"fixture too small to exercise the prune ($rows points)")
    assert(surv <= rows / 4,
      s"per-partition dominance prune stopped biting: $surv survivors of $rows rows " +
        "— the global window is heading to row scale")
    assert(surv <= 2000L,
      s"$surv local-frontier survivors — absolute cap blown, phase 2 no longer cheap")
  }

  test("gini: the prefix-sum window runs over distinct activity levels << users") {
    val byUser = Tables.events(spark, d)
      .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
    val users = byUser.count()
    val levels = byUser.select(col("x")).distinct().count()
    assert(levels <= users / 3,
      s"$levels distinct activity levels for $users users — tie grouping no longer " +
        "compresses; the rank-sum window is heading to user scale")
    assert(levels <= 1000L, s"$levels levels — absolute cap blown")
  }

  test("ts lanes: the daily-frame windows run over calendar days, not events") {
    val ev = Tables.events(spark, d)
    val events = ev.count()
    val days = ev.select(expr("(ts_ns div 1000) div 86400000000").as("day"))
      .distinct().count()
    assert(days <= 370L,
      s"$days distinct days — the calendar-bounded daily frames (ts_*, cohort, " +
        "lifecycle) assume ~a year of span; audit the fixture generation")
    assert(events > days * 3,
      s"only $events events over $days days — daily aggregation no longer compresses")
  }

  test("weighted median (bucketed): phase-2 window reads one bucket's values only") {
    val bk = Extensions.wmedianBucketed(spark, d)
    val B = Extensions.WmedianBuckets
    val distinct = bk.count() // (flag, v) grain
    val maxOcc = bk.groupBy(col("flag"), col("b")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    // even distribution puts ~distinct/(3 flags · B) values per bucket;
    // allow generous skew, but a bucket holding a large share of all
    // values means the "bounded" phase-2 window is row-scale again
    val cap = math.max(64L, 32L * ((distinct / B) + 1))
    assert(maxOcc <= cap,
      s"hottest value bucket holds $maxOcc of $distinct distinct prices " +
        s"(cap $cap) — phase 2 of the bucketed weighted median is no longer bounded")
  }

  test("weighted median: bucketed two-phase result is IDENTICAL to the exact form") {
    val exact = Extensions.queries("agg_weighted_median")(spark, d)
      .collect().map(_.toSeq).toSet
    val bucketed = Extensions.queries("agg_weighted_median_bucketed")(spark, d)
      .collect().map(_.toSeq).toSet
    assert(exact === bucketed)
  }
}
