package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // hand-built log: user 1 has two sessions (gap 100 between them with
  // gapNs=50), user 2 one single-event session; ids break the ts tie.
  private lazy val log = Seq(
    (1L, 1L, 10L, "view"), (2L, 1L, 30L, "click"), (3L, 1L, 60L, "view"),
    (4L, 1L, 200L, "purchase"), (5L, 2L, 10L, "view"),
    (6L, 2L, 10L, "click") // same ts as id 5 — tie broken by id
  ).toDF("event_id", "user_id", "ts_ns", "event_type")

  test("sessionize: gap splits sessions, numbering is per-user and 1-based") {
    val s = EventAnalytics.sessionize(log, "user_id", "ts_ns", "event_id", 50L)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    assert(s === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L, 6L -> 1L))
  }

  test("sessionStats: exact ns bounds and distinct-type counts") {
    val st = EventAnalytics
      .sessionStats(log, "user_id", "ts_ns", "event_id", "event_type", 50L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(st === Set(
      (1L, 1L, 3L, 10L, 60L, 50L, 2L),   // view+click+view
      (1L, 2L, 1L, 200L, 200L, 0L, 1L),
      (2L, 1L, 2L, 10L, 10L, 0L, 2L)))
  }

  test("funnel: strict order within the anchor window, drop-outs carry null") {
    // user 1 completes view->click->purchase; user 2 has click at the SAME
    // ts as view (not strictly after -> drops at step 1)
    val f = EventAnalytics.funnelSteps(log, "user_id", "ts_ns", "event_type",
      Seq("view", "click", "purchase"), 1000L)
      .orderBy("user_id")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(f === Seq((1L, 10L, Some(30L), Some(200L)), (2L, 10L, None, None)))
    // tight window: purchase at 200 > 10+100 falls outside
    val tight = EventAnalytics.funnelSteps(log, "user_id", "ts_ns", "event_type",
      Seq("view", "click", "purchase"), 100L)
      .filter($"user_id" === 1L)
      .as[(Long, Long, Option[Long], Option[Long])].collect().head
    assert(tight === ((1L, 10L, Some(30L), None)))
  }

  test("funnelSteps property: fold form equals the sequential per-user reference") {
    import org.scalacheck.Gen
    import spark.implicits._
    // direct sequential semantics: t0 = min ts of step-0 events; t_k = min
    // ts of step-k events strictly after t_{k-1} and within W of t0
    def reference(log: Seq[(Long, Long, String)], steps: Seq[String],
        w: Long): Map[Long, Seq[Option[Long]]] =
      log.groupBy(_._1).flatMap { case (u, evs) =>
        val first = evs.filter(_._3 == steps.head).map(_._2)
        if (first.isEmpty) None
        else {
          val t0 = first.min
          val ts = steps.tail.scanLeft(Option(t0)) { (prev, step) =>
            prev.flatMap { p =>
              val cand = evs.filter(e => e._3 == step && e._2 > p && e._2 <= t0 + w)
                .map(_._2)
              if (cand.isEmpty) None else Some(cand.min)
            }
          }
          Some(u -> ts)
        }
      }
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      Iterator.continually(g.sample).flatten.take(n).toSeq
    val genEvent = for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.choose(0L, 50L) // small range forces heavy ts ties
      ty <- Gen.oneOf("a", "b", "c", "d", "e")
    } yield (u, t, ty)
    val stepSets = Seq(Seq("a", "b", "c"), Seq("b", "a"),
      Seq("a", "b", "a"), // duplicate step type: one event can't fill both
      Seq("c"))
    (1 to 4).foreach { round =>
      val log = samples(genEvent, 120)
      val df = log.zipWithIndex
        .map { case ((u, t, ty), i) => (i.toLong, u, t, ty) }
        .toDF("event_id", "user_id", "ts_ns", "event_type")
      stepSets.foreach { steps =>
        val w = 20L
        val got = EventAnalytics
          .funnelSteps(df, "user_id", "ts_ns", "event_type", steps, w)
          .collect().map { r =>
            r.getLong(0) -> steps.indices.map(k =>
              if (r.isNullAt(k + 1)) None else Some(r.getLong(k + 1)))
          }.toMap
        val want = reference(log, steps, w)
        assert(got === want, s"round $round steps=$steps")
      }
    }
  }

  test("funnelCounts: one row per step with monotone user counts") {
    val c = EventAnalytics.funnelCounts(log, "user_id", "ts_ns", "event_type",
      Seq("view", "click", "purchase"), 1000L)
      .orderBy("step_idx").as[(Int, String, Long)].collect().toSeq
    assert(c === Seq((0, "view", 2L), (1, "click", 1L), (2, "purchase", 1L)))
  }

  test("retention: cohort from first active day, exact day offsets") {
    val dayNs = 86400L * 1000000000L
    val days = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L), (1L, 3L), // user 1: cohort day 0
      (2L, 1L), (2L, 3L) // user 2: cohort day 1
    ).zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, u, d * dayNs + 17L, "view")
    }.toDF("event_id", "user_id", "ts_ns", "event_type")
    val r = EventAnalytics.retention(days, "user_id", "ts_ns")
      .select("cohort_day", "day_offset", "n_active", "cohort_n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r === Set(
      (0L, 0L, 1L, 1L), (0L, 1L, 1L, 1L), (0L, 3L, 1L, 1L),
      (1L, 0L, 1L, 1L), (1L, 2L, 1L, 1L)))
  }

  test("scd2: consecutive duplicates collapse, intervals abut, null-safe change detection") {
    // user 1: view(10), view(30) [dup collapses], click(60), null(80),
    // null(90) [dup null collapses], view(120); user 2: single version
    val changes = Seq(
      (1L, 1L, 10L, Some("view")), (2L, 1L, 30L, Some("view")),
      (3L, 1L, 60L, Some("click")), (4L, 1L, 80L, None),
      (5L, 1L, 90L, None), (6L, 1L, 120L, Some("view")),
      (7L, 2L, 5L, Some("signup"))
    ).toDF("event_id", "user_id", "ts_ns", "attr")
    val h = EventAnalytics.scd2(changes, "user_id", "ts_ns", "event_id", "attr")
      .orderBy("user_id", "effective_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean, Long)].collect().toSeq
    assert(h === Seq(
      (1L, Some("view"), 10L, Some(60L), false, 1L),
      (1L, Some("click"), 60L, Some(80L), false, 3L),
      (1L, None, 80L, Some(120L), false, 4L),
      (1L, Some("view"), 120L, None, true, 6L),
      (2L, Some("signup"), 5L, None, true, 7L)))
  }

  test("scd2 plans ONE exchange for the lag, filter, and lead windows") {
    val changes = log.withColumnRenamed("event_type", "attr")
    val plan = EventAnalytics.scd2(changes, "user_id", "ts_ns", "event_id", "attr")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"boundary lag and effective_to lead must share one shuffle:\n$plan")
  }

  test("topPaths: session boundaries gate n-grams, ties break by path") {
    // user 1 session 1: view>click>view (one 3-path); session 2 alone;
    // user 2's 2-event session is too short for a 3-path
    val p = EventAnalytics.topPaths(log, "user_id", "ts_ns", "event_id",
      "event_type", gapNs = 50L, n = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(p === Seq(("view>click>view", 1L)))
    // with the gap wide enough to merge user 1's sessions the purchase joins
    val wide = EventAnalytics.topPaths(log, "user_id", "ts_ns", "event_id",
      "event_type", gapNs = 1000L, n = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(wide === Seq(("click>view>purchase", 1L), ("view>click>view", 1L)))
  }

  test("topPaths plans one exchange and no global sort before the top-k") {
    // k must stay BELOW the log's row count: with k >= maxRows (here the
    // 6-row LocalTableScan), the optimizer's EliminateLimits proves the
    // limit redundant and strips it, so Limit(Sort) no longer matches and
    // a (harmless, <= k rows) global sort plans instead. That is purely a
    // tiny-data artifact — at any real size maxRows is unknown and the
    // TakeOrderedAndProject pattern below is what plans.
    val plan = EventAnalytics.topPaths(log, "user_id", "ts_ns", "event_id",
      "event_type", gapNs = 50L, n = 3, k = 3)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // one user-keyed exchange for the windows + the aggregate's path
    // exchange; the top-k itself must be TakeOrderedAndProject
    assert(exchanges <= 2, s"expected user + path exchanges only:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }

  test("funnelSteps plans ONE exchange and scans the log ONCE at any step count") {
    // the round-7 join-per-step form re-embedded the upstream plan
    // ~2^(k-1) times; the fold form must keep one scan + one shuffle
    val plan = EventAnalytics.funnelSteps(log, "user_id", "ts_ns", "event_type",
      Seq("view", "click", "purchase"), 1000L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"funnel must be one user-keyed shuffle:\n$plan")
    val scans = "LocalTableScan".r.findAllIn(plan).length
    assert(scans == 1, s"funnel must scan the event log exactly once:\n$plan")
  }

  test("sessionize plans ONE exchange for both window functions") {
    val plan = EventAnalytics.sessionize(log, "user_id", "ts_ns", "event_id", 50L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"lag + running sum must share one shuffle:\n$plan")
    // the two Window ops keep different frames (lag [-1,-1] vs running sum
    // [unbounded, current]) so they can't fuse, but the second must reuse
    // the first's partitioning AND ordering: exactly one Sort in the plan.
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts <= 1, s"second window must reuse the sort order:\n$plan")
  }
}
