package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}
import ExtShared._

/** Event/session analytics, time-series and graph lanes.
  *
  * Split from the former monolithic Extensions.scala (registry unchanged:
  * [[Extensions.queries]] / [[Extensions.oracles]] concatenate the domain
  * objects). Oracle policy and citations live on [[Extensions]].
  */
private[graft] object ExtEvents {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // DAU/WAU stickiness: daily actives over trailing-7-day actives per
    // day — the engagement ratio beside the growth curve. The event log
    // reduces to the distinct (user, day) frame ONCE; each activity day
    // then EXPLODES into the 7 windows it belongs to (d0 ∈ [day, day+6])
    // and the trailing count is a plain equi-aggregate — exactly 7×|a|
    // rows, never the |days|×|a| nested-loop a band join plans.
    "events_dau_wau" -> ((s, d) => {
      val a = Tables.events(s, d)
        .select(col("user_id"), expr("(ts_ns div 1000) div 86400000000").as("day"))
        .distinct()
      val dau = a.groupBy(col("day")).agg(count_distinct(col("user_id")).as("dau"))
      val wau = a
        .withColumn("d0", explode(sequence(col("day"), col("day") + 6)))
        .groupBy(col("d0").as("day"))
        .agg(count_distinct(col("user_id")).as("wau"))
      // semi-join back to real activity days (windows anchored on a day
      // with no events exist only as explode artifacts)
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy(col("day"))
    }),

    // Gaps-and-islands: longest consecutive-day activity streak per user
    // (day − row_number is constant within an island). Reduces to the
    // distinct (user, day) frame first; both windows share ONE user-keyed
    // exchange. Top-20 streaks by (len, user, start) — TakeOrdered.
    "events_streaks" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val a = Tables.events(s, d)
        .select(col("user_id"), expr("(ts_ns div 1000) div 86400000000").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val islands = a
        .withColumn("__grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("__grp"))
        .agg(count(lit(1)).as("streak_days"), min(col("day")).as("start_day"))
      islands
        .select(col("user_id"), col("start_day"), col("streak_days"))
        .orderBy(col("streak_days").desc, col("user_id"), col("start_day"))
        .limit(20)
    }),

    // Pareto/power-user curve: events per user -> usage deciles (ntile
    // over the count-aggregated USER frame — a report over the already
    // reduced frame, not the event log) -> per-decile event share and
    // cumulative share. Cumulative share divides integer cumulative sums
    // by the integer total, so the doubles are engine-identical before
    // the round-6 fence.
    "events_power_users_pareto" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val per = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_ev"))
      val dec = per.withColumn("decile",
        ntile(10).over(Window.orderBy(col("n_ev").desc, col("user_id"))))
      val g = dec.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"))
      val tot = g.agg(sum(col("n_events")).as("__total"))
      g.crossJoin(broadcast(tot))
        .withColumn("__cum",
          sum(col("n_events")).over(Window.orderBy(col("decile"))))
        .select(col("decile"), col("n_users"), col("n_events"),
          round(col("n_events").cast("double") / col("__total"), 6).as("share"),
          round(col("__cum").cast("double") / col("__total"), 6).as("cum_share"))
        .orderBy(col("decile"))
    }),

    // PageRank over the near-dup graph (the boilerplate-hub ranking):
    // 10 fixed power-iteration rounds at d=0.85 over the symmetrized
    // minhash-LSH edges, scores quantized per iteration (the IVF
    // refinement's determinism fence) so the trajectory is a pure
    // function of the graph. One equi-join + one keyed aggregate per
    // round, checkpoint-rotated.
    "graph_pagerank" -> ((s, d) => {
      val (_, edges) = nearDupGraph(s, d, "graph_pagerank_sigs")
      graft.ext.Graph.pageRank(edges, iterations = 10, damping = 0.85,
          checkpointKey = "graph_pagerank")
        .orderBy(col("id"))
    }),

    // Rolling z-score anomaly screen: each event's value against the
    // trailing 20-event mean/std of ITS OWN user (the local complement of
    // the global MAD gate) — all three windows share one user-keyed
    // exchange; z rounded to 4 dp BEFORE the |z| > 3 threshold so a
    // 1-ulp std difference can't flip a flag cross-engine.
    "events_rolling_zscore" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(-19, 0)
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .withColumn("__mu", avg(col("value")).over(w))
        .withColumn("__sd", stddev_samp(col("value")).over(w))
        .withColumn("__z", when(col("__sd") > 0,
          round((col("value") - col("__mu")) / col("__sd"), 4)))
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          count_if(abs(col("__z")) > 3.0).as("n_anomalies"),
          round(max(abs(col("__z"))), 4).as("max_abs_z"))
        .transform(sortedOnce(_, col("user_id")))
    }),

    // Cohort LTV: revenue by (cohort day, age), plus the running
    // cumulative — the lifetime-value curve beside the retention ratios.
    // Same distinct-(user, day) reduction discipline; the cumsum window
    // is cohort-keyed (bounded by days, never a global sort).
    "events_cohort_ltv" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
      val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val daily = ev.join(cohort, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(round(sum(coalesce(col("value"), lit(0.0))), 2).as("rev"),
          count_distinct(col("user_id")).as("n_active"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      daily.withColumn("cum_rev", round(sum(col("rev")).over(w), 2))
        .transform(sortedOnce(_, col("cohort_day"), col("day_offset")))
    }),

    // A/B exposure analysis: users deterministically hash-bucketed into
    // two arms (the seeded-FNV fence every assignment in this repo uses);
    // conversion = the user's total purchase value exceeds the GLOBAL
    // median of per-user purchase values (a threshold that stays
    // non-degenerate at any SF — "did every user purchase" saturates to
    // p=1 and a zero pooled variance). Two-proportion z with pooled
    // variance, the degenerate p∈{0,1} case guarded to NULL.
    "events_ab_lift" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val vals = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(round(sum(coalesce(col("value"), lit(0.0))), 2).as("v"))
      val med = vals.agg(round(expr("percentile(v, 0.5)"), 6).as("__med"))
      val users = ev.select(col("user_id")).distinct()
        .withColumn("arm", pmod(graft.functions.Fnv.fnv1a64(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2L)))
      val arms = users
        .join(vals, Seq("user_id"), "left")
        .crossJoin(broadcast(med))
        .withColumn("__c", when(col("v") > col("__med"), 1L).otherwise(0L))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("__c")).as("k"))
      val a = arms.filter(col("arm") === 0)
        .select(col("n").as("n_a"), col("k").as("k_a"))
      val b = arms.filter(col("arm") === 1)
        .select(col("n").as("n_b"), col("k").as("k_b"))
      val p = (col("k_a") + col("k_b")).cast("double") / (col("n_a") + col("n_b"))
      val se = sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      a.crossJoin(b)
        .withColumn("rate_a", round(col("k_a").cast("double") / col("n_a"), 6))
        .withColumn("rate_b", round(col("k_b").cast("double") / col("n_b"), 6))
        .withColumn("z_score", when(se > 0, round(
          (col("k_a").cast("double") / col("n_a") -
            col("k_b").cast("double") / col("n_b")) / se, 4)))
        .select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
          col("rate_a"), col("rate_b"), col("z_score"))
    }),

    // Per-user running drawdown: value vs the running peak in (ts, id)
    // order — the degradation monitor shape (finance drawdown applied to
    // any per-key metric stream). Both windows share ONE user-keyed
    // exchange; output is the per-user worst drawdown.
    "events_drawdown" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(s, d).filter(col("value").isNotNull)
        .withColumn("peak", max(col("value")).over(w))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(min(col("value") - col("peak")), 6).as("max_drawdown"),
          round(max(col("peak")), 6).as("peak_value"))
        .transform(sortedOnce(_, col("user_id")))
    }),

    // Snapshot diff — the change-detection step incremental-retraining
    // decisions ride on: two dataset versions (derived deterministically
    // from the corpus: v1 drops doc_id%17==5, v2 drops doc_id%13==7 and
    // revises doc_id%11==0 texts) fingerprinted and FULL-OUTER joined on
    // the key, each doc classified added/removed/changed/unchanged. Scale
    // shape: two fingerprint projections + one key-partitioned full-outer
    // SMJ — the delta never touches the driver; at 100 TB the same plan
    // runs over partitioned fingerprint manifests.
    "ops_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val v1 = docs.filter(col("doc_id") % 17 =!= 5)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("fp1"))
      val v2 = docs.filter(col("doc_id") % 13 =!= 7)
        .select(col("doc_id"),
          md5(when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" rev2"))).otherwise(col("text"))
            .cast("binary")).as("fp2"))
      v1.join(v2, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("fp1").isNull, lit("added"))
            .when(col("fp2").isNull, lit("removed"))
            .when(col("fp1") =!= col("fp2"), lit("changed"))
            .otherwise(lit("unchanged")).as("status"))
        .orderBy(col("doc_id"))
    }),

    // GDPR-style tombstone purge accounting: a deterministic forget-list
    // (user_id % 13 = 0) broadcast anti-joined against the event log —
    // the deletion-propagation step every privacy pipeline runs, reduced
    // to the per-type audit counts the job must report.
    "ops_tombstone_purge" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val forget = ev.select(col("user_id")).distinct()
        .filter(col("user_id") % 13 === 0)
      val kept = ev.join(broadcast(forget), Seq("user_id"), "left_anti")
      ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_total"))
        .join(kept.groupBy(col("event_type")).agg(count(lit(1)).as("n_kept")),
          Seq("event_type"), "left")
        .withColumn("n_kept", coalesce(col("n_kept"), lit(0L)))
        .withColumn("n_purged", col("n_total") - col("n_kept"))
        .orderBy(col("event_type"))
    }),

    // Multi-touch attribution: first/last/linear credit for view+click
    // touches within 7 days before each purchase — one user-keyed join,
    // conversion-keyed windows sharing one exchange.
    "events_attribution" -> ((s, d) => {
      graft.ext.EventAnalytics.attribution(Tables.events(s, d),
          "user_id", "ts_ns", "event_id", "event_type",
          touchTypes = Seq("view", "click"), conversionType = "purchase",
          windowTicks = 7L * 86400L * 1000000000L)
        .transform(sortedOnce(_, col("touch_type")))
    }),

    // RFM user segmentation: recency/frequency/monetary quartile scores
    // (1..4 each, recency inverted) against the dataset's own max-ts "now",
    // rolled up per (r,f,m) cell. Quartile boundaries are ONE 1-row
    // broadcast (no global ntile sort), rounded to 6 dp before the strict
    // comparisons so interpolation ulps can't flip a score cross-engine.
    "events_rfm_segments" -> ((s, d) => {
      graft.ext.EventAnalytics.rfmSegments(Tables.events(s, d),
          "user_id", "ts_ns", "value")
        .transform(sortedOnce(_, col("r_score"), col("f_score"), col("m_score")))
    }),

    // Robust per-type outlier gate: exact median + MAD (median absolute
    // deviation) per event_type, rows beyond 3 MADs counted as outliers —
    // the anomaly screen that survives heavy tails where mean/stddev
    // z-scores break. Both medians are exact interpolating percentiles
    // (identical in DuckDB), the two per-type frames broadcast back. At
    // 100 TB swap `percentile` for `approx_percentile` (the
    // agg_approx_quantile_check lane pins that estimator's error band);
    // the exact form here is the oracle-replayable one.
    "events_anomaly_mad" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("__med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("__adev", abs(col("value") - col("__med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(__adev, 0.5)").as("__mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(max(col("__med")), 6).as("median_value"),
          round(max(col("__mad")), 6).as("mad"),
          // the outlier verdict compares ROUNDED quantities so the
          // boundary is a discrete 1e-6 grid both engines agree on (an
          // unrounded float boundary could flip on a last-ulp median
          // interpolation difference)
          sum(when(round(col("__adev"), 6) > round(lit(3.0) * col("__mad"), 6),
            1L).otherwise(0L)).as("n_outliers"))
        .transform(sortedOnce(_, col("event_type")))
    }),

    // The 100 TB swap for events_anomaly_mad, shipped as benched code
    // (VERDICT r11 #4): per-type aggregation state collapses from "all
    // values of the group" (exact percentile) to B=256 histogram counters
    // — the approx_percentile SHAPE — but the estimator is the PORTABLE
    // equi-width histogram sketch (the diag_profile_fast discipline), so
    // DuckDB replays every bin edge and crossing bit-for-bit instead of
    // the driver trusting an engine-specific digest. Median est = midpoint
    // of the bin where the cumulative count crosses n/2; MAD est = the
    // same sketch over |v − med_est| (range [0, amx] derived from the
    // phase-1 globals — no extra scan); outliers counted at bin
    // resolution (bins whose LOWER edge clears 3·MAD). Three scans of
    // events, every window frame ≤ B rows per type.
    "events_anomaly_approx" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val B = 256
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), col("value").cast("double").as("v"))
      val g = ev.groupBy(col("event_type"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
          count(lit(1)).as("n"))
      def binOf(x: org.apache.spark.sql.Column, lo: org.apache.spark.sql.Column,
          w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when(w === 0.0, lit(0L))
          .otherwise(least(lit((B - 1).toLong), floor((x - lo) / w)))
      val h1 = ev.join(broadcast(g), "event_type")
        .groupBy(col("event_type"), col("mn"), col("mx"), col("n"),
          binOf(col("v"), col("mn"), (col("mx") - col("mn")) / B).as("b"))
        .agg(count(lit(1)).as("c"))
      val wo = Window.partitionBy(col("event_type")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val med = h1.withColumn("cum", sum(col("c")).over(wo))
        .filter(col("cum") >= col("n").cast("double") / 2)
        .groupBy(col("event_type"), col("mn"), col("mx"), col("n"))
        .agg(min(col("b")).as("mb"))
        .withColumn("med_est",
          col("mn") + (col("mb").cast("double") + 0.5) * ((col("mx") - col("mn")) / B))
        .select(col("event_type"), col("n"), col("med_est"),
          greatest(col("mx") - col("med_est"), col("med_est") - col("mn")).as("amx"))
      // h2 feeds BOTH the MAD crossing and the outlier rollup — checkpoint
      // the (≤ types·B)-row frame so the third events scan runs once
      val h2 = ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), col("n"), col("med_est"), col("amx"),
          binOf(abs(col("v") - col("med_est")), lit(0.0), col("amx") / B).as("b"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("events_anomaly_approx", h2)
      val mad = h2.withColumn("cum", sum(col("c")).over(wo))
        .filter(col("cum") >= col("n").cast("double") / 2)
        .groupBy(col("event_type"), col("n"), col("med_est"), col("amx"))
        .agg(min(col("b")).as("mb2"))
        .withColumn("w2", col("amx") / B)
        .withColumn("mad_est", (col("mb2").cast("double") + 0.5) * col("w2"))
        .select(col("event_type"), col("n"), col("med_est"), col("w2"), col("mad_est"))
      h2.select(col("event_type"), col("b"), col("c"))
        .join(broadcast(mad), "event_type")
        .groupBy(col("event_type"), col("n"), col("med_est"), col("mad_est"))
        .agg(sum(when(col("b").cast("double") * col("w2") > lit(3.0) * col("mad_est"),
          col("c")).otherwise(lit(0L))).as("n_outliers_est"))
        .select(col("event_type"), col("n").as("n_events"),
          round(col("med_est"), 6).as("median_est"),
          round(col("mad_est"), 6).as("mad_est"),
          col("n_outliers_est"))
        .orderBy(col("event_type"))
    }),

    // ---- batch event analytics (exact integer time algebra) ---------------
    // Gap-based sessionization (30-min gap) rolled up to per-session stats:
    // one shuffle on user_id shared by the lag window, the running-sum
    // window, and the final aggregate. Runs on the µs truncation of the
    // nanos long (`div 1000` = DuckDB's read-time truncation) so the
    // session bounds are replayable outside the JVM.
    "events_sessionize" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      graft.ext.EventAnalytics.sessionStats(
        ev, "user_id", "ts_us", "event_id", "event_type",
        gapNs = 1800L * 1000000L)
        .transform(sortedOnce(_, col("user_id"), col("session_idx")))
    }),

    // Strict ordered funnel signup -> view -> click -> purchase within 72 h
    // of the user's first signup: per-step user counts plus conversion from
    // the anchor population.
    "events_funnel" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val steps = Seq("signup", "view", "click", "purchase")
      // every step's count lands in ONE global-aggregate row, so the
      // anchor-relative conversion is plain column math BEFORE the explode
      // — no self-crossjoin re-running the funnel for the denominator
      val perUser = graft.ext.EventAnalytics.funnelSteps(
        ev, "user_id", "ts_us", "event_type", steps,
        windowNs = 72L * 3600L * 1000000L)
      val counts = perUser.agg(count(lit(1)).as("n0"),
        steps.indices.tail.map(k => count(col(s"t$k")).as(s"n$k")): _*)
      val rows = steps.zipWithIndex.map { case (step, k) =>
        struct(lit(k).cast("int").as("step_idx"), lit(step).as("step"),
          col(s"n$k").as("n_users"),
          round(col(s"n$k").cast("double") / col("n0"), 6).as("conversion"))
      }
      counts.select(explode(array(rows: _*)).as("r"))
        .select(col("r.step_idx"), col("r.step"), col("r.n_users"),
          col("r.conversion"))
        .orderBy(col("step_idx"))
    }),

    // Weekday×hour seasonality profile: event counts per (day-of-week,
    // hour-of-day) bucket — the load-shape heatmap capacity planning and
    // anomaly baselines read. Pure integer bucket arithmetic from the
    // nanos epoch (epoch day 0 = Thursday, hence the +4 shift), one
    // ≤168-group aggregate.
    "events_weekday_seasonality" -> ((s, d) => {
      val day = expr("(ts_ns div 1000) div 86400000000")
      val hour = expr("((ts_ns div 1000) div 3600000000) % 24")
      Tables.events(s, d)
        .groupBy(pmod(day + 4, lit(7)).as("dow"), hour.as("hour"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("value")), 6).as("avg_value"))
        .orderBy(col("dow"), col("hour"))
    }),

    // Event-type transition matrix: consecutive-event (from → to) counts
    // per user stream with row shares — the first-order Markov summary
    // path/recommendation models start from (the 2-gram rollup
    // unconditioned on sessions; events_top_paths holds the
    // session-bounded n-grams). One user-keyed window + one ≤|types|²
    // aggregate; the deterministic (ts_ns, event_id) order rule pins ties.
    "events_type_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val pairs = Tables.events(s, d)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val rowTot = pairs.groupBy(col("from_type"))
        .agg(sum(col("n")).as("__rt"))
      pairs.join(rowTot, "from_type")
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("__rt"), 6).as("p"))
        .transform(sortedOnce(_, col("from_type"), col("to_type")))
    }),

    // Time-to-convert: among users completing the signup→purchase funnel
    // (same fold semantics as events_funnel), the distribution of the
    // anchor→final gap — the latency metric product teams read beside
    // conversion rate. Exact interpolating percentiles over integer µs
    // gaps (midpoints are .0/.5 — the round-4 fence is exact).
    "events_conversion_time" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val perUser = graft.ext.EventAnalytics.funnelSteps(
        ev, "user_id", "ts_us", "event_type", Seq("signup", "purchase"),
        windowNs = 72L * 3600L * 1000000L)
      perUser.filter(col("t1").isNotNull)
        .withColumn("gap_us", col("t1") - col("t0"))
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(gap_us, 0.5)"), 4).as("p50_us"),
          round(expr("percentile(gap_us, 0.9)"), 4).as("p90_us"),
          min(col("gap_us")).as("min_us"), max(col("gap_us")).as("max_us"))
    }),

    // Day-offset cohort retention over the first 30 days: cohort = first
    // active epoch-day, exact integer day buckets from the nanos long.
    "events_retention" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      graft.ext.EventAnalytics.retention(ev, "user_id", "ts_us",
        ticksPerDay = 86400L * 1000000L)
        .select(col("cohort_day"), col("day_offset"), col("n_active"), col("cohort_n"),
          round(col("n_active").cast("double") / col("cohort_n"), 6).as("retained"))
        .transform(sortedOnce(_, col("cohort_day"), col("day_offset")))
    }),

    // Growth curve: new users per day (each user counted on their FIRST
    // active day) plus the cumulative user count — the DAU/acquisition
    // report. One user-keyed aggregate; the cumsum window runs over the
    // ≤#days daily frame (metadata scale), never the event log.
    "events_new_users_daily" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val firstDay = Tables.events(s, d)
        .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
        .groupBy(col("user_id")).agg(min(col("day")).as("day"))
      val daily = firstDay.groupBy(col("day"))
        .agg(count(lit(1)).as("n_new_users"))
      daily
        .withColumn("cum_users",
          sum(col("n_new_users")).over(Window.orderBy(col("day"))))
        .orderBy(col("day"))
    }),

    // The retention FACT frame — one (user, cohort_day, day_offset) row
    // per distinct active day, the granularity the streaming twin
    // (streaming/StreamingRetention.scala) emits exactly once; the rollup
    // above is a plain aggregation over this. Distinct-reduce first, then
    // a broadcastable per-user min — one exchange on user_id.
    "events_retention_facts" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      // floor division (== `div` for the positive epoch) so the day
      // bucketing matches the streaming twin's Math.floorDiv bit-for-bit
      // even for pre-1970 timestamps
      val active = ev
        .select(col("user_id"),
          expr("(ts_us - pmod(ts_us, 86400000000)) div 86400000000").as("day"))
        .distinct()
      val cohort = active.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      active.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .orderBy(col("user_id"), col("day_offset"))
    }),

    // SCD2 history: the event log read as a CDC change stream keyed by
    // user, event_type as the tracked attribute — consecutive duplicate
    // values collapse into one version, each version carries its exact µs
    // validity interval. One exchange for all three windows.
    "events_scd2_history" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      graft.ext.EventAnalytics.scd2(ev, "user_id", "ts_us", "event_id", "event_type")
        .select(col("user_id"), col("event_type"),
          col("effective_from"), col("effective_to"), col("is_current"),
          col("version_id"))
        // version_id makes the sort total even when two version boundaries
        // share one µs-truncated timestamp (latent flap before)
        .transform(sortedOnce(_, col("user_id"), col("effective_from"), col("version_id")))
    }),

    // Top-20 3-step in-session paths: session containment enforced inside
    // the user-partitioned n-gram window (no per-session re-partition),
    // counted corpus-wide, deterministic (count desc, path) top-k.
    "events_top_paths" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      graft.ext.EventAnalytics.topPaths(ev, "user_id", "ts_us", "event_id",
        "event_type", gapNs = 1800L * 1000000L, n = 3, k = 20)
    }),

    // The two event lanes COMPOSED: sessionize (30-min gap), then the
    // strict ordered funnel view -> click -> purchase anchored PER SESSION
    // (key = user#session). Same one-aggregate fold as the user funnel —
    // the composite key just rides the existing user-keyed shuffle.
    "events_funnel_by_session" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("ts_us", expr("ts_ns div 1000"))
      val steps = Seq("view", "click", "purchase")
      val sess = graft.ext.EventAnalytics.sessionize(
        ev, "user_id", "ts_us", "event_id", gapNs = 1800L * 1000000L)
        .withColumn("sess_key",
          concat_ws("#", col("user_id"), col("session_idx")))
      val perSess = graft.ext.EventAnalytics.funnelSteps(
        sess, "sess_key", "ts_us", "event_type", steps,
        windowNs = 72L * 3600L * 1000000L)
      val counts = perSess.agg(count(lit(1)).as("n0"),
        steps.indices.tail.map(k => count(col(s"t$k")).as(s"n$k")): _*)
      val rows = steps.zipWithIndex.map { case (step, k) =>
        struct(lit(k).cast("int").as("step_idx"), lit(step).as("step"),
          col(s"n$k").as("n_sessions"),
          round(col(s"n$k").cast("double") / col("n0"), 6).as("conversion"))
      }
      counts.select(explode(array(rows: _*)).as("r"))
        .select(col("r.step_idx"), col("r.step"), col("r.n_sessions"),
          col("r.conversion"))
        .transform(sortedOnce(_, col("step_idx")))
    }),

    // Per-node triangle counts on the near-dup graph (degree-ordered
    // node-iterator — see Graph.triangleCounts): clique cohesion beside
    // pagerank's centrality, over the SAME banded edge set so the two
    // lanes share the signature checkpoint discipline.
    "graph_triangle_count" -> ((s, d) => {
      val (_, edges) = nearDupGraph(s, d, "graph_tri_sigs")
      graft.ext.Graph.triangleCounts(edges, checkpointKey = "graph_triangles")
        .orderBy(col("id"))
    }),

    // Exponentially weighted moving average per user (10-tap truncated
    // kernel, alpha = 0.3, pandas adjust=true normalization over the taps
    // actually present near the series head). The tap weights are embedded
    // as shortest-roundtrip double literals in BOTH engines' expressions —
    // never recomputed via pow(), whose libm rounding may differ — and the
    // tap sum is written in the same k = 0..9 order so the float
    // accumulation order matches cross-engine. One user-keyed exchange
    // shared by every window.
    "ts_ewma_smooth" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val wu = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      val ev = Tables.events(s, d).filter(col("value").isNotNull)
      val taps = ewmaTapWeights.zipWithIndex.map { case (wk, k) =>
        (coalesce(lag(col("value"), k).over(w), lit(0.0)) * lit(wk),
          when(lag(col("value"), k).over(w).isNotNull, lit(wk)).otherwise(lit(0.0)))
      }
      val num = taps.map(_._1).reduce(_ + _)
      val den = taps.map(_._2).reduce(_ + _)
      ev.withColumn("__ewma", num / den)
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("ts_ns").desc, col("event_id").desc)))
        .withColumn("n_events", count(lit(1)).over(wu))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("n_events"),
          round(col("__ewma"), 6).as("ewma_last"))
        .transform(sortedOnce(_, col("user_id")))
    }),

    // Linear interpolation over the same per-user daily spine as
    // ts_resample_ffill: interior gaps take the line between the
    // surrounding observed closes, leading/trailing gaps stay NULL (no
    // extrapolation). Both direction scans share the user-keyed exchange
    // and day sort.
    "ts_interpolate_linear" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val wPrev = W.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(W.unboundedPreceding, 0)
      val wNext = W.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(0, W.unboundedFollowing)
      TsSpine.spineDaily(s, d)
        .withColumn("pv", last(col("close"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("close").isNotNull, col("day")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("close"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("close").isNotNull, col("day")),
          ignoreNulls = true).over(wNext))
        .withColumn("close_interp",
          when(col("close").isNotNull, col("close"))
            .otherwise(when(col("pv").isNotNull && col("nv").isNotNull,
              round(col("pv") + (col("nv") - col("pv"))
                * ((col("day") - col("pd")) / (col("nd") - col("pd"))), 4))))
        .withColumn("observed", col("close").isNotNull)
        .select(col("user_id"), col("day"), col("close_interp"), col("observed"))
        .transform(sortedOnce(_, col("user_id"), col("day")))
    }),

    // Per-type daily-volume OLS trend. The five moments are EXACT LONG
    // sums (day indices and counts are integers; every product fits in
    // 64 bits at any SF that fits a cluster), so the only floating-point
    // ops are the two final divisions — slope and intercept are therefore
    // bit-identical cross-engine, no accumulation-order exposure at all.
    "events_trend_ols" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("ts_ns").isNotNull)
        .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
      val daily = ev.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y"))
      daily.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("day")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("day") * col("y")).as("sxy"),
          sum(col("day") * col("day")).as("sxx"))
        .withColumn("__den", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("__slope", when(col("__den") =!= 0,
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / col("__den").cast("double")))
        .select(col("event_type"), col("n").as("n_days"),
          round(col("__slope"), 6).as("slope"),
          round((col("sy").cast("double") - col("__slope") * col("sx").cast("double"))
            / col("n").cast("double"), 6).as("intercept"))
        .transform(sortedOnce(_, col("event_type")))
    }),

    // Inter-arrival gap profile per event_type: each event's gap since
    // ITS USER's previous event (any type), exact interpolated quantiles,
    // and the burstiness coefficient (sd−mean)/(sd+mean) — the
    // periodic(−1)..Poisson(0)..bursty(+1) axis used to spot bot traffic.
    // One user-keyed exchange for the lag, one type-keyed agg.
    "events_gap_stats" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val gaps = Tables.events(s, d)
        .withColumn("__gap_s",
          (col("ts_ns") - lag(col("ts_ns"), 1).over(w)).cast("double")
            / lit(1.0e9))
        .filter(col("__gap_s").isNotNull)
      gaps.groupBy(col("event_type")).agg(
          count(lit(1)).as("n_gaps"),
          round(avg(col("__gap_s")), 4).as("mean_gap_s"),
          round(expr("percentile(__gap_s, 0.5)"), 4).as("p50_gap_s"),
          round(expr("percentile(__gap_s, 0.9)"), 4).as("p90_gap_s"),
          // 0/0 (all gaps exactly zero — duplicate timestamps) diverges
          // cross-engine (Spark NULL vs IEEE NaN) — fence it to NULL
          when(stddev_samp(col("__gap_s")) + avg(col("__gap_s")) > 0,
            round((stddev_samp(col("__gap_s")) - avg(col("__gap_s")))
              / (stddev_samp(col("__gap_s")) + avg(col("__gap_s"))), 4))
            .as("burstiness"))
        .transform(sortedOnce(_, col("event_type")))
    }),

    // Growth accounting: each user-week classified new / retained /
    // resurrected, plus churn attributed to the week AFTER the last
    // active week of a gap — the standard quick-ratio inputs. Weekly
    // grain keeps every window bounded by the calendar, one user-keyed
    // exchange feeds all three lags.
    "events_lifecycle_stages" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      // a feeds staged, the max-week global, AND the output spine —
      // checkpoint the distinct user-week frame so events is scanned ONCE
      val a = Tables.events(s, d)
        .select(col("user_id"),
          expr("((ts_ns div 1000) div 86400000000) div 7").as("week"))
        .distinct()
        .localCheckpoint()
      Dedup.rotateCheckpoints("events_lifecycle_stages", a)
      val w = W.partitionBy(col("user_id")).orderBy(col("week"))
      val staged = a
        .withColumn("__first", min(col("week")).over(
          W.partitionBy(col("user_id"))))
        .withColumn("__prev", lag(col("week"), 1).over(w))
        .withColumn("__next", lead(col("week"), 1).over(w))
        .withColumn("stage",
          when(col("week") === col("__first"), "new")
            .when(col("__prev") === col("week") - 1, "retained")
            .otherwise("resurrected"))
      val stages = staged.groupBy(col("week")).agg(
        count_if(col("stage") === "new").as("n_new"),
        count_if(col("stage") === "retained").as("n_retained"),
        count_if(col("stage") === "resurrected").as("n_resurrected"))
      val mx = a.agg(max(col("week")).as("__mx"))
      val churned = staged
        .filter(col("__next").isNull || col("__next") > col("week") + 1)
        .crossJoin(broadcast(mx))
        .filter(col("week") + 1 <= col("__mx"))
        .groupBy((col("week") + 1).as("week"))
        .agg(count(lit(1)).as("n_churned"))
      // drive the output from the min..max week SPINE, not the active-week
      // set: churn attributed to a globally dead week (no active users at
      // all) would otherwise drop out of the left join entirely
      val spine = a.agg(min(col("week")).as("w0"), max(col("week")).as("w1"))
        .select(explode(sequence(col("w0"), col("w1"))).as("week"))
      spine.join(stages, Seq("week"), "left")
        .join(churned, Seq("week"), "left")
        .select(col("week"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .transform(sortedOnce(_, col("week")))
    }),

    // Seasonal-naive backtest: forecast(day) = count(day − 7) on the
    // ZERO-FILLED per-type daily spine, scored by MAPE (y>0 days) and
    // RMSE. The error sums are exact integers squared — only the final
    // divisions are floating-point.
    "events_forecast_snaive" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
      val daily = ev.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("y"))
      val spine = ev.groupBy(col("event_type"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("event_type"),
          explode(sequence(col("d0"), col("d1"))).as("day"))
      val filled = spine.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("y"), lit(0L)).as("y"))
      val w = W.partitionBy(col("event_type")).orderBy(col("day"))
      val scored = filled
        .withColumn("yhat", lag(col("y"), 7).over(w))
        .filter(col("yhat").isNotNull)
      scored.groupBy(col("event_type")).agg(
          count(lit(1)).as("n_eval"),
          round(avg(when(col("y") > 0,
            abs(col("y") - col("yhat")).cast("double") / col("y"))), 4)
            .as("mape"),
          round(sqrt(avg(((col("y") - col("yhat"))
            * (col("y") - col("yhat"))).cast("double"))), 4).as("rmse"))
        .transform(sortedOnce(_, col("event_type")))
    }),

    // Pairwise audience overlap between event types: |A∩B| via ONE
    // user-keyed self-join of the distinct (user, type) set (per-user
    // type lists are tiny, so the join fan-out is bounded per user — no
    // all-pairs anywhere), Jaccard from the broadcast per-type sizes.
    "events_audience_overlap" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .select(col("user_id"), col("event_type")).distinct()
      val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("sz"))
      val both = ut.select(col("user_id"), col("event_type").as("t1"))
        .join(ut.select(col("user_id"), col("event_type").as("t2")), "user_id")
        .filter(col("t1") < col("t2"))
        .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_both"))
      both
        .join(broadcast(sizes.select(col("event_type").as("t1"), col("sz").as("n1"))), "t1")
        .join(broadcast(sizes.select(col("event_type").as("t2"), col("sz").as("n2"))), "t2")
        .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n_both"),
          round(col("n_both").cast("double")
            / (col("n1") + col("n2") - col("n_both")), 6).as("jaccard"))
        .orderBy(col("t1"), col("t2"))
    }),

    // Autocorrelation of the daily order-count series at lags 1..7 — the
    // seasonality detector run before picking a forecast model. All moment
    // sums are EXACT LONGs (counts and count-products); the only doubles
    // are the final mean and the num/den divisions, so the ACF is
    // bit-identical cross-engine. The lag join is an EQUI-join on the
    // computed key day+lag (7 exploded lags over the daily aggregate — a
    // series bounded by the calendar, never by fact volume).
    "ts_acf_daily" -> ((s, d) => {
      val daily = Tables.orders(s, d)
        .withColumn("day", expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
        .groupBy(col("day")).agg(count(lit(1)).as("y"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("ts_acf_daily", daily)
      val g = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
      val a = daily.select(col("day"), col("y"),
        explode(sequence(lit(1L), lit(7L))).as("lag"))
      val b = daily.select(col("day").as("bday"), col("y").as("by"))
      val pairs = a.join(b, col("day") + col("lag") === col("bday"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("y") * col("by")).as("sxy"),
          sum(col("y")).as("sa"), sum(col("by")).as("sb"))
      pairs.crossJoin(broadcast(g))
        .withColumn("ybar", col("sy").cast("double") / col("n"))
        .withColumn("num", col("sxy").cast("double")
          - col("ybar") * (col("sa") + col("sb")).cast("double")
          + col("n_pairs").cast("double") * col("ybar") * col("ybar"))
        .withColumn("den", col("syy").cast("double")
          - col("n").cast("double") * col("ybar") * col("ybar"))
        .select(col("lag"), col("n_pairs"),
          when(col("den") > 0, round(col("num") / col("den"), 6)).as("acf"))
        .orderBy(col("lag"))
    }),

    // Day-of-week seasonal index of daily order revenue: per-dow average
    // of the daily (cents-rounded) revenue over the global daily average.
    // The weekday-effect readout behind staffing/campaign calendars; dow
    // is the raw epoch-day mod 7 (day 0 = a Thursday), documented rather
    // than re-labeled so the arithmetic stays pure integer.
    "ts_seasonality_dow" -> ((s, d) => {
      // daily is referenced twice (global avg + per-dow) — checkpoint the
      // calendar-bounded aggregate so orders is scanned ONCE
      val daily = Tables.orders(s, d)
        .withColumn("day", expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000"))
        .groupBy(col("day"))
        .agg(round(sum(col("o_totalprice")), 2).as("rev"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("ts_seasonality_dow", daily)
      val g = daily.agg(avg(col("rev")).as("gavg"))
      daily.withColumn("dow", pmod(col("day"), lit(7L)))
        .groupBy(col("dow"))
        .agg(count(lit(1)).as("n_days"), avg(col("rev")).as("avg_rev"))
        .crossJoin(broadcast(g))
        .select(col("dow"), col("n_days"),
          round(col("avg_rev"), 4).as("avg_rev"),
          round(col("avg_rev") / col("gavg"), 4).as("seasonal_idx"))
        .orderBy(col("dow"))
    }),

    // CUSUM mean-shift screen over the daily event-count series:
    // cusum_t = (running count sum) - t * global_mean, both terms exact
    // (LONG prefix sum over the tiny daily frame; one double product), the
    // peak |cusum| day flagged as the changepoint candidate. The window is
    // global but runs over the DAILY aggregate — calendar-bounded, so the
    // single partition holds hundreds of rows at any fact SF.
    "ts_cusum_shift" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // daily feeds g, the cusum, and the peak pass — checkpoint the
      // calendar-bounded aggregate so events is scanned ONCE
      val daily = Tables.events(s, d)
        .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
        .groupBy(col("day")).agg(count(lit(1)).as("y"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("ts_cusum_shift", daily)
      val g = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val w = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cu = daily.crossJoin(broadcast(g))
        .withColumn("cum", sum(col("y")).over(w))
        .withColumn("t", row_number().over(Window.orderBy(col("day"))))
        .withColumn("cusum", round(col("cum").cast("double")
          - col("t").cast("double")
            * (col("sy").cast("double") / col("n")), 4))
      val mx = cu.agg(max(abs(col("cusum"))).as("mxabs"))
      cu.crossJoin(broadcast(mx))
        .select(col("day"), col("y"), col("cusum"),
          (abs(col("cusum")) === col("mxabs")).as("is_peak"))
        .transform(sortedOnce(_, col("day")))
    }),

    // CUPED variance reduction on the A/B metric: per-user pre/post
    // purchase totals split at the global time midpoint, theta =
    // cov(pre, post)/var(pre) over all users pooled, adjusted metric
    // Y - theta*(X - E[X]). The readout is the variance-reduction ratio —
    // the experiment-sensitivity win CUPED buys. One user-keyed aggregate
    // plus 1-row global reductions; moments via built-in covar/var.
    "events_cuped" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // integer midpoint (div, not /: long / int is DOUBLE division in
      // Spark, and a ~3.6e18 ns sum doesn't round-trip through a double)
      val rng = ev.agg(min(col("ts_ns")).as("mn"), max(col("ts_ns")).as("mx"))
        .select(expr("(mn + mx) div 2").as("pivot"))
      // per feeds the moment pass AND the adjusted-variance pass —
      // checkpoint the per-user aggregate so events is scanned ONCE
      val per = ev.filter(col("event_type") === "purchase")
        .crossJoin(broadcast(rng))
        .groupBy(col("user_id"))
        .agg(round(sum(when(col("ts_ns") < col("pivot"),
            coalesce(col("value"), lit(0.0))).otherwise(0.0)), 2).as("x"),
          round(sum(when(col("ts_ns") >= col("pivot"),
            coalesce(col("value"), lit(0.0))).otherwise(0.0)), 2).as("y"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("events_cuped", per)
      val m = per.agg(count(lit(1)).as("n_users"),
        covar_pop(col("x"), col("y")).as("cxy"),
        var_pop(col("x")).as("vx"), avg(col("x")).as("mx"))
      val theta = m.select(col("n_users"), col("mx"),
        when(col("vx") > 0, col("cxy") / col("vx")).otherwise(0.0).as("theta"))
      per.crossJoin(broadcast(theta))
        .withColumn("yadj", col("y") - col("theta") * (col("x") - col("mx")))
        .groupBy(col("n_users"), col("theta"))
        .agg(var_samp(col("y")).as("vy"), var_samp(col("yadj")).as("vyadj"))
        .select(col("n_users"), round(col("theta"), 4).as("theta"),
          round(col("vy"), 2).as("var_y"),
          round(col("vyadj"), 2).as("var_y_adj"),
          round(col("vyadj") / col("vy"), 4).as("var_ratio"))
    }),

    // Degree distribution of the MinHash near-dup graph: per-node distinct-
    // neighbor degree over the LSH pair set, histogrammed, with the
    // untouched corpus as the degree-0 row. The graph-shape audit run
    // before components/PageRank — a skewed tail here predicts a hot key
    // in every downstream graph join.
    "graph_degree_histogram" -> ((s, d) => {
      val (sigs, pairs) = nearDupGraph(s, d, "graph_degree_histogram")
      val sym = pairs.unionAll(
        pairs.select(col("id2").as("id1"), col("id1").as("id2")))
      val deg = sym.groupBy(col("id1"))
        .agg(count_distinct(col("id2")).as("degree"))
      // the checkpointed sigs frame already holds one row per doc (the
      // short-doc shingle fallback guarantees coverage) — reuse it for
      // the node universe instead of re-scanning documents
      val nzero = sigs.select(col("id").as("doc_id"))
        .join(deg.select(col("id1").as("doc_id")), Seq("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_nodes"))
        .select(lit(0L).as("degree"), col("n_nodes"))
      deg.groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .unionAll(nzero.filter(col("n_nodes") > 0))
        .orderBy(col("degree"))
    }),
  )

  def oracles: Map[String, String] = Map(

    "events_streaks" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |           FROM events),
        |i AS (SELECT user_id, day,
        |        day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |      FROM a),
        |s AS (SELECT user_id, count(*) AS streak_days, min(day) AS start_day
        |      FROM i GROUP BY user_id, grp)
        |SELECT user_id, start_day, streak_days FROM s
        |ORDER BY streak_days DESC, user_id, start_day LIMIT 20""".stripMargin,

    "events_power_users_pareto" ->
      s"""WITH per AS (SELECT user_id, count(*) AS n_ev FROM events GROUP BY user_id),
         |dec AS (SELECT n_ev,
         |          ntile(10) OVER (ORDER BY n_ev DESC, user_id) AS decile
         |        FROM per),
         |g AS (SELECT decile, count(*) AS n_users,
         |        CAST(sum(n_ev) AS BIGINT) AS n_events
         |      FROM dec GROUP BY decile),
         |t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM g),
         |c AS (SELECT decile, n_users, n_events,
         |        CAST(sum(n_events) OVER (ORDER BY decile) AS BIGINT) AS cum
         |      FROM g)
         |SELECT decile, n_users, n_events,
         |  ${sparkRound("CAST(n_events AS DOUBLE) / total", 6)} AS share,
         |  ${sparkRound("CAST(cum AS DOUBLE) / total", 6)} AS cum_share
         |FROM c, t ORDER BY decile""".stripMargin,

    "events_dau_wau" ->
      s"""WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
         |           FROM events),
         |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM a GROUP BY day),
         |days AS (SELECT DISTINCT day AS d0 FROM a),
         |wau AS (SELECT d0 AS day, count(DISTINCT user_id) AS wau
         |        FROM days JOIN a ON a.day BETWEEN d0 - 6 AND d0
         |        GROUP BY d0)
         |SELECT day, dau, wau,
         |  ${sparkRound("CAST(dau AS DOUBLE) / wau", 6)} AS stickiness
         |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,

    // PageRank replay: the SAME pairs CTE, symmetrized, degree counts,
    // then the 10 rounds unrolled with the identical per-round quantized
    // arithmetic (double literals, Spark-parity rounding)
    "graph_pagerank" ->
      s"""$minhashPairsCtes,
         |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
         |        UNION SELECT id2, id1 FROM pairs),
         |deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY a),
         |nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS (SELECT a AS id, 1.0 / (SELECT n FROM nn) AS rank FROM deg),
         |r1 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r0 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r2 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r1 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r3 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r2 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r4 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r3 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r5 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r4 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r6 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r5 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r7 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r6 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r8 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r7 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r9 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r8 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b),
         |r10 AS (SELECT s.b AS id,
         |  ${sparkRound(s"(1.0 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(r.rank / d.deg)", 10)} AS rank
         |  FROM sym s JOIN r9 r ON r.id = s.a JOIN deg d ON d.a = s.a
         |  GROUP BY s.b)
         |SELECT id, ${sparkRound("rank", 6)} AS rank FROM r10 ORDER BY id""".stripMargin,

    // Rolling-z replay: identical 20-row trailing frame and rounding fence.
    "events_rolling_zscore" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id, value
         |           FROM events WHERE value IS NOT NULL),
         |r AS (SELECT *,
         |    avg(value) OVER w AS mu,
         |    stddev_samp(value) OVER w AS sd
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
         |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
         |z AS (SELECT user_id,
         |    CASE WHEN sd > 0 THEN ${sparkRound("(value - mu) / sd", 4)} END AS zz
         |  FROM r)
         |SELECT user_id, count(*) AS n_events,
         |  CAST(sum(CASE WHEN abs(zz) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_anomalies,
         |  ${sparkRound("max(abs(zz))", 4)} AS max_abs_z
         |FROM z GROUP BY user_id ORDER BY user_id""".stripMargin,

    // LTV replay: same day floor-div, cents rounding before the cumsum.
    "events_cohort_ltv" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |             coalesce(value, 0.0) AS v
         |           FROM events),
         |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
         |daily AS (SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
         |    ${sparkRound("sum(e.v)", 2)} AS rev,
         |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
         |  FROM e JOIN c USING (user_id) GROUP BY 1, 2)
         |SELECT cohort_day, day_offset, rev, n_active,
         |  ${sparkRound(
           "sum(rev) OVER (PARTITION BY cohort_day ORDER BY day_offset ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
           2)} AS cum_rev
         |FROM daily ORDER BY cohort_day, day_offset""".stripMargin,

    // A/B replay: same FNV arm fence, same median threshold (interpolated
    // percentile over cents-rounded sums), same pooled-variance z.
    "events_ab_lift" ->
      s"""WITH vals AS (SELECT user_id,
         |    ${sparkRound("sum(coalesce(value, 0.0))", 2)} AS v
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |med AS (SELECT ${sparkRound("quantile_cont(v, 0.5)", 6)} AS m FROM vals),
         |u AS (SELECT DISTINCT user_id FROM events),
         |arms AS (SELECT u.user_id,
         |    ((${signed64(fnvSql("'ab:' || CAST(u.user_id AS VARCHAR)"))} % 2) + 2) % 2 AS arm,
         |    CASE WHEN vals.v > med.m THEN 1 ELSE 0 END AS c
         |  FROM u LEFT JOIN vals ON u.user_id = vals.user_id, med),
         |g AS (SELECT arm, count(*) AS n, CAST(sum(c) AS BIGINT) AS k
         |      FROM arms GROUP BY arm),
         |a AS (SELECT n AS n_a, k AS k_a FROM g WHERE arm = 0),
         |b AS (SELECT n AS n_b, k AS k_b FROM g WHERE arm = 1),
         |j AS (SELECT *, (k_a + k_b) / CAST(n_a + n_b AS DOUBLE) AS p FROM a, b),
         |jj AS (SELECT *,
         |    sqrt(p * (1.0 - p) * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)) AS se
         |  FROM j)
         |SELECT n_a, k_a, n_b, k_b,
         |  ${sparkRound("CAST(k_a AS DOUBLE) / n_a", 6)} AS rate_a,
         |  ${sparkRound("CAST(k_b AS DOUBLE) / n_b", 6)} AS rate_b,
         |  CASE WHEN se > 0 THEN ${sparkRound(
           "(CAST(k_a AS DOUBLE) / n_a - CAST(k_b AS DOUBLE) / n_b) / se", 4)}
         |  END AS z_score
         |FROM jj""".stripMargin,

    // Drawdown replay: identical (ts, id) running-max frame.
    "events_drawdown" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id, value
         |           FROM events WHERE value IS NOT NULL),
         |r AS (SELECT *, max(value) OVER (PARTITION BY user_id
         |        ORDER BY tus, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
         |      FROM e)
         |SELECT user_id, count(*) AS n_events,
         |  ${sparkRound("min(value - peak)", 6)} AS max_drawdown,
         |  ${sparkRound("max(peak)", 6)} AS peak_value
         |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Snapshot-diff replay: same version derivations, same md5
    // fingerprints, same full-outer classification.
    "ops_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, md5(text) AS fp1 FROM documents
        |            WHERE doc_id % 17 <> 5),
        |v2 AS (SELECT doc_id,
        |         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' rev2'
        |                  ELSE text END) AS fp2
        |       FROM documents WHERE doc_id % 13 <> 7)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN fp1 <> fp2 THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,

    // Purge accounting replay: same forget rule + anti-join arithmetic.
    // NULL user_ids (none in current fixtures, but contemplated inputs —
    // see the HLL oracles' guards) are KEPT, matching the Spark
    // anti-join's null-never-matches semantics, not dropped by the modulo
    // predicate's NULL.
    "ops_tombstone_purge" ->
      """WITH k AS (SELECT event_type, count(*) AS n_kept FROM events
        |           WHERE user_id IS NULL OR user_id % 13 != 0 GROUP BY event_type),
        |t AS (SELECT event_type, count(*) AS n_total FROM events GROUP BY event_type)
        |SELECT t.event_type, t.n_total, coalesce(k.n_kept, 0) AS n_kept,
        |  t.n_total - coalesce(k.n_kept, 0) AS n_purged
        |FROM t LEFT JOIN k USING (event_type)
        |ORDER BY t.event_type""".stripMargin,

    // Attribution replay: same user-keyed join + window predicate on µs
    // ticks (Spark uses ns — same inequality set since ns = µs·1000),
    // first/last via row_number over the identical (tick, id) order.
    "events_attribution" ->
      s"""WITH t AS (SELECT user_id AS u, epoch_us(ts) AS t_tick,
         |             event_id AS t_id, event_type AS touch_type
         |           FROM events WHERE event_type IN ('view', 'click')),
         |c AS (SELECT user_id AS u, epoch_us(ts) AS c_tick, event_id AS c_id
         |      FROM events WHERE event_type = 'purchase'),
         |j AS (SELECT c.c_id, t.t_tick, t.t_id, t.touch_type
         |      FROM c JOIN t USING (u)
         |      WHERE t.t_tick <= c.c_tick
         |        AND t.t_tick > c.c_tick - ${7L * 86400L * 1000000L}),
         |r AS (SELECT *,
         |        count(*) OVER (PARTITION BY c_id) AS n_touches,
         |        row_number() OVER (PARTITION BY c_id
         |          ORDER BY t_tick, t_id) AS rn_first,
         |        row_number() OVER (PARTITION BY c_id
         |          ORDER BY t_tick DESC, t_id DESC) AS rn_last
         |      FROM j)
         |SELECT touch_type,
         |  CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS first_touch_convs,
         |  CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS last_touch_convs,
         |  ${sparkRound("sum(CAST(1 AS DOUBLE) / n_touches)", 6)} AS linear_credit,
         |  count(*) AS n_touch_rows
         |FROM r GROUP BY touch_type ORDER BY touch_type""".stripMargin,

    // RFM replay: epoch_us ticks (Spark uses ns — same floor-div day),
    // identical interpolated quartiles rounded 6 dp before the strict
    // comparisons, monetary rounded to cents BEFORE the quartile pass.
    "events_rfm_segments" ->
      s"""WITH u AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
         |    count(*) AS freq,
         |    ${sparkRound("sum(coalesce(value, 0.0))", 2)} AS mon
         |  FROM events GROUP BY user_id),
         |nw AS (SELECT max(epoch_us(ts)) AS now_us FROM events),
         |b AS (SELECT u.*, (nw.now_us - u.last_us) // 86400000000 AS rec_days
         |      FROM u, nw),
         |q AS (SELECT
         |  ${sparkRound("quantile_cont(CAST(rec_days AS DOUBLE), 0.25)", 6)} AS r1,
         |  ${sparkRound("quantile_cont(CAST(rec_days AS DOUBLE), 0.5)", 6)} AS r2,
         |  ${sparkRound("quantile_cont(CAST(rec_days AS DOUBLE), 0.75)", 6)} AS r3,
         |  ${sparkRound("quantile_cont(CAST(freq AS DOUBLE), 0.25)", 6)} AS f1,
         |  ${sparkRound("quantile_cont(CAST(freq AS DOUBLE), 0.5)", 6)} AS f2,
         |  ${sparkRound("quantile_cont(CAST(freq AS DOUBLE), 0.75)", 6)} AS f3,
         |  ${sparkRound("quantile_cont(mon, 0.25)", 6)} AS m1,
         |  ${sparkRound("quantile_cont(mon, 0.5)", 6)} AS m2,
         |  ${sparkRound("quantile_cont(mon, 0.75)", 6)} AS m3
         |  FROM b),
         |s AS (SELECT
         |  5 - (1 + CASE WHEN CAST(rec_days AS DOUBLE) > q.r1 THEN 1 ELSE 0 END
         |         + CASE WHEN CAST(rec_days AS DOUBLE) > q.r2 THEN 1 ELSE 0 END
         |         + CASE WHEN CAST(rec_days AS DOUBLE) > q.r3 THEN 1 ELSE 0 END) AS r_score,
         |  1 + CASE WHEN CAST(freq AS DOUBLE) > q.f1 THEN 1 ELSE 0 END
         |    + CASE WHEN CAST(freq AS DOUBLE) > q.f2 THEN 1 ELSE 0 END
         |    + CASE WHEN CAST(freq AS DOUBLE) > q.f3 THEN 1 ELSE 0 END AS f_score,
         |  1 + CASE WHEN mon > q.m1 THEN 1 ELSE 0 END
         |    + CASE WHEN mon > q.m2 THEN 1 ELSE 0 END
         |    + CASE WHEN mon > q.m3 THEN 1 ELSE 0 END AS m_score,
         |  mon FROM b, q)
         |SELECT r_score, f_score, m_score, count(*) AS n_users,
         |  ${sparkRound("sum(mon)", 2)} AS total_mon
         |FROM s GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "events_anomaly_mad" ->
      s"""WITH ev AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
         |med AS (SELECT event_type, median(value) AS med FROM ev GROUP BY event_type),
         |dev AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS adev
         |        FROM ev e JOIN med m USING (event_type)),
         |mad AS (SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type)
         |SELECT d.event_type, count(*) AS n_events,
         |  ${sparkRound("max(d.med)", 6)} AS median_value,
         |  ${sparkRound("max(m.mad)", 6)} AS mad,
         |  CAST(sum(CASE WHEN ${sparkRound("d.adev", 6)} > ${sparkRound("3.0 * m.mad", 6)}
         |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM dev d JOIN mad m USING (event_type)
         |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,

    // Histogram-sketch replay (the diag_profile_fast discipline): the
    // approximate median/MAD estimator is the PORTABLE equi-width
    // histogram, so DuckDB recomputes every bin edge, n/2 crossing and
    // bin-resolution outlier cut with the same IEEE-double arithmetic —
    // an exact hash match on an approximate statistic.
    "events_anomaly_approx" ->
      s"""WITH ev AS (SELECT event_type, CAST(value AS DOUBLE) AS v
         |            FROM events WHERE value IS NOT NULL),
         |g AS (SELECT event_type, min(v) AS mn, max(v) AS mx, count(*) AS n
         |      FROM ev GROUP BY 1),
         |h1 AS (SELECT e.event_type, g.mn, g.mx, g.n,
         |         CAST(CASE WHEN (g.mx - g.mn) / 256 = 0.0 THEN 0
         |              ELSE least(255, floor((e.v - g.mn) / ((g.mx - g.mn) / 256)))
         |              END AS BIGINT) AS b,
         |         count(*) AS c
         |       FROM ev e JOIN g USING (event_type) GROUP BY 1, 2, 3, 4, 5),
         |m1 AS (SELECT event_type, mn, mx, n, min(b) AS mb FROM (
         |         SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY b
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |         FROM h1)
         |       WHERE cum >= CAST(n AS DOUBLE) / 2 GROUP BY 1, 2, 3, 4),
         |me AS (SELECT event_type, n, mn, mx,
         |         mn + (CAST(mb AS DOUBLE) + 0.5) * ((mx - mn) / 256) AS med_est
         |       FROM m1),
         |med AS (SELECT event_type, n, med_est,
         |          greatest(mx - med_est, med_est - mn) AS amx FROM me),
         |h2 AS (SELECT e.event_type, m.n, m.med_est, m.amx,
         |         CAST(CASE WHEN m.amx / 256 = 0.0 THEN 0
         |              ELSE least(255, floor(abs(e.v - m.med_est) / (m.amx / 256)))
         |              END AS BIGINT) AS b,
         |         count(*) AS c
         |       FROM ev e JOIN med m USING (event_type) GROUP BY 1, 2, 3, 4, 5),
         |m2 AS (SELECT event_type, n, med_est, amx, min(b) AS mb2 FROM (
         |         SELECT *, sum(c) OVER (PARTITION BY event_type ORDER BY b
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |         FROM h2)
         |       WHERE cum >= CAST(n AS DOUBLE) / 2 GROUP BY 1, 2, 3, 4),
         |mad AS (SELECT event_type, n, med_est, amx / 256 AS w2,
         |          (CAST(mb2 AS DOUBLE) + 0.5) * (amx / 256) AS mad_est FROM m2)
         |SELECT h2.event_type, CAST(mad.n AS BIGINT) AS n_events,
         |  ${sparkRound("mad.med_est", 6)} AS median_est,
         |  ${sparkRound("mad.mad_est", 6)} AS mad_est,
         |  CAST(sum(CASE WHEN CAST(h2.b AS DOUBLE) * mad.w2 > 3.0 * mad.mad_est
         |                THEN h2.c ELSE 0 END) AS BIGINT) AS n_outliers_est
         |FROM h2 JOIN mad USING (event_type)
         |GROUP BY 1, 2, 3, 4 ORDER BY h2.event_type""".stripMargin,

    // Sessionization replayed on the exact µs long (epoch_us = Spark's
    // `ts_ns div 1000` under DuckDB's read-time truncation): same lag /
    // gap / running-sum windows, same (ts, event_id) tie-break, exact
    // integer session bounds.
    "events_sessionize" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |s AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |                       OR tus - lag(tus) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |x AS (SELECT *, CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        |      FROM s)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(tus) AS start_ts, max(tus) AS end_ts,
        |  max(tus) - min(tus) AS duration,
        |  count(DISTINCT event_type) AS n_types
        |FROM x GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,

    // Funnel replayed step by step: anchor = first signup, each step's
    // first qualifying time strictly after the previous step and within
    // the 72 h anchor window; counts are exact, conversion Spark-rounded.
    "events_funnel" ->
      s"""WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
         |            WHERE event_type = 'signup' GROUP BY user_id),
         |s1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t1
         |       FROM events e JOIN s0 USING (user_id)
         |       WHERE e.event_type = 'view' AND epoch_us(e.ts) > t0
         |         AND epoch_us(e.ts) <= t0 + 259200000000 GROUP BY e.user_id),
         |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
         |       FROM events e JOIN s1 USING (user_id) JOIN s0 USING (user_id)
         |       WHERE e.event_type = 'click' AND epoch_us(e.ts) > t1
         |         AND epoch_us(e.ts) <= t0 + 259200000000 GROUP BY e.user_id),
         |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3
         |       FROM events e JOIN s2 USING (user_id) JOIN s0 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t2
         |         AND epoch_us(e.ts) <= t0 + 259200000000 GROUP BY e.user_id),
         |n AS (SELECT 0 AS step_idx, 'signup' AS step,
         |        (SELECT count(*) FROM s0) AS n_users
         |      UNION ALL SELECT 1, 'view', (SELECT count(*) FROM s1)
         |      UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
         |      UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
         |SELECT step_idx, step, n_users,
         |  ${sparkRound("n_users::DOUBLE / (SELECT count(*) FROM s0)", 6)} AS conversion
         |FROM n ORDER BY step_idx""".stripMargin,

    "events_scd2_history" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id, event_type
        |           FROM events),
        |b AS (SELECT *, lag(event_type) OVER w AS prev, row_number() OVER w AS rn
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |v AS (SELECT user_id, event_type, tus, event_id FROM b
        |      WHERE rn = 1 OR event_type IS DISTINCT FROM prev)
        |SELECT user_id, event_type, tus AS effective_from,
        |  lead(tus) OVER w2 AS effective_to,
        |  lead(tus) OVER w2 IS NULL AS is_current,
        |  event_id AS version_id
        |FROM v WINDOW w2 AS (PARTITION BY user_id ORDER BY tus, event_id)
        |ORDER BY user_id, effective_from, version_id""".stripMargin,

    // Top paths replayed: the sessionize CTE, then forward 3-grams gated
    // on both leads staying in the same session. A NULL event_type inside
    // a session would NULL-propagate through `||` exactly like Spark's
    // `concat`; both engines then drop NULL paths explicitly (Spark's
    // isNotNull filter / the IS NOT NULL guard here).
    "events_top_paths" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
        |           FROM events),
        |s AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
        |                       OR tus - lag(tus) OVER w > 1800000000
        |                     THEN 1 ELSE 0 END AS nw
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |x AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |      FROM s),
        |p AS (SELECT event_type || '>' || lead(event_type, 1) OVER w2
        |             || '>' || lead(event_type, 2) OVER w2 AS path,
        |        CASE WHEN lead(session_idx, 1) OVER w2 = session_idx
        |              AND lead(session_idx, 2) OVER w2 = session_idx
        |             THEN 1 ELSE 0 END AS ok
        |      FROM x WINDOW w2 AS (PARTITION BY user_id ORDER BY tus, event_id))
        |SELECT path, count(*) AS n_occ FROM p
        |WHERE ok = 1 AND path IS NOT NULL
        |GROUP BY path ORDER BY n_occ DESC, path LIMIT 20""".stripMargin,

    // Session-anchored funnel replayed: the sessionize CTEs, then the
    // step-by-step min-time chain grouped by (user, session) — each step
    // strictly after the previous step's time and within 72 h of the
    // session's first 'view'.
    "events_funnel_by_session" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus, event_type
         |           FROM events),
         |s AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
         |                       OR tus - lag(tus) OVER w > 1800000000
         |                     THEN 1 ELSE 0 END AS nw
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
         |x AS (SELECT *, sum(nw) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         |      FROM s),
         |s0 AS (SELECT user_id, session_idx, min(tus) AS t0 FROM x
         |       WHERE event_type = 'view' GROUP BY user_id, session_idx),
         |s1 AS (SELECT x.user_id, x.session_idx, min(x.tus) AS t1
         |       FROM x JOIN s0 USING (user_id, session_idx)
         |       WHERE x.event_type = 'click' AND x.tus > t0
         |         AND x.tus <= t0 + 259200000000 GROUP BY x.user_id, x.session_idx),
         |s2 AS (SELECT x.user_id, x.session_idx, min(x.tus) AS t2
         |       FROM x JOIN s1 USING (user_id, session_idx)
         |       JOIN s0 USING (user_id, session_idx)
         |       WHERE x.event_type = 'purchase' AND x.tus > t1
         |         AND x.tus <= t0 + 259200000000 GROUP BY x.user_id, x.session_idx),
         |n AS (SELECT 0 AS step_idx, 'view' AS step,
         |        (SELECT count(*) FROM s0) AS n_sessions
         |      UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1)
         |      UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2))
         |SELECT step_idx, step, n_sessions,
         |  ${sparkRound("n_sessions::DOUBLE / (SELECT count(*) FROM s0)", 6)} AS conversion
         |FROM n ORDER BY step_idx""".stripMargin,

    "events_retention_facts" ->
      """WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |           FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id)
        |SELECT a.user_id, c.cohort_day, a.day - c.cohort_day AS day_offset
        |FROM a JOIN c USING (user_id)
        |ORDER BY user_id, day_offset""".stripMargin,

    // Cohort retention replayed: distinct (user, epoch-day) with integer
    // `//` day division (= Spark's `div` on the positive epoch), cohort =
    // min day, exact counts, Spark-rounded retained share.
    "events_new_users_daily" ->
      """WITH f AS (SELECT user_id, min(epoch_us(ts) // 86400000000) AS day
        |           FROM events GROUP BY user_id),
        |d AS (SELECT day, count(*) AS n_new_users FROM f GROUP BY day)
        |SELECT day, n_new_users,
        |  CAST(sum(n_new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin,

    "events_retention" ->
      s"""WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
         |           FROM events),
         |c AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY user_id),
         |z AS (SELECT cohort_day, count(*) AS cohort_n FROM c GROUP BY cohort_day),
         |r AS (SELECT c.cohort_day, a.day - c.cohort_day AS day_offset,
         |        count(DISTINCT a.user_id) AS n_active
         |      FROM a JOIN c USING (user_id) GROUP BY 1, 2)
         |SELECT r.cohort_day, r.day_offset, r.n_active, z.cohort_n,
         |  ${sparkRound("r.n_active::DOUBLE / z.cohort_n", 6)} AS retained
         |FROM r JOIN z USING (cohort_day)
         |ORDER BY cohort_day, day_offset""".stripMargin,

    "events_weekday_seasonality" ->
      s"""SELECT ((epoch_us(ts) // 86400000000 + 4) % 7 + 7) % 7 AS dow,
         |  (epoch_us(ts) // 3600000000) % 24 AS hour,
         |  count(*) AS n,
         |  ${sparkRound("avg(value)", 6)} AS avg_value
         |FROM events GROUP BY 1, 2 ORDER BY dow, hour""".stripMargin,

    "events_type_transitions" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type,
         |              epoch_us(ts) * 1000 AS ts_ns FROM events),
         |p AS (SELECT event_type AS from_type,
         |        lead(event_type) OVER (PARTITION BY user_id
         |          ORDER BY ts_ns, event_id) AS to_type
         |      FROM ev),
         |c AS (SELECT from_type, to_type, count(*) AS n FROM p
         |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS rtot FROM c GROUP BY 1)
         |SELECT from_type, to_type, n,
         |  ${sparkRound("CAST(n AS DOUBLE) / rtot", 6)} AS p
         |FROM c JOIN rt USING (from_type)
         |ORDER BY from_type, to_type""".stripMargin,

    "events_conversion_time" ->
      s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |a AS (SELECT user_id, min(ts_us) AS t0 FROM ev
         |      WHERE event_type = 'signup' GROUP BY user_id),
         |b AS (SELECT a.user_id, min(e.ts_us) - min(a.t0) AS gap_us
         |      FROM a JOIN ev e ON e.user_id = a.user_id
         |        AND e.event_type = 'purchase'
         |        AND e.ts_us > a.t0 AND e.ts_us <= a.t0 + 259200000000
         |      GROUP BY a.user_id)
         |SELECT count(*) AS n_converted,
         |  ${sparkRound("quantile_cont(gap_us, 0.5)", 4)} AS p50_us,
         |  ${sparkRound("quantile_cont(gap_us, 0.9)", 4)} AS p90_us,
         |  min(gap_us) AS min_us, max(gap_us) AS max_us
         |FROM b""".stripMargin,

    // Same banded edge set as pagerank's; triangles enumerated u<v<w from
    // the canonical (id1<id2) pairs — the degree-ordered orientation on
    // the Spark side finds the identical SET, just from each triangle's
    // lowest-DEGREE corner instead of its lowest id
    "graph_triangle_count" ->
      s"""$minhashPairsCtes,
         |e AS (SELECT id1 AS a, id2 AS b FROM pairs),
         |tri AS (SELECT e1.a AS u, e1.b AS v, e2.b AS w
         |        FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
         |        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         |ids AS (SELECT u AS id FROM tri
         |        UNION ALL SELECT v FROM tri
         |        UNION ALL SELECT w FROM tri)
         |SELECT id, count(*) AS n_tri FROM ids GROUP BY id ORDER BY id""".stripMargin,

    "ts_ewma_smooth" -> {
      // identical double literals and identical left-associated add order
      // as the Spark expression (see ewmaTapWeights)
      val num = ewmaTapWeights.zipWithIndex
        .map { case (wk, k) => s"coalesce(lag(value, $k) OVER w, 0.0) * $wk" }
        .mkString(" + ")
      val den = ewmaTapWeights.zipWithIndex
        .map { case (wk, k) =>
          s"CASE WHEN lag(value, $k) OVER w IS NOT NULL THEN $wk ELSE 0.0 END" }
        .mkString(" + ")
      s"""WITH ev AS (SELECT user_id, event_id, ts, value FROM events
         |            WHERE value IS NOT NULL),
         |sm AS (SELECT user_id,
         |    ($num) / ($den) AS ewma,
         |    row_number() OVER (PARTITION BY user_id
         |                       ORDER BY ts DESC, event_id DESC) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n_events
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, n_events, ${OracleSql.sparkRound("ewma", 6)} AS ewma_last
         |FROM sm WHERE rn = 1 ORDER BY user_id""".stripMargin
    },

    // same spine/daily CTEs as ts_resample_ffill, interpolation instead
    // of the forward fill; leading/trailing gaps stay NULL
    "ts_interpolate_linear" ->
      s"""${OracleSql.userDailySpineCtes},
         |f AS (SELECT user_id, day, close,
         |    last_value(close IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN close IS NOT NULL THEN day END IGNORE NULLS) OVER wp AS pd,
         |    first_value(close IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN close IS NOT NULL THEN day END IGNORE NULLS) OVER wn AS nd
         |  FROM j
         |  WINDOW wp AS (PARTITION BY user_id ORDER BY day
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |         wn AS (PARTITION BY user_id ORDER BY day
         |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, day,
         |  CASE WHEN close IS NOT NULL THEN close
         |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN ${sparkRound(
        "pv + (nv - pv) * (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))", 4)}
         |  END AS close_interp,
         |  close IS NOT NULL AS observed
         |FROM f ORDER BY user_id, day""".stripMargin,

    // exact-integer moment replay; the two divisions are the only float ops
    "events_trend_ols" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
         |            FROM events WHERE ts IS NOT NULL),
         |daily AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
         |          FROM ev GROUP BY event_type, day),
         |m AS (SELECT event_type,
         |        CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(day) AS BIGINT) AS sx,
         |        CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(day * y) AS BIGINT) AS sxy,
         |        CAST(sum(day * day) AS BIGINT) AS sxx
         |      FROM daily GROUP BY event_type),
         |s AS (SELECT event_type, n, sx, sy,
         |        CASE WHEN n * sxx - sx * sx <> 0
         |             THEN CAST(n * sxy - sx * sy AS DOUBLE)
         |                    / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope_raw
         |      FROM m)
         |SELECT event_type, n AS n_days,
         |  ${sparkRound("slope_raw", 6)} AS slope,
         |  ${sparkRound("(CAST(sy AS DOUBLE) - slope_raw * CAST(sx AS DOUBLE))" +
        " / CAST(n AS DOUBLE)", 6)} AS intercept
         |FROM s ORDER BY event_type""".stripMargin,

    "events_gap_stats" ->
      s"""WITH ev AS (SELECT event_id, user_id, event_type,
         |              epoch_us(ts) * 1000 AS ts_ns FROM events),
         |gaps AS (SELECT event_type,
         |    CAST(ts_ns - lag(ts_ns, 1) OVER (PARTITION BY user_id
         |      ORDER BY ts_ns, event_id) AS DOUBLE) / 1000000000.0 AS gap_s
         |  FROM ev),
         |gg AS (SELECT event_type, gap_s FROM gaps WHERE gap_s IS NOT NULL)
         |SELECT event_type, count(*) AS n_gaps,
         |  ${sparkRound("avg(gap_s)", 4)} AS mean_gap_s,
         |  ${sparkRound("quantile_cont(gap_s, 0.5)", 4)} AS p50_gap_s,
         |  ${sparkRound("quantile_cont(gap_s, 0.9)", 4)} AS p90_gap_s,
         |  CASE WHEN stddev_samp(gap_s) + avg(gap_s) > 0
         |       THEN ${sparkRound("(stddev_samp(gap_s) - avg(gap_s))" +
        " / (stddev_samp(gap_s) + avg(gap_s))", 4)}
         |  END AS burstiness
         |FROM gg GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_lifecycle_stages" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             (epoch_us(ts) // 86400000000) // 7 AS week FROM events),
        |st AS (SELECT user_id, week,
        |    min(week) OVER (PARTITION BY user_id) AS fw,
        |    lag(week, 1) OVER (PARTITION BY user_id ORDER BY week) AS pw,
        |    lead(week, 1) OVER (PARTITION BY user_id ORDER BY week) AS nw
        |  FROM a),
        |staged AS (SELECT *,
        |    CASE WHEN week = fw THEN 'new'
        |         WHEN pw = week - 1 THEN 'retained'
        |         ELSE 'resurrected' END AS stage
        |  FROM st),
        |stages AS (SELECT week,
        |    CAST(sum(CASE WHEN stage = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |    CAST(sum(CASE WHEN stage = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        |    CAST(sum(CASE WHEN stage = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        |  FROM staged GROUP BY week),
        |mx AS (SELECT max(week) AS mw FROM a),
        |churned AS (SELECT week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
        |  FROM staged, mx
        |  WHERE (nw IS NULL OR nw > week + 1) AND week + 1 <= mw
        |  GROUP BY week + 1),
        |spine AS (SELECT unnest(range(
        |    (SELECT min(week) FROM a), (SELECT max(week) FROM a) + 1)) AS week)
        |SELECT p.week, coalesce(n_new, 0) AS n_new,
        |  coalesce(n_retained, 0) AS n_retained,
        |  coalesce(n_resurrected, 0) AS n_resurrected,
        |  coalesce(n_churned, 0) AS n_churned
        |FROM spine p LEFT JOIN stages s ON p.week = s.week
        |LEFT JOIN churned c ON p.week = c.week
        |ORDER BY p.week""".stripMargin,

    "events_forecast_snaive" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
         |            FROM events),
         |daily AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
         |          FROM ev GROUP BY event_type, day),
         |bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1
         |           FROM ev GROUP BY event_type),
         |spine AS (SELECT event_type, unnest(range(d0, d1 + 1)) AS day FROM bounds),
         |filled AS (SELECT s.event_type, s.day, coalesce(d.y, 0) AS y
         |           FROM spine s LEFT JOIN daily d USING (event_type, day)),
         |scored AS (SELECT event_type, y,
         |    lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS yhat
         |  FROM filled)
         |SELECT event_type, count(*) AS n_eval,
         |  ${sparkRound(
        "avg(CASE WHEN y > 0 THEN CAST(abs(y - yhat) AS DOUBLE) / y END)", 4)} AS mape,
         |  ${sparkRound(
        "sqrt(avg(CAST((y - yhat) * (y - yhat) AS DOUBLE)))", 4)} AS rmse
         |FROM scored WHERE yhat IS NOT NULL
         |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_audience_overlap" ->
      s"""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
         |sizes AS (SELECT event_type, CAST(count(*) AS BIGINT) AS sz
         |          FROM ut GROUP BY event_type),
         |ov AS (SELECT l.event_type AS t1, r.event_type AS t2,
         |           CAST(count(*) AS BIGINT) AS n_both
         |         FROM ut l JOIN ut r ON l.user_id = r.user_id
         |         WHERE l.event_type < r.event_type
         |         GROUP BY 1, 2)
         |SELECT t1, t2, s1.sz AS n1, s2.sz AS n2, n_both,
         |  ${sparkRound(
        "CAST(n_both AS DOUBLE) / (s1.sz + s2.sz - n_both)", 6)} AS jaccard
         |FROM ov JOIN sizes s1 ON s1.event_type = t1
         |JOIN sizes s2 ON s2.event_type = t2
         |ORDER BY t1, t2""".stripMargin,

    // ACF replay: identical exact-LONG moments, one mean division, same
    // left-associated num/den algebra.
    "ts_acf_daily" ->
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         |                 CAST(count(*) AS BIGINT) AS y
         |               FROM orders GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(y * y) AS BIGINT) AS syy FROM daily),
         |p AS (SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         |        CAST(sum(a.y * b.y) AS BIGINT) AS sxy,
         |        CAST(sum(a.y) AS BIGINT) AS sa, CAST(sum(b.y) AS BIGINT) AS sb
         |      FROM (SELECT unnest(range(1, 8)) AS lag) l, daily a, daily b
         |      WHERE b.day = a.day + l.lag GROUP BY l.lag),
         |c AS (SELECT p.*,
         |        CAST(sy AS DOUBLE) / n AS ybar,
         |        CAST(syy AS DOUBLE) - CAST(n AS DOUBLE)
         |          * (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS den
         |      FROM p, g)
         |SELECT lag, n_pairs,
         |  CASE WHEN den > 0 THEN ${sparkRound(
           "(CAST(sxy AS DOUBLE) - ybar * CAST(sa + sb AS DOUBLE) + CAST(n_pairs AS DOUBLE) * ybar * ybar) / den",
           6)}
         |  END AS acf
         |FROM c ORDER BY lag""".stripMargin,

    // Seasonal-index replay: same cents-rounded daily revenue, same
    // unrounded per-dow average in the ratio.
    "ts_seasonality_dow" ->
      s"""WITH daily AS (SELECT epoch_us(o_orderdate) // 86400000000 AS day,
         |                 ${sparkRound("sum(o_totalprice)", 2)} AS rev
         |               FROM orders GROUP BY 1),
         |g AS (SELECT avg(rev) AS gavg FROM daily),
         |d2 AS (SELECT ((day % 7) + 7) % 7 AS dow,
         |         CAST(count(*) AS BIGINT) AS n_days, avg(rev) AS a
         |       FROM daily GROUP BY 1)
         |SELECT dow, n_days, ${sparkRound("a", 4)} AS avg_rev,
         |  ${sparkRound("a / gavg", 4)} AS seasonal_idx
         |FROM d2, g ORDER BY dow""".stripMargin,

    // CUSUM replay: exact LONG prefix sums, one mean division, peak flag
    // compared on the ROUNDED cusum so the equality is deterministic.
    "ts_cusum_shift" ->
      s"""WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
         |                 CAST(count(*) AS BIGINT) AS y
         |               FROM events GROUP BY 1),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sy
         |      FROM daily),
         |cu AS (SELECT day, y, ${sparkRound(
           """CAST(sum(y) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             - CAST(row_number() OVER (ORDER BY day) AS DOUBLE) * (CAST(sy AS DOUBLE) / n)""",
           4)} AS cusum
         |       FROM daily, g)
         |SELECT day, y, cusum,
         |  abs(cusum) = (SELECT max(abs(cusum)) FROM cu) AS is_peak
         |FROM cu ORDER BY day""".stripMargin,

    // CUPED replay: same integer-midpoint split, same pooled covar/var
    // moments, same adjusted-metric variance ratio.
    "events_cuped" ->
      s"""WITH rng AS (SELECT (CAST(epoch_ns(min(ts)) AS BIGINT)
         |                     + CAST(epoch_ns(max(ts)) AS BIGINT)) // 2 AS pv
         |             FROM events),
         |per AS (SELECT user_id,
         |    ${sparkRound(
           "sum(CASE WHEN epoch_ns(ts) < pv THEN coalesce(value, 0.0) ELSE 0.0 END)",
           2)} AS x,
         |    ${sparkRound(
           "sum(CASE WHEN epoch_ns(ts) >= pv THEN coalesce(value, 0.0) ELSE 0.0 END)",
           2)} AS y
         |  FROM events, rng WHERE event_type = 'purchase' GROUP BY user_id),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
         |        covar_pop(x, y) AS cxy, var_pop(x) AS vx, avg(x) AS mx
         |      FROM per),
         |th AS (SELECT n_users, mx,
         |         CASE WHEN vx > 0 THEN cxy / vx ELSE 0.0 END AS theta FROM m),
         |adj AS (SELECT per.y, per.y - th.theta * (per.x - th.mx) AS yadj,
         |          th.n_users, th.theta
         |        FROM per, th)
         |SELECT n_users, ${sparkRound("theta", 4)} AS theta,
         |  ${sparkRound("var_samp(y)", 2)} AS var_y,
         |  ${sparkRound("var_samp(yadj)", 2)} AS var_y_adj,
         |  ${sparkRound("var_samp(yadj) / var_samp(y)", 4)} AS var_ratio
         |FROM adj GROUP BY n_users, theta""".stripMargin,

    // Degree-histogram replay over the shared LSH pair CTEs.
    "graph_degree_histogram" ->
      s"""$minhashPairsCtes,
         |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
         |        UNION ALL SELECT id2, id1 FROM pairs),
         |deg AS (SELECT a, CAST(count(DISTINCT b) AS BIGINT) AS degree
         |        FROM sym GROUP BY a),
         |z AS (SELECT CAST(0 AS BIGINT) AS degree,
         |        CAST(count(*) AS BIGINT) AS n_nodes
         |      FROM documents WHERE doc_id NOT IN (SELECT a FROM deg)),
         |h AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
         |      FROM deg GROUP BY degree
         |      UNION ALL SELECT degree, n_nodes FROM z WHERE n_nodes > 0)
         |SELECT degree, n_nodes FROM h ORDER BY degree""".stripMargin,
  )
}
