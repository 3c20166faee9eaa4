package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event-stream analytics: sessionization, ordered funnels, cohort
  * retention. The batch complements of the streaming window queries
  * (`queries/Streams.scala`) — the shapes every clickstream/telemetry
  * pipeline runs over its event log before the data ever reaches training.
  *
  * All three operate on the raw NANOSECOND long timestamp (`ts_ns`), so
  * every comparison, gap, and bucket is exact integer arithmetic — no
  * float time, no engine-specific timestamp truncation — and any SQL
  * engine replays the decisions bit-for-bit.
  *
  * Scale notes (100 TB event log):
  *  - `sessionize` is ONE shuffle: both window functions (the lag and the
  *    running sum) share the same partitioning (user) and ordering
  *    (ts, id), so Catalyst plans a single exchange + sort and evaluates
  *    both in one `Window` operator pass.
  *  - `funnelSteps` filters the log to the step types FIRST (pushed to the
  *    scan), then ONE user-keyed aggregate folds each user's time-sorted
  *    step events through the step vector — one exchange total, no joins,
  *    and per-user state bounded by that user's step-event count.
  *  - `retention` reduces the log to distinct (user, day) pairs in its
  *    first aggregate — everything after operates on that much smaller
  *    frame.
  */
object EventAnalytics {

  /** Gap-based sessionization: a new session starts when the user's gap
    * since their previous event exceeds `gapNs`. Adds `session_idx`
    * (1-based per user, in time order). Ties in `tsCol` are broken by
    * `idCol` so the numbering is total-ordered and deterministic.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, gapNs: Long): DataFrame = {
    require(gapNs > 0, s"gapNs must be positive, got $gapNs")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull || col(tsCol) - prev > gapNs, 1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup over `sessionize` output: event count, exact
    * integer start/end/duration in `tsCol`'s unit, distinct event types.
    * Same user-keyed partitioning as the sessionize window, so the
    * aggregate reuses the exchange.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapNs: Long): DataFrame =
    sessionize(events, userCol, tsCol, idCol, gapNs)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("start_ts"),
        max(col(tsCol)).as("end_ts"),
        (max(col(tsCol)) - min(col(tsCol))).as("duration"),
        count_distinct(col(typeCol)).as("n_types"))

  /** Strict ordered funnel: for each user, the time of their FIRST
    * `steps(0)` event anchors the funnel; step k counts only if some
    * `steps(k)` event falls strictly after the user's step k-1 time and
    * within `windowNs` of the anchor. Returns one per-user row with each
    * step's entry time (`t0..t{n-1}`, null once the user drops out).
    *
    * ONE pass, ONE shuffle: the log is filtered to the step types (the
    * predicate pushes into the scan), then a single user-keyed aggregate
    * sorts each user's step events by time and folds them left-to-right
    * through the step vector with `functions.aggregate` — step k's slot
    * fills at the first event matching `steps(k)` that is strictly after
    * slot k-1 and inside the anchor window. The earlier join-per-step
    * formulation re-embedded the whole upstream plan ~2^(k-1) times for a
    * k-step funnel; this form's cost is one exchange plus a per-user sort
    * of that user's step events, at any k. Tie handling is identical to
    * the min()-per-step reading: a candidate at exactly the previous
    * step's time fails the strict `>` whichever side of the tie it sorts
    * on, so the within-tie sort order never changes the result.
    */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowNs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowNs > 0, s"windowNs must be positive, got $windowNs")
    val n = steps.length
    val tsType = events.select(col(tsCol)).schema.head.dataType
    // one pass to the step types only — this predicate pushes into the
    // scan. `m` is the per-step match vector (NOT a single index: a type
    // appearing twice in `steps` must be able to fill both slots).
    val stepEvents = events.filter(col(typeCol).isin(steps.map(lit): _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"),
          array(steps.map(s => col(typeCol) === s): _*).as("m")).as("ev"))
    // Fold one user's time-sorted events through the step-time vector.
    // All reads go against the PREVIOUS accumulator (transform builds a
    // new array), which is exactly the strict-order semantics: an event
    // can never satisfy a step whose predecessor it just filled itself.
    val merge = (acc: Column, e: Column) =>
      transform(acc, (t, i) => {
        val ts = e.getField("ts")
        val matches = element_at(e.getField("m"), i + lit(1))
        val anchor = element_at(acc, lit(1))
        val prev = element_at(acc, i) // element_at is 1-based: slot i-1
        when(t.isNotNull, t)
          .when(i === lit(0), when(matches, ts))
          .otherwise(when(matches && prev.isNotNull && ts > prev &&
            ts <= anchor + lit(windowNs), ts))
      })
    val init = array_repeat(lit(null).cast(tsType), n)
    stepEvents.groupBy(col(userCol))
      .agg(
        aggregate(sort_array(collect_list(col("ev"))), init, merge).as("tk"),
        // anchor population = users with ANY steps(0) event (even one
        // with a null ts), matching the min()-per-step formulation
        max(element_at(col("ev").getField("m"), 1)).as("has_anchor"))
      .filter(col("has_anchor"))
      .select(col(userCol) +:
        (0 until n).map(i => element_at(col("tk"), i + 1).as(s"t$i")): _*)
  }

  /** Funnel summary: users reaching each step, plus conversion relative to
    * the step-1 population (6-decimal double, Spark/DuckDB round-parity
    * left to the caller's rounding convention — counts here are exact).
    */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowNs: Long): DataFrame = {
    val perUser = funnelSteps(events, userCol, tsCol, typeCol, steps, windowNs)
    val counts = perUser.agg(
      count(lit(1)).as("n_step0"),
      steps.indices.tail.map(k => count(col(s"t$k")).as(s"n_step$k")): _*)
    val rows = steps.zipWithIndex.map { case (step, k) =>
      struct(lit(k).cast("int").as("step_idx"), lit(step).as("step"),
        col(s"n_step$k").as("n_users"))
    }
    counts.select(explode(array(rows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_users"))
  }

  /** Slowly-changing-dimension type-2 history from a change log: per key,
    * order changes by (ts, id), keep only rows where the tracked attribute
    * CHANGES (null-safe comparison — a null attribute is a value, not a
    * wildcard), and emit validity intervals
    * (key, attr, effective_from, effective_to, is_current) with
    * `effective_to` = the next version's start (null while current).
    *
    * This is the batch complement of the streaming latest-wins merge
    * (`pipeline/ChangePipeline.scala` O10/O11): the CDC shapes the
    * reference's ETL emits (`src/loader.rs` change sets) flattened into
    * the audit-history table a warehouse keeps. One exchange: the
    * change-detection lag, the version-boundary filter, and the
    * effective_to lead all run over the same key partitioning (the filter
    * preserves distribution, so the second Window reuses the exchange and
    * only re-sorts).
    */
  def scd2(changes: DataFrame, keyCol: String, tsCol: String, idCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val boundaries = changes
      .select(col(keyCol), col(tsCol), col(idCol), col(attrCol))
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .withColumn("is_first", row_number().over(w) === 1)
      .filter(col("is_first") || !(col(attrCol) <=> col("prev_attr")))
    boundaries
      .withColumn("effective_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("effective_from"), col("effective_to"),
        col("effective_to").isNull.as("is_current"),
        // the boundary row's id: an audit pointer back to the change that
        // opened the version, and the tie-break that keeps output order
        // total when two versions share one truncated timestamp
        col(idCol).as("version_id"))
  }

  /** Top-k length-`n` event-type paths within sessions: sessionize, then
    * per-event forward n-grams of event types that do NOT cross a session
    * boundary, counted corpus-wide. The n-gram window runs over the SAME
    * user partitioning as the sessionize windows (session containment is
    * enforced by comparing `lead(session_idx)`, not by re-partitioning on
    * (user, session)), so the whole operator is one exchange plus a
    * TakeOrdered top-k — no global sort, and the counted frame is bounded
    * by the event count at any corpus size.
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapNs: Long, n: Int = 3,
      k: Int = 20): DataFrame = {
    require(n >= 2, s"a path needs at least 2 steps, got $n")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val sessioned = sessionize(events, userCol, tsCol, idCol, gapNs)
    val steps = (0 until n).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
    val sameSession = (1 until n).map(i =>
      lead(col("session_idx"), i).over(w) === col("session_idx"))
      .reduce(_ && _)
    // `concat`, not `concat_ws`: concat_ws SKIPS null arguments, so a
    // 3-gram with a null middle type would silently collapse to "a>b";
    // concat null-propagates, the isNotNull filter drops it, and the SQL
    // replay's `||` (which also null-propagates + an IS NOT NULL guard)
    // agrees bit-for-bit.
    val pathExpr = concat(steps.flatMap(s => Seq(lit(">"), s)).tail: _*)
    sessioned
      .withColumn("path", when(sameSession, pathExpr))
      .filter(col("path").isNotNull)
      .groupBy(col("path")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("path"))
      .limit(k)
  }

  /** Day-offset cohort retention: cohort = the user's first active day
    * (exact `ts div 86400e9` epoch-day from the nanos long); for every
    * (cohort_day, day_offset) pair, how many of that cohort's users were
    * active. First reduces the log to distinct (user, day).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      ticksPerDay: Long = 86400L * 1000000000L): DataFrame = {
    // Integer FLOOR division, not `/` or bare `div`: Column./ on longs is
    // DOUBLE division (an ns timestamp ~1.7e18 exceeds double's
    // exact-integer range, so day boundaries could misround), and `div`
    // truncates toward zero, which diverges from the streaming twin's
    // Math.floorDiv for pre-1970 timestamps. `(ts - pmod(ts, t)) div t` is
    // exact floor division on longs — identical to `div` (and DuckDB's
    // `//`) for the positive epoch, and floorDiv-parity below it.
    val active = events
      .select(col(userCol), expr(
        s"($tsCol - pmod($tsCol, ${ticksPerDay}L)) div ${ticksPerDay}L")
        .as("day"))
      .distinct()
    val cohort = active.groupBy(col(userCol)).agg(min(col("day")).as("cohort_day"))
    val sizes = cohort.groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_n"))
    active.join(cohort, userCol)
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_active"))
      .join(sizes, "cohort_day")
  }

  /** Multi-touch attribution: for every conversion event, credit the
    * user's touch events inside the lookback window under the three
    * standard models at once — first-touch (1.0 to the earliest touch),
    * last-touch (1.0 to the latest touch at/before the conversion), and
    * linear (1/n to each of the n touches). Ties on the touch timestamp
    * break on the touch id, so credit assignment is a pure function of
    * the log.
    *
    * Shape: touches ⋈ conversions is a USER-keyed equi-join with the
    * window as a residual range predicate — one exchange on user, and the
    * per-conversion candidate set is bounded by that user's touch count
    * inside the window (per-user cardinality, not corpus size). The
    * min/max/count per conversion is one aggregate on the join output.
    * Returns per touch-type: conversions where it took first/last credit
    * and its summed linear credit. */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, touchTypes: Seq[String],
      conversionType: String, windowTicks: Long): DataFrame = {
    require(touchTypes.nonEmpty, "attribution needs at least one touch type")
    require(windowTicks > 0, s"windowTicks must be positive, got $windowTicks")
    val touches = events.filter(col(typeCol).isin(touchTypes.map(lit): _*))
      .select(col(userCol).as("u"), col(tsCol).as("t_tick"),
        col(idCol).as("t_id"), col(typeCol).as("touch_type"))
    val convs = events.filter(col(typeCol) === conversionType)
      .select(col(userCol).as("u"), col(tsCol).as("c_tick"), col(idCol).as("c_id"))
    val joined = convs.join(touches, Seq("u"))
      .filter(col("t_tick") <= col("c_tick") &&
        col("t_tick") > col("c_tick") - windowTicks)
    val w = Window.partitionBy(col("c_id"))
    val ranked = joined
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("first_key",
        min(struct(col("t_tick"), col("t_id"))).over(w))
      .withColumn("last_key",
        max(struct(col("t_tick"), col("t_id"))).over(w))
    ranked.groupBy(col("touch_type"))
      .agg(
        count_if(struct(col("t_tick"), col("t_id")) === col("first_key"))
          .as("first_touch_convs"),
        count_if(struct(col("t_tick"), col("t_id")) === col("last_key"))
          .as("last_touch_convs"),
        round(sum(lit(1.0) / col("n_touches")), 6).as("linear_credit"),
        count(lit(1)).as("n_touch_rows"))
  }

  /** RFM segmentation — the classic recency/frequency/monetary user scoring
    * a growth/analytics pipeline derives from the event log. Per user:
    * recency = whole days from their LAST event to the dataset's own "now"
    * (the max event time — self-contained, replayable), frequency = event
    * count, monetary = sum(value) rounded to cents. Each metric scores
    * 1..4 by quartile: the three interpolated quartile boundaries are ONE
    * global 1-row aggregate broadcast back onto the per-user frame (no
    * ntile — a global rank window would single-partition the user set at
    * scale), and every boundary is rounded to 6 dp before the strict-`>`
    * comparisons so a 1-ulp interpolation difference between engines can
    * never flip a score. Recency scores INVERTED (recent = 4).
    *
    * Returns one row per (r_score, f_score, m_score) cell: user count and
    * cents-rounded total monetary. Shape: one user-keyed aggregate, two
    * 1-row broadcasts (now, quartiles), one cell-keyed aggregate.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, ticksPerDay: Long = 86400L * 1000000000L): DataFrame = {
    val users = events.groupBy(col(userCol))
      .agg(max(col(tsCol)).as("last_tick"),
        count(lit(1)).as("freq"),
        round(sum(coalesce(col(valueCol), lit(0.0))), 2).as("mon"))
    val now = events.agg(max(col(tsCol)).as("now_tick"))
    val base = users.crossJoin(broadcast(now))
      .withColumn("rec_days",
        expr(s"(now_tick - last_tick) div ${ticksPerDay}L"))
    val qAggs = Seq("rec_days", "freq", "mon").flatMap { c =>
      Seq(0.25, 0.5, 0.75).map(p =>
        round(expr(s"percentile($c, $p)"), 6).as(s"${c}_q${(p * 100).toInt}"))
    }
    val qs = base.agg(qAggs.head, qAggs.tail: _*)
    def score(c: Column, q1: Column, q2: Column, q3: Column): Column =
      lit(1) + when(c > q1, 1).otherwise(0) + when(c > q2, 1).otherwise(0) +
        when(c > q3, 1).otherwise(0)
    base.crossJoin(broadcast(qs))
      .select(
        (lit(5) - score(col("rec_days").cast("double"),
          col("rec_days_q25"), col("rec_days_q50"), col("rec_days_q75")))
          .as("r_score"),
        score(col("freq").cast("double"),
          col("freq_q25"), col("freq_q50"), col("freq_q75")).as("f_score"),
        score(col("mon"),
          col("mon_q25"), col("mon_q50"), col("mon_q75")).as("m_score"),
        col("mon"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"), round(sum(col("mon")), 2).as("total_mon"))
  }
}
