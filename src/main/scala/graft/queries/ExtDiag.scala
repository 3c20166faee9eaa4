package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}
import ExtShared._

/** Diagnostics/profiling lanes plus sketch aggregates (HLL, weighted median).
  *
  * Split from the former monolithic Extensions.scala (registry unchanged:
  * [[Extensions.queries]] / [[Extensions.oracles]] concatenate the domain
  * objects). Oracle policy and citations live on [[Extensions]].
  */
private[graft] object ExtDiag {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Key-skew diagnostics over the event log's user key: the measurement
    // that decides whether a join needs salting (share + straggler
    // multiplier per heavy key). One count aggregate, 1-row broadcast
    // globals computed FROM the counts (exchange-reused, not a second
    // scan), TakeOrdered top-20.
    "diag_key_skew" -> ((s, d) => {
      graft.ext.SkewJoin.keySkew(Tables.events(s, d), "user_id", k = 20)
    }),

    // ANALYZE-style correlation diagnostics: pairwise sample correlations
    // over lineitem's numeric columns in ONE aggregate pass. Correlation
    // is scale-normalized to [-1,1], so the round-6 fence sits far above
    // float reduction-order noise (covariances are NOT exposed raw for
    // exactly that reason).
    "diag_correlation" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(corr(col("l_quantity"), col("l_discount")), 6).as("corr_qty_disc"),
        round(corr(col("l_extendedprice"), col("l_discount")), 6).as("corr_price_disc"))
    }),

    // Corpus-mixture diagnostics: per-language share + Shannon entropy
    // terms (nats) - the balance report a mixture-rebalancing loop reads.
    "diag_mixture_entropy" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tot = docs.agg(count(lit(1)).as("total"))
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .crossJoin(broadcast(tot))
        .withColumn("share", col("n_docs").cast("double") / col("total"))
        .select(col("lang"), col("n_docs"), round(col("share"), 6).as("share"),
          round(-col("share") * log(col("share")), 6).as("entropy_term"))
        .orderBy(col("lang"))
    }),

    // Distribution-drift report (PSI): events split into early/late halves
    // at the midpoint timestamp, `value` binned into 10 fixed equi-width
    // buckets over the GLOBAL range, per-bin Laplace-smoothed shares and
    // the PSI term (p−q)·ln(p/q) — the drift gate a data-freshness monitor
    // sums. One corpus scan + one 1-row globals broadcast + one ≤10-group
    // aggregate; the 0..9 bin spine keeps empty bins present so the report
    // shape is fixed.
    "diag_drift_psi" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull && col("ts_ns").isNotNull)
      val g = ev.agg(
        min(col("ts_ns")).as("mn_ts"), max(col("ts_ns")).as("mx_ts"),
        min(col("value")).as("mn_v"), max(col("value")).as("mx_v"))
      val binned = ev.crossJoin(broadcast(g))
        // integer midpoint: ns epochs overflow double-exact range, so the
        // pivot is mn + (mx−mn) div 2 in LONG arithmetic on both engines
        .withColumn("__pivot", expr("mn_ts + (mx_ts - mn_ts) div 2"))
        .withColumn("__w", (col("mx_v") - col("mn_v")) / 10.0)
        .withColumn("bin",
          when(col("__w") === 0.0, lit(0L)).otherwise(
            least(lit(9L),
              floor((col("value") - col("mn_v")) / col("__w")).cast("long"))))
        .withColumn("__late", (col("ts_ns") >= col("__pivot")).cast("long"))
      val counts = binned.groupBy(col("bin")).agg(
        sum(lit(1L) - col("__late")).as("n_early"),
        sum(col("__late")).as("n_late"))
      val spine = s.range(0, 10).toDF("bin")
      val filled = spine.join(counts, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("n_early"), lit(0L)).as("n_early"),
          coalesce(col("n_late"), lit(0L)).as("n_late"))
      val totals = filled.agg(sum(col("n_early")).as("__te"),
        sum(col("n_late")).as("__tl"))
      filled.crossJoin(broadcast(totals))
        .withColumn("__p",
          (col("n_early") + 1).cast("double") / (col("__te") + 10))
        .withColumn("__q",
          (col("n_late") + 1).cast("double") / (col("__tl") + 10))
        .select(col("bin"), col("n_early"), col("n_late"),
          round((col("__p") - col("__q")) * log(col("__p") / col("__q")), 6)
            .as("psi_term"))
        .orderBy(col("bin"))
    }),

    // Functional-dependency check — the schema-inference diagnostic: does
    // LHS determine RHS (groups with >1 distinct RHS are violations)?
    // Run over four candidate FDs (two that hold, two that don't on this
    // schema); each is one aggregate pair, outputs a 1-row verdict.
    "diag_fd_check" -> ((s, d) => {
      // r17: the lhs-keyed distinct aggregate's partial phase runs inside
      // the scan task — serialized on single-row-group inputs; the
      // scale-adaptive guard spreads the two-column rows first
      def fd(name: String, df: org.apache.spark.sql.DataFrame,
          lhs: String, rhs: String): org.apache.spark.sql.DataFrame =
        Dedup.withMinParallelism(df.select(col(lhs), col(rhs)), lhs)
          .groupBy(col(lhs)).agg(count_distinct(col(rhs)).as("__nd"))
          .agg(count(lit(1)).as("n_lhs_groups"),
            sum(when(col("__nd") > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(name).as("fd"), col("n_lhs_groups"), col("n_violating"))
      fd("lineitem.l_orderkey->l_suppkey", Tables.lineitem(s, d),
          "l_orderkey", "l_suppkey")
        .unionAll(fd("lineitem.l_partkey->l_suppkey", Tables.lineitem(s, d),
          "l_partkey", "l_suppkey"))
        .unionAll(fd("nation.n_nationkey->n_regionkey", Tables.nation(s, d),
          "n_nationkey", "n_regionkey"))
        .unionAll(fd("orders.o_orderkey->o_custkey", Tables.orders(s, d),
          "o_orderkey", "o_custkey"))
        .orderBy(col("fd"))
    }),

    // Data-quality constraint suite — the validation gate before a table
    // is trained on or published: PK uniqueness, FK integrity, range and
    // not-null/non-empty predicates, each reduced to ONE
    // (constraint, n_rows, n_violations) row. Union of broadcast-sized
    // frames; one pass per involved table at any corpus size.
    "diag_constraints" -> ((s, d) => {
      val P = graft.ext.Profile
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      P.uniqueCheck("orders.pk_unique", orders, "o_orderkey")
        .unionAll(P.fkCheck("lineitem.fk_orders", li, "l_orderkey",
          orders, "o_orderkey"))
        .unionAll(P.predicateCheck("orders.totalprice_nonneg", orders,
          col("o_totalprice") < 0 || col("o_totalprice").isNull))
        .unionAll(P.predicateCheck("lineitem.discount_range", li,
          col("l_discount") < 0 || col("l_discount") > 1 || col("l_discount").isNull))
        .unionAll(P.predicateCheck("orders.orderdate_notnull", orders,
          col("o_orderdate").isNull))
        .unionAll(P.predicateCheck("documents.text_nonempty",
          Tables.documents(s, d), length(col("text")) === 0 || col("text").isNull))
        .orderBy(col("check_name"))
    }),

    // One-pass multi-column profile (ANALYZE-shaped): per column of
    // lineitem, rows / nulls / exact NDV / portable-HLL NDV from a single
    // scan — melt + one two-level aggregate bounded by k·2^p groups.
    "diag_profile" -> ((s, d) => {
      graft.ext.Profile.profile(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"))
        .orderBy(col("col_name"))
    }),

    // The 100 TB ANALYZE mode: no exact-NDV leg, so the per-register
    // partial carries three counters instead of a distinct value set —
    // same k·2^p-bounded shuffle rows, far lighter map side. Benched
    // beside diag_profile every round; the 10x delta lives in PLANS.md.
    "diag_profile_fast" -> ((s, d) => {
      graft.ext.Profile.profile(Tables.lineitem(s, d),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"),
        exact = false)
        .orderBy(col("col_name"))
    }),

    // 2-D equi-width histogram (quantity × price, 5×5 over the global
    // ranges) — the joint-distribution heatmap beside the 1-D histograms:
    // one 1-row globals broadcast + one ≤25-group aggregate.
    "diag_histogram_2d" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_quantity").cast("double").as("q"),
          col("l_extendedprice").cast("double").as("p"))
      val g = li.agg(min(col("q")).as("mnq"), max(col("q")).as("mxq"),
        min(col("p")).as("mnp"), max(col("p")).as("mxp"))
      // zero-width guard: a constant column would make (x-mn)/width NaN,
      // which ANSI floor-cast throws on (same guard as diag_drift_psi)
      def bin(x: org.apache.spark.sql.Column, mn: org.apache.spark.sql.Column,
          mx: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        when((mx - mn) / 5.0 === 0.0, lit(0L))
          .otherwise(least(lit(4L),
            floor((x - mn) / ((mx - mn) / 5.0)).cast("long")))
      li.crossJoin(broadcast(g))
        .withColumn("bin_q", bin(col("q"), col("mnq"), col("mxq")))
        .withColumn("bin_p", bin(col("p"), col("mnp"), col("mxp")))
        .groupBy(col("bin_q"), col("bin_p"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bin_q"), col("bin_p"))
    }),

    // Equi-width histogram of lineitem's price column — the distribution
    // statistic beside diag_profile's NDVs: two passes, no global sort
    // (the equi-depth variant needs a total order — an ANALYZE-sample
    // tool, not a full-table operator).
    "diag_histogram" -> ((s, d) => {
      graft.ext.Profile.equiWidthHistogram(
        Tables.lineitem(s, d), "l_extendedprice", buckets = 10)
        .orderBy(col("bucket"))
    }),

    // Equi-DEPTH histogram (quantile buckets) of the order totals — the
    // other half of the ANALYZE pair beside diag_histogram's equi-width:
    // ntile over the (value, id) total order, count + [lo, hi] per tile.
    // Exact full-table form here (modest input); at 100 TB the operator's
    // sampleRate fence bounds the sorted rows first.
    "diag_histogram_depth" -> ((s, d) => {
      graft.ext.Profile.equiDepthHistogram(
        Tables.orders(s, d), "o_totalprice", "o_orderkey", buckets = 12)
        .orderBy(col("bucket"))
    }),

    // Join-cardinality estimation from MERGED HLL sketches — the planning
    // diagnostic: |keys(orders) ∩ keys(customer)| estimated by
    // inclusion-exclusion over three register-frame estimates (the union
    // sketch is a register-wise max — no rescan of either input), with the
    // exact distinct-key overlap as the witness column.
    "diag_join_cardinality" -> ((s, d) => {
      val oKeys = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val cKeys = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val ra = Hll.registers(oKeys, "k")
      val rb = Hll.registers(cKeys, "k")
      val estA = Hll.estimate(ra).select(col("est_hll").as("ndv_orders"))
      val estB = Hll.estimate(rb).select(col("est_hll").as("ndv_customer"))
      val estU = Hll.estimate(Hll.merge(ra, rb)).select(col("est_hll").as("ndv_union"))
      val exact = oKeys.distinct().join(cKeys.distinct(), "k")
        .agg(count(lit(1)).as("n_exact_common"))
      estA.crossJoin(broadcast(estB)).crossJoin(broadcast(estU))
        .crossJoin(broadcast(exact))
        .select(col("ndv_orders"), col("ndv_customer"), col("ndv_union"),
          round(col("ndv_orders") + col("ndv_customer") - col("ndv_union"), 4)
            .as("est_common"),
          col("n_exact_common"))
    }),

    // Benford first-digit screen over order totals: observed share of
    // each leading significant digit beside the Benford expectation
    // log10(1+1/d) — the cheap anomaly/fabrication screen auditors run.
    // Digit extraction is string-based (first char of the absolute value)
    // so no float log is in the grouping key.
    "diag_benford" -> ((s, d) => {
      val firstDigit = substring(
        regexp_replace(abs(col("o_totalprice")).cast("string"), "[^1-9]", ""),
        1, 1)
      val counts = Tables.orders(s, d)
        .filter(col("o_totalprice").isNotNull && col("o_totalprice") =!= 0)
        .groupBy(firstDigit.as("digit")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("__t"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(col("n").cast("double") / col("__t"), 6).as("observed"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
            .as("expected"))
        .orderBy(col("digit"))
    }),

    // ---- sketch-based ops (FNV-1a basis; oracle-replayed exactly) ----------
    // Portable HLL over the corpus vocabulary: the FNV-1a-based
    // approx-distinct whose registers, scaled harmonic sum, and estimate the
    // oracle replays exactly (retires the engine-internal
    // approx_count_distinct's rows-only status — that query stays as the
    // built-in plan-quality witness). n_exact rides along in the same pass
    // (per-register distincts sum to the global: a value hashes to ONE
    // register), so the row also exact-checks the estimate's error.
    "agg_approx_distinct_portable" -> ((s, d) => {
      Hll.approxDistinct(
        Tables.documents(s, d).select(explode(TA.tokens(col("text"))).as("tok")),
        "tok", p = 8)
    }),

    // Materialized-sketch rollup — the way NDV is actually tracked at
    // 100 TB: one ≤2^p-row register sketch per DAY (one pass over the
    // log), then the corpus NDV from a register-wise-max merge of the
    // daily sketches, never a rescan. est_merged must equal est_direct
    // (the one-pass estimate over the whole log) EXACTLY — the merge
    // property, here hash-checked by the gate every round, not just
    // spec-pinned.
    "agg_hll_daily_merge" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("day", expr("(ts_ns div 1000) div 86400000000"))
      val dayRegs = Hll.registersBy(
        ev.select(col("day"), col("user_id")), "user_id", "day", p = 8)
      val merged = Hll.estimate(Hll.mergeGrouped(dayRegs), p = 8)
        .withColumnRenamed("est_hll", "est_merged")
      val direct = Hll.estimate(
        Hll.registers(ev.select(col("user_id")), "user_id", p = 8), p = 8)
        .withColumnRenamed("est_hll", "est_direct")
      val days = ev.agg(count_distinct(col("day")).as("n_days"))
      days.crossJoin(merged).crossJoin(direct)
    }),

    // Sketch-algebra INTERSECTION: |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B)
    // by inclusion–exclusion over the SAME materialized register frames
    // (union = register-wise max — no rescan of either set). The audience
    // overlap question (users who click AND purchase) answered from
    // sketches alone, with the exact witness beside it. All the frames
    // crossJoined are 1-row globals.
    "agg_hll_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
      // r17 (guide §2.4): the register frame feeds THREE estimate consumers
      // (A, B, union). ReuseExchange does NOT dedup them — predicate
      // pushdown specializes each branch's scan (click/purchase/union
      // filters pushed through the grouping key), so the lazy form ran 3
      // events scans (plan-verified). Materialize once: it is sketch-sized
      // (≤ 2 groups · 2^p rows) and replaces corpus rescans at any scale.
      val regsBy = Hll.registersBy(
        ev.select(col("event_type"), col("user_id")), "user_id", "event_type",
        p = 8).localCheckpoint()
      Dedup.rotateCheckpoints("agg_hll_intersect", regsBy)
      val ests = Hll.estimateBy(regsBy, "event_type", p = 8)
      val estA = ests.filter(col("event_type") === "click")
        .select(col("est_hll").as("est_a"))
      val estB = ests.filter(col("event_type") === "purchase")
        .select(col("est_hll").as("est_b"))
      val estU = Hll.estimate(Hll.mergeGrouped(regsBy), p = 8)
        .select(col("est_hll").as("est_union"))
      // r17: the exact witness in ONE events pass — per-user click/purchase
      // flags then a global both-flags count, replacing the two distinct()
      // subtrees joined on user_id (2 scans + a join shuffle → 1 scan + 1
      // user-keyed aggregate). Same value by definition: a user counts iff
      // they have ≥1 click AND ≥1 purchase event.
      val exact = ev.groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "click", 1).otherwise(0)).as("__c"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("__p"))
        .filter(col("__c") === 1 && col("__p") === 1)
        .agg(count(lit(1)).as("nd_exact_intersect"))
      estA.crossJoin(estB).crossJoin(estU).crossJoin(exact)
        .withColumn("est_intersect",
          round(col("est_a") + col("est_b") - col("est_union"), 4))
    }),

    // GROUPED approximate distinct — NDV per group (users per event
    // type), the ubiquitous per-tenant/per-day cardinality shape: one
    // registersBy pass (≤ groups·2^p shuffle rows whatever the input),
    // per-group estimate beside the exact witness and its relative error.
    "agg_hll_by_group" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // r17 (guide §2.4): estimate AND exact witness from ONE events scan —
      // the register aggregate carries a per-(group, idx) exact distinct
      // count, and a value hashes to exactly one register, so sum(nd) per
      // group IS the group NDV (the approxDistinct-witness trick, grouped).
      // Previously the exact side was a second full scan + count_distinct.
      // The est/exact consumers below are NOT exchange-deduped (column
      // pruning specializes each branch's copy of the register aggregate —
      // plan-verified), so materialize the sketch-sized frame once.
      val regs = Hll.registersByWithExact(
        ev.select(col("event_type"), col("user_id")), "user_id", "event_type",
        p = 8).localCheckpoint()
      Dedup.rotateCheckpoints("agg_hll_by_group", regs)
      val est = Hll.estimateBy(regs, "event_type", p = 8)
      val exact = regs.groupBy(col("event_type"))
        .agg(sum(col("nd")).as("nd_exact"))
      est.join(exact, "event_type")
        .select(col("event_type"), col("est_hll"), col("nd_exact"),
          round((col("est_hll") - col("nd_exact")) /
            col("nd_exact").cast("double"), 4).as("rel_err"))
        .orderBy(col("event_type"))
    }),

    // Two-sample Kolmogorov-Smirnov drift screen per event_type: the
    // value distribution of the LATE half of the time range against the
    // EARLY half (same integer-midpoint pivot as diag_drift_psi, which
    // bins globally — this one is per-type and binless). Counts are
    // grouped per distinct value FIRST, so ties advance both ECDFs
    // atomically before the sup-difference is taken; two key-partitioned
    // shuffles ((type,value) agg, then type-keyed cumulative windows),
    // no global sort.
    "diag_ks_drift" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull && col("ts_ns").isNotNull)
      val g = ev.agg(min(col("ts_ns")).as("mn_ts"), max(col("ts_ns")).as("mx_ts"))
      val flagged = ev.crossJoin(broadcast(g))
        .withColumn("__late",
          (col("ts_ns") >= expr("mn_ts + (mx_ts - mn_ts) div 2")).cast("long"))
      val perValue = flagged.groupBy(col("event_type"), col("value"))
        .agg(sum(lit(1L) - col("__late")).as("c_early"),
          sum(col("__late")).as("c_late"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("value"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
      val cdf = perValue
        .withColumn("n_early", sum(col("c_early")).over(wAll))
        .withColumn("n_late", sum(col("c_late")).over(wAll))
        .withColumn("__d", abs(
          sum(col("c_early")).over(w) / col("n_early") -
            sum(col("c_late")).over(w) / col("n_late")))
      cdf.groupBy(col("event_type"))
        .agg(max(col("n_early")).as("n_early"), max(col("n_late")).as("n_late"),
          round(max(when(col("n_early") > 0 && col("n_late") > 0, col("__d"))), 6)
            .as("ks_stat"))
        .transform(sortedOnce(_, col("event_type")))
    }),

    // Welch's unequal-variance t on per-user purchase totals between the
    // SAME two FNV arms as events_ab_lift — the means-metric readout
    // beside that lane's proportion z. Squares are written as va*va (never
    // pow(): libm exponentials are the one operator class whose last ulp
    // is not pinned cross-engine); the df is Welch–Satterthwaite.
    "diag_ttest_welch" -> ((s, d) => {
      val vals = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(round(sum(coalesce(col("value"), lit(0.0))), 2).as("v"))
        .withColumn("arm", pmod(graft.functions.Fnv.fnv1a64(
          concat(lit("ab:"), col("user_id").cast("string"))), lit(2L)))
      val g = vals.groupBy(col("arm")).agg(
        count(lit(1)).as("n"), avg(col("v")).as("m"), var_samp(col("v")).as("s2"))
      val a = g.filter(col("arm") === 0)
        .select(col("n").as("n_a"), col("m").as("m_a"), col("s2").as("s2_a"))
      val b = g.filter(col("arm") === 1)
        .select(col("n").as("n_b"), col("m").as("m_b"), col("s2").as("s2_b"))
      val va = col("s2_a") / col("n_a")
      val vb = col("s2_b") / col("n_b")
      val ok = col("n_a") > 1 && col("n_b") > 1 && (va + vb) > 0
      a.crossJoin(b)
        .withColumn("t_stat",
          when(ok, round((col("m_a") - col("m_b")) / sqrt(va + vb), 4)))
        .withColumn("df", when(ok, round(
          ((va + vb) * (va + vb)) /
            (va * va / (col("n_a") - 1) + vb * vb / (col("n_b") - 1)), 2)))
        .select(col("n_a"), round(col("m_a"), 4).as("mean_a"),
          col("n_b"), round(col("m_b"), 4).as("mean_b"),
          col("t_stat"), col("df"))
    }),

    // Bitwise scalar surface (masking, shifts, xor-folds, popcount) —
    // the id-partitioning / fingerprint-probing primitives.
    "scalar_bitwise_funcs" -> ((s, d) => {
      Tables.events(s, d).filter(col("user_id") < 50)
        .select(col("event_id"),
          expr("event_id & 255").as("b_and"),
          expr("event_id | 4096").as("b_or"),
          expr("event_id ^ shiftright(event_id, 3)").as("b_xor"),
          expr("shiftleft(event_id & 1023, 2)").as("b_shl"),
          expr("~event_id").as("b_not"),
          bit_count(col("event_id")).cast("long").as("n_bits"))
        .orderBy(col("event_id"))
    }),

    // 2-D skyline (Pareto frontier) over purchase (value, time): a point
    // survives iff no other purchase is >= in BOTH dimensions and > in
    // one. Two-phase distributed shape: a partition-local strict-dominance
    // prune (skyline is decomposable: skyline(A∪B) =
    // skyline(skyline(A)∪skyline(B))), then the exact pass over the
    // pruned survivors at distinct-value grain — the only global window
    // runs over the local frontiers, not the fact table.
    "sort_skyline_pareto" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      // survivors feed the distinct-value pass AND the join-back —
      // checkpoint the pruned (local-frontier-sized) set so the fact
      // table is scanned ONCE. Derivations shared with BoundedWindowSpec,
      // which pins that the phase-2 window input stays frontier-sized.
      val surv = skylineSurvivors(skylinePoints(s, d)).localCheckpoint()
      Dedup.rotateCheckpoints("sort_skyline_pareto", surv)
      val g = surv.groupBy(col("value")).agg(max(col("tus")).as("mxt"))
      val wg = Window.orderBy(col("value").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val fr = g.withColumn("gm", max(col("mxt")).over(wg))
        .filter(col("gm").isNull || col("gm") < col("mxt"))
      surv.join(fr.select(col("value"), col("mxt")), Seq("value"))
        .filter(col("tus") === col("mxt"))
        .groupBy(col("value"), col("tus")).agg(count(lit(1)).as("n_dups"))
        .orderBy(col("value").desc, col("tus"))
    }),

    // Exact weighted median (lower) of price weighted by quantity per
    // return flag — an aggregate Spark has no built-in for. Group to
    // distinct values FIRST (so the prefix sum runs over a deterministic
    // value order, never row order), then one keyed window pass; the
    // weights are integer-valued doubles, so every sum is exact and the
    // tw/2 crossing is bit-deterministic.
    "agg_weighted_median" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byv = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"),
          col("l_extendedprice").as("v"))
        .agg(sum(col("l_quantity")).as("w"))
      val wo = Window.partitionBy(col("flag")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wt = Window.partitionBy(col("flag"))
      byv.withColumn("cw", sum(col("w")).over(wo))
        .withColumn("tw", sum(col("w")).over(wt))
        .filter(col("cw") >= col("tw") / 2)
        .groupBy(col("flag"), col("tw"))
        .agg(min(col("v")).as("wmedian"))
        .select(col("flag"), col("tw").as("total_weight"), col("wmedian"))
        .orderBy(col("flag"))
    }),

    // The 100 TB swap for agg_weighted_median, shipped as benched code
    // (VERDICT r11 #4): the per-flag window above runs over ALL distinct
    // prices — fine here, row-scale at near-unique values. This sibling
    // is the two-phase bucketed prefix sum: phase 1 ranks B=1024
    // value-range buckets (window frame ≤ B rows per flag) to find the
    // single bucket containing the tw/2 crossing; phase 2 runs the exact
    // distinct-value prefix sum INSIDE that one bucket only, offset by
    // the prior buckets' cumulative weight. Same integer-exact weights,
    // same lower-median crossing rule → IDENTICAL output to the exact
    // lane, so the oracle is the same replay — while the largest sort
    // frame shrinks from |distinct values| to max(B, values-per-bucket).
    "agg_weighted_median_bucketed" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wo = Window.partitionBy(col("flag")).orderBy(col("b"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wt = Window.partitionBy(col("flag"))
      // the bucketed frame feeds phase 1 (bucket ranks) AND phase 2
      // (in-bucket values): checkpoint so lineitem scans once. Derivation
      // shared with BoundedWindowSpec (bucket-occupancy pin).
      val bkC = wmedianBucketed(s, d).localCheckpoint()
      Dedup.rotateCheckpoints("agg_weighted_median_bucketed", bkC)
      val cross = bkC.groupBy(col("flag"), col("b")).agg(sum(col("w")).as("bw"))
        .withColumn("cb", sum(col("bw")).over(wo))
        .withColumn("tw", sum(col("bw")).over(wt))
        .filter(col("cb") >= col("tw") / 2)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("flag")).orderBy(col("b"))))
        .filter(col("rn") === 1)
        .select(col("flag"), col("b").as("cbk"),
          (col("cb") - col("bw")).as("prior"), col("tw"))
      val wo2 = Window.partitionBy(col("flag")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      bkC.join(broadcast(cross), Seq("flag")).filter(col("b") === col("cbk"))
        .withColumn("cw", col("prior") + sum(col("w")).over(wo2))
        .filter(col("cw") >= col("tw") / 2)
        .groupBy(col("flag"), col("tw")).agg(min(col("v")).as("wmedian"))
        .select(col("flag"), col("tw").as("total_weight"), col("wmedian"))
        .orderBy(col("flag"))
    }),

    // Exact Gini coefficient of per-user event counts — the
    // concentration-inequality readout beside events_power_users_pareto.
    // Never sorts users globally: ties are grouped to DISTINCT activity
    // levels first, and the rank sum of a tie run of m users after
    // c_prev predecessors is m*c_prev + m(m+1)/2 — so the prefix-sum
    // window runs over distinct levels (≪ users) and every moment is an
    // exact LONG; only the two final divisions are floating-point.
    "diag_gini_activity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lvl = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
        .groupBy(col("x")).agg(count(lit(1)).as("m"))
      val wo = Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val t = lvl
        .withColumn("cprev", coalesce(sum(col("m")).over(wo), lit(0L)))
        .withColumn("rsum", col("m") * col("cprev")
          + expr("m * (m + 1) div 2")) // div: `/` on longs is double division
        .agg(sum(col("m")).as("n"), sum(col("x") * col("m")).as("sx"),
          sum(col("x") * col("rsum")).as("t"))
      t.select(col("n").as("n_users"), col("sx").as("total_events"),
        round(lit(2.0) * col("t").cast("double")
          / (col("n").cast("double") * col("sx").cast("double"))
          - (col("n") + 1).cast("double") / col("n").cast("double"), 6)
          .as("gini"))
    }),
  )

  def oracles: Map[String, String] = Map(

    // Portable HLL replayed end-to-end: fmix64(FNV-1a) token hash (unsigned
    // HUGEINT form; the finalizer as chained xor/split-multiply CTE stages),
    // register index = top 8 bits, rank = 57 - bin-length of the low
    // 56 bits (bin() string length, NEVER log2 — double conversion can round
    // a 56-bit value across a power-of-two boundary), per-register max-rank,
    // the harmonic sum as exact scaled integers, and the estimate as one
    // IEEE division by the shared numerator literal. The small-range ln()
    // branch is absorbed by Spark-parity rounding.
    "agg_approx_distinct_portable" -> {
      val num = Hll.numerator(8) // α·m²·2^57, same literal the Spark side divides
      s"""WITH t AS (SELECT unnest($toks) AS tok FROM documents),
         |h0 AS (SELECT tok, ${fnvSql("tok")} AS h FROM t),
         |${fmixStages("h0", "tok")},
         |rk AS (SELECT tok, hu // (1::HUGEINT << 56) AS idx,
         |         CASE WHEN hu % (1::HUGEINT << 56) = 0 THEN 57
         |              ELSE 57 - length(bin(hu % (1::HUGEINT << 56))) END AS rank
         |       FROM hh),
         |regs AS (SELECT idx, max(rank) AS r, count(DISTINCT tok) AS nd
         |         FROM rk GROUP BY idx),
         |a AS (SELECT count(*) AS m_used,
         |        sum(1::HUGEINT << (57 - r)) AS s_used,
         |        CAST(sum(nd) AS BIGINT) AS n_exact FROM regs),
         |f AS (SELECT CAST(256 AS INT) AS m,
         |        CAST(256 - m_used AS BIGINT) AS v_empty,
         |        s_used + (256 - m_used)::HUGEINT * (1::HUGEINT << 57) AS z_scaled,
         |        n_exact FROM a),
         |e AS (SELECT m, v_empty, CAST(z_scaled AS VARCHAR) AS z_scaled,
         |        ${sparkRound(
               s"""CASE WHEN $num / CAST(z_scaled AS DOUBLE) <= 640.0 AND v_empty > 0
                  |             THEN 256.0 * ln(256.0 / v_empty)
                  |             ELSE $num / CAST(z_scaled AS DOUBLE) END""".stripMargin, 4)} AS est_hll,
         |        n_exact FROM f)
         |SELECT m, v_empty, z_scaled, est_hll, n_exact,
         |  ${sparkRound("(est_hll - n_exact) / CAST(n_exact AS DOUBLE)", 4)} AS rel_err
         |FROM e""".stripMargin
    },

    // daily-merge replay: ONE direct register chain over user_id — by the
    // merge property (register-wise max commutes with union, pinned in
    // HllSpec) the merged estimate must equal it exactly, so the oracle
    // emits the same value for both columns and the gate's hash compare
    // enforces the property on real data every round
    "agg_hll_daily_merge" -> {
      val num = Hll.numerator(8)
      s"""WITH t AS (SELECT CAST(user_id AS VARCHAR) AS u FROM events
         |           WHERE user_id IS NOT NULL),
         |h0 AS (SELECT u, ${fnvSql("u")} AS h FROM t),
         |${fmixStages("h0", "u")},
         |rk AS (SELECT u, hu // (1::HUGEINT << 56) AS idx,
         |         CASE WHEN hu % (1::HUGEINT << 56) = 0 THEN 57
         |              ELSE 57 - length(bin(hu % (1::HUGEINT << 56))) END AS rank
         |       FROM hh),
         |regs AS (SELECT idx, max(rank) AS r FROM rk GROUP BY idx),
         |a AS (SELECT count(*) AS m_used,
         |        sum(1::HUGEINT << (57 - r)) AS s_used FROM regs),
         |f AS (SELECT CAST(256 - m_used AS BIGINT) AS v_empty,
         |        s_used + (256 - m_used)::HUGEINT * (1::HUGEINT << 57) AS z_scaled
         |      FROM a),
         |e AS (SELECT ${sparkRound(
               s"""CASE WHEN $num / CAST(z_scaled AS DOUBLE) <= 640.0 AND v_empty > 0
                  |             THEN 256.0 * ln(256.0 / v_empty)
                  |             ELSE $num / CAST(z_scaled AS DOUBLE) END""".stripMargin, 4)} AS est
         |      FROM f),
         |nd AS (SELECT count(DISTINCT epoch_us(ts) // 86400000000) AS n_days
         |       FROM events)
         |SELECT CAST(n_days AS BIGINT) AS n_days, est AS est_merged,
         |  est AS est_direct
         |FROM e, nd""".stripMargin
    },

    // intersection replay: the grouped register chain for the two sets,
    // per-set and merged (register-wise max) estimates, inclusion–
    // exclusion in double, exact intersection witness
    "agg_hll_intersect" -> {
      val num = Hll.numerator(8)
      def est(src: String) =
        s"""CASE WHEN $num / CAST($src.z_scaled AS DOUBLE) <= 640.0 AND $src.v_empty > 0
           |             THEN 256.0 * ln(256.0 / $src.v_empty)
           |             ELSE $num / CAST($src.z_scaled AS DOUBLE) END""".stripMargin
      s"""WITH t AS (SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events
         |           WHERE user_id IS NOT NULL
         |             AND event_type IN ('click', 'purchase')),
         |h0 AS (SELECT event_type, u, ${fnvSql("u")} AS h FROM t),
         |${fmixStages("h0", "event_type, u")},
         |rk AS (SELECT event_type, hu // (1::HUGEINT << 56) AS idx,
         |         CASE WHEN hu % (1::HUGEINT << 56) = 0 THEN 57
         |              ELSE 57 - length(bin(hu % (1::HUGEINT << 56))) END AS rank
         |       FROM hh),
         |regsBy AS (SELECT event_type, idx, max(rank) AS r FROM rk GROUP BY 1, 2),
         |regsU AS (SELECT idx, max(r) AS r FROM regsBy GROUP BY idx),
         |fBy AS (SELECT event_type, CAST(256 - count(*) AS BIGINT) AS v_empty,
         |          sum(1::HUGEINT << (57 - r))
         |            + (256 - count(*))::HUGEINT * (1::HUGEINT << 57) AS z_scaled
         |        FROM regsBy GROUP BY 1),
         |fU AS (SELECT CAST(256 - count(*) AS BIGINT) AS v_empty,
         |         sum(1::HUGEINT << (57 - r))
         |           + (256 - count(*))::HUGEINT * (1::HUGEINT << 57) AS z_scaled
         |       FROM regsU),
         |ea AS (SELECT ${sparkRound(est("fBy"), 4)} AS est_a FROM fBy
         |       WHERE event_type = 'click'),
         |eb AS (SELECT ${sparkRound(est("fBy"), 4)} AS est_b FROM fBy
         |       WHERE event_type = 'purchase'),
         |eu AS (SELECT ${sparkRound(est("fU"), 4)} AS est_union FROM fU),
         |x AS (SELECT count(*) AS nd_exact_intersect FROM
         |        (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
         |        NATURAL JOIN
         |        (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'))
         |SELECT est_a, est_b, est_union,
         |  CAST(nd_exact_intersect AS BIGINT) AS nd_exact_intersect,
         |  ${sparkRound("est_a + est_b - est_union", 4)} AS est_intersect
         |FROM ea, eb, eu, x""".stripMargin
    },

    // grouped-NDV replay: the register chain with event_type carried
    // through every stage, per-group estimate + exact witness
    "agg_hll_by_group" -> {
      val num = Hll.numerator(8)
      val est =
        s"""CASE WHEN $num / CAST(z_scaled AS DOUBLE) <= 640.0 AND v_empty > 0
           |             THEN 256.0 * ln(256.0 / v_empty)
           |             ELSE $num / CAST(z_scaled AS DOUBLE) END""".stripMargin
      s"""WITH t AS (SELECT event_type, CAST(user_id AS VARCHAR) AS u FROM events
         |           WHERE user_id IS NOT NULL),
         |h0 AS (SELECT event_type, u, ${fnvSql("u")} AS h FROM t),
         |${fmixStages("h0", "event_type, u")},
         |rk AS (SELECT event_type, hu // (1::HUGEINT << 56) AS idx,
         |         CASE WHEN hu % (1::HUGEINT << 56) = 0 THEN 57
         |              ELSE 57 - length(bin(hu % (1::HUGEINT << 56))) END AS rank
         |       FROM hh),
         |regs AS (SELECT event_type, idx, max(rank) AS r FROM rk GROUP BY 1, 2),
         |a AS (SELECT event_type, count(*) AS m_used,
         |        sum(1::HUGEINT << (57 - r)) AS s_used FROM regs GROUP BY 1),
         |f AS (SELECT event_type, CAST(256 - m_used AS BIGINT) AS v_empty,
         |        s_used + (256 - m_used)::HUGEINT * (1::HUGEINT << 57) AS z_scaled
         |      FROM a),
         |e AS (SELECT event_type, ${sparkRound(est, 4)} AS est_hll FROM f),
         |x AS (SELECT event_type, count(DISTINCT user_id) AS nd_exact FROM events
         |      WHERE user_id IS NOT NULL GROUP BY 1)
         |SELECT e.event_type, est_hll, CAST(nd_exact AS BIGINT) AS nd_exact,
         |  ${sparkRound("(est_hll - nd_exact) / CAST(nd_exact AS DOUBLE)", 4)} AS rel_err
         |FROM e JOIN x USING (event_type) ORDER BY event_type""".stripMargin
    },

    // Histogram replayed: same IEEE bucket arithmetic ((v-lo)/((hi-lo)/10)
    // floored and clamped), same null exclusion.
    "diag_histogram_2d" ->
      """WITH li AS (SELECT CAST(l_quantity AS DOUBLE) AS q,
        |              CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem),
        |g AS (SELECT min(q) AS mnq, max(q) AS mxq,
        |             min(p) AS mnp, max(p) AS mxp FROM li)
        |SELECT CAST(CASE WHEN (mxq - mnq) / 5.0 = 0.0 THEN 0
        |         ELSE least(4, floor((q - mnq) / ((mxq - mnq) / 5.0))) END AS BIGINT) AS bin_q,
        |  CAST(CASE WHEN (mxp - mnp) / 5.0 = 0.0 THEN 0
        |         ELSE least(4, floor((p - mnp) / ((mxp - mnp) / 5.0))) END AS BIGINT) AS bin_p,
        |  count(*) AS n
        |FROM li, g GROUP BY 1, 2 ORDER BY bin_q, bin_p""".stripMargin,

    "diag_histogram" ->
      """WITH g AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |           FROM lineitem)
        |SELECT CAST(CASE WHEN hi = lo THEN 0
        |         ELSE least(9, floor((l_extendedprice - lo) / ((hi - lo) / 10)))
        |       END AS INT) AS bucket,
        |  count(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM lineitem, g WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    // Equi-depth replayed: the standard ntile remainder rule over the
    // same (value, id) total order is engine-identical
    "diag_histogram_depth" ->
      """WITH t AS (SELECT o_totalprice AS v, o_orderkey AS id FROM orders
        |           WHERE o_totalprice IS NOT NULL),
        |b AS (SELECT v, CAST(ntile(12) OVER (ORDER BY v, id) AS INT) AS bucket FROM t)
        |SELECT bucket, count(*) AS n, min(v) AS lo, max(v) AS hi
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,

    // Profile replayed: melt via UNION ALL, the same fmix64(FNV-1a)
    // register chain keyed by (c, v) — null values null-propagate through
    // the hash into a null register excluded from the estimate — then the
    // grouped two-level rollup and per-row estimate branch.
    // every check replayed as the same plain aggregates; FK via NOT IN
    // with explicit NULL handling to match left-anti semantics
    "diag_constraints" ->
      """SELECT * FROM (
        |SELECT 'documents.text_nonempty' AS check_name,
        |  (SELECT count(*) FROM documents) AS n_rows,
        |  (SELECT count(*) FROM documents WHERE length(text) = 0 OR text IS NULL) AS n_violations
        |UNION ALL
        |SELECT 'lineitem.discount_range', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_discount < 0 OR l_discount > 1 OR l_discount IS NULL)
        |UNION ALL
        |SELECT 'lineitem.fk_orders', (SELECT count(*) FROM lineitem),
        |  (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL
        |     OR l_orderkey NOT IN (SELECT o_orderkey FROM orders
        |                           WHERE o_orderkey IS NOT NULL))
        |UNION ALL
        |SELECT 'orders.orderdate_notnull', (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
        |UNION ALL
        |SELECT 'orders.pk_unique', (SELECT count(*) FROM orders),
        |  (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |UNION ALL
        |SELECT 'orders.totalprice_nonneg', (SELECT count(*) FROM orders),
        |  (SELECT count(*) FROM orders WHERE o_totalprice < 0 OR o_totalprice IS NULL)
        |) ORDER BY check_name""".stripMargin,

    "diag_profile" -> profileOracleSql(exact = true),

    // scale mode: same chain, the exact-NDV leg replaced by NULL
    "diag_profile_fast" -> profileOracleSql(exact = false),

    // Join-cardinality replayed: both sides' fmix64(FNV-1a) register
    // frames, the union as a register-wise max over the concatenation,
    // three estimate chains sharing the same rounding, inclusion-exclusion
    // from the ROUNDED components, and the exact witness.
    "diag_join_cardinality" -> {
      val num = Hll.numerator(8)
      def side(pre: String, keyExpr: String, from: String): String =
        s"""${pre}h0 AS (SELECT ${fnvSql(keyExpr)} AS h FROM $from),
           |${pre}x1 AS (SELECT xor(h, h // (1::HUGEINT << 33)) AS h FROM ${pre}h0),
           |${pre}x2 AS (SELECT ${mulMod64Sql("h", 0xff51afd7ed558ccdL)} AS h FROM ${pre}x1),
           |${pre}x3 AS (SELECT xor(h, h // (1::HUGEINT << 29)) AS h FROM ${pre}x2),
           |${pre}x4 AS (SELECT ${mulMod64Sql("h", 0xc4ceb9fe1a85ec53L)} AS h FROM ${pre}x3),
           |${pre}hh AS (SELECT xor(h, h // (1::HUGEINT << 32)) AS hu FROM ${pre}x4),
           |${pre}regs AS (SELECT hu // (1::HUGEINT << 56) AS idx,
           |    max(CASE WHEN hu % (1::HUGEINT << 56) = 0 THEN 57
           |             ELSE 57 - length(bin(hu % (1::HUGEINT << 56))) END) AS r
           |  FROM ${pre}hh GROUP BY 1)""".stripMargin
      def est(pre: String, regsRef: String): String =
        s"""${pre}a AS (SELECT count(*) AS m_used,
           |    sum(1::HUGEINT << (57 - r)) AS s_used FROM $regsRef),
           |${pre}f AS (SELECT CAST(256 - m_used AS BIGINT) AS v_empty,
           |    s_used + (256 - m_used)::HUGEINT * (1::HUGEINT << 57) AS z_scaled
           |  FROM ${pre}a),
           |${pre}e AS (SELECT ${sparkRound(
                s"""CASE WHEN $num / CAST(z_scaled AS DOUBLE) <= 640.0 AND v_empty > 0
                   |         THEN 256.0 * ln(256.0 / v_empty)
                   |         ELSE $num / CAST(z_scaled AS DOUBLE) END""".stripMargin, 4)} AS est
           |  FROM ${pre}f)""".stripMargin
      s"""WITH ${side("o", "CAST(o_custkey AS VARCHAR)", "orders")},
         |${side("c", "CAST(c_custkey AS VARCHAR)", "customer")},
         |uregs AS (SELECT idx, max(r) AS r FROM
         |  (SELECT * FROM oregs UNION ALL SELECT * FROM cregs) GROUP BY idx),
         |${est("eo", "oregs")},
         |${est("ec", "cregs")},
         |${est("eu", "uregs")},
         |x AS (SELECT count(*) AS n_exact_common FROM
         |  (SELECT DISTINCT o_custkey AS k FROM orders) a JOIN
         |  (SELECT DISTINCT c_custkey AS k FROM customer) b USING (k))
         |SELECT eoe.est AS ndv_orders, ece.est AS ndv_customer,
         |  eue.est AS ndv_union,
         |  ${sparkRound("eoe.est + ece.est - eue.est", 4)} AS est_common,
         |  n_exact_common
         |FROM eoe, ece, eue, x""".stripMargin
    },

    // Skew diagnostics replayed: per-key counts, 1-row globals, share and
    // straggler multiplier with Spark-parity rounding, top-20.
    "diag_key_skew" ->
      s"""WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id),
         |g AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
         |        count(*) AS n_keys FROM c)
         |SELECT user_id, cnt, n_keys,
         |  ${sparkRound("cnt::DOUBLE / n_rows", 6)} AS share,
         |  ${sparkRound("cnt::DOUBLE * n_keys / n_rows", 4)} AS skew
         |FROM c, g
         |ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin,

    "diag_correlation" ->
      s"""SELECT count(*) AS n_rows,
         |  ${sparkRound("corr(l_quantity, l_extendedprice)", 6)} AS corr_qty_price,
         |  ${sparkRound("corr(l_quantity, l_discount)", 6)} AS corr_qty_disc,
         |  ${sparkRound("corr(l_extendedprice, l_discount)", 6)} AS corr_price_disc
         |FROM lineitem""".stripMargin,

    "diag_mixture_entropy" ->
      s"""WITH t AS (SELECT count(*) AS total FROM documents),
         |g AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
         |SELECT lang, n_docs,
         |  ${sparkRound("CAST(n_docs AS DOUBLE) / total", 6)} AS share,
         |  ${sparkRound("-(CAST(n_docs AS DOUBLE) / total) * ln(CAST(n_docs AS DOUBLE) / total)", 6)} AS entropy_term
         |FROM g, t ORDER BY lang""".stripMargin,

    "diag_fd_check" ->
      """WITH f1 AS (SELECT 'lineitem.l_orderkey->l_suppkey' AS fd,
        |    count(*) AS n_lhs_groups,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
        |  FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nd
        |        FROM lineitem GROUP BY 1)),
        |f2 AS (SELECT 'lineitem.l_partkey->l_suppkey' AS fd,
        |    count(*) AS n_lhs_groups,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
        |  FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nd
        |        FROM lineitem GROUP BY 1)),
        |f3 AS (SELECT 'nation.n_nationkey->n_regionkey' AS fd,
        |    count(*) AS n_lhs_groups,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
        |  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nd
        |        FROM nation GROUP BY 1)),
        |f4 AS (SELECT 'orders.o_orderkey->o_custkey' AS fd,
        |    count(*) AS n_lhs_groups,
        |    CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating
        |  FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS nd
        |        FROM orders GROUP BY 1))
        |SELECT * FROM f1 UNION ALL SELECT * FROM f2
        |UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4
        |ORDER BY fd""".stripMargin,

    "diag_drift_psi" ->
      s"""WITH ev AS (
         |  SELECT value, epoch_us(ts) * 1000 AS ts_ns FROM events
         |  WHERE value IS NOT NULL AND ts IS NOT NULL),
         |g AS (SELECT min(ts_ns) AS mn_ts, max(ts_ns) AS mx_ts,
         |             min(value) AS mn_v, max(value) AS mx_v FROM ev),
         |binned AS (
         |  SELECT CASE WHEN (mx_v - mn_v) / 10.0 = 0.0 THEN CAST(0 AS BIGINT)
         |              ELSE least(CAST(9 AS BIGINT),
         |                CAST(floor((value - mn_v) / ((mx_v - mn_v) / 10.0)) AS BIGINT)) END AS bin,
         |         CASE WHEN ts_ns >= mn_ts + (mx_ts - mn_ts) // 2
         |              THEN 1 ELSE 0 END AS late
         |  FROM ev, g),
         |counts AS (SELECT bin, CAST(sum(1 - late) AS BIGINT) AS n_early,
         |                  CAST(sum(late) AS BIGINT) AS n_late
         |           FROM binned GROUP BY bin),
         |spine AS (SELECT CAST(range AS BIGINT) AS bin FROM range(10)),
         |filled AS (SELECT s.bin, coalesce(n_early, 0) AS n_early,
         |                  coalesce(n_late, 0) AS n_late
         |           FROM spine s LEFT JOIN counts c ON c.bin = s.bin),
         |t AS (SELECT CAST(sum(n_early) AS BIGINT) AS te,
         |             CAST(sum(n_late) AS BIGINT) AS tl FROM filled)
         |SELECT bin, n_early, n_late,
         |  ${sparkRound(
              "(CAST(n_early + 1 AS DOUBLE) / (te + 10) - CAST(n_late + 1 AS DOUBLE) / (tl + 10))" +
              " * ln((CAST(n_early + 1 AS DOUBLE) / (te + 10)) / (CAST(n_late + 1 AS DOUBLE) / (tl + 10)))",
              6)} AS psi_term
         |FROM filled, t ORDER BY bin""".stripMargin,

    "diag_benford" ->
      s"""WITH c AS (
         |  SELECT substr(regexp_replace(CAST(abs(o_totalprice) AS VARCHAR),
         |           '[^1-9]', '', 'g'), 1, 1) AS digit,
         |         count(*) AS n
         |  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice <> 0
         |  GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tt FROM c)
         |SELECT digit, n,
         |  ${sparkRound("CAST(n AS DOUBLE) / tt", 6)} AS observed,
         |  ${sparkRound("log10(1.0 + 1.0 / CAST(digit AS DOUBLE))", 6)} AS expected
         |FROM c, t ORDER BY digit""".stripMargin,

    "diag_ks_drift" ->
      s"""WITH ev AS (
        |  SELECT event_type, value, epoch_us(ts) * 1000 AS ts_ns FROM events
        |  WHERE value IS NOT NULL AND ts IS NOT NULL),
        |g AS (SELECT min(ts_ns) AS mn_ts, max(ts_ns) AS mx_ts FROM ev),
        |flagged AS (SELECT event_type, value,
        |    CASE WHEN ts_ns >= mn_ts + (mx_ts - mn_ts) // 2 THEN 1 ELSE 0 END AS late
        |  FROM ev, g),
        |pv AS (SELECT event_type, value,
        |    CAST(sum(1 - late) AS BIGINT) AS c_early,
        |    CAST(sum(late) AS BIGINT) AS c_late
        |  FROM flagged GROUP BY event_type, value),
        |cdf AS (SELECT event_type,
        |    sum(c_early) OVER (PARTITION BY event_type) AS n_early,
        |    sum(c_late) OVER (PARTITION BY event_type) AS n_late,
        |    abs(CAST(sum(c_early) OVER w AS DOUBLE)
        |          / sum(c_early) OVER (PARTITION BY event_type)
        |        - CAST(sum(c_late) OVER w AS DOUBLE)
        |          / sum(c_late) OVER (PARTITION BY event_type)) AS d
        |  FROM pv
        |  WINDOW w AS (PARTITION BY event_type ORDER BY value
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_type,
        |  CAST(max(n_early) AS BIGINT) AS n_early,
        |  CAST(max(n_late) AS BIGINT) AS n_late,
        |  ${sparkRound("max(CASE WHEN n_early > 0 AND n_late > 0 THEN d END)", 6)} AS ks_stat
        |FROM cdf GROUP BY event_type ORDER BY event_type""".stripMargin,

    // same per-user totals + FNV arm fence as events_ab_lift; Welch's t
    "diag_ttest_welch" ->
      s"""WITH vals AS (SELECT user_id,
         |    ${sparkRound("sum(coalesce(value, 0.0))", 2)} AS v
         |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |arms AS (SELECT
         |    ((${signed64(fnvSql("'ab:' || CAST(user_id AS VARCHAR)"))} % 2) + 2) % 2 AS arm,
         |    v
         |  FROM vals),
         |g AS (SELECT arm, count(*) AS n, avg(v) AS m, var_samp(v) AS s2
         |      FROM arms GROUP BY arm),
         |a AS (SELECT CAST(n AS BIGINT) AS n_a, m AS m_a, s2 AS s2_a FROM g WHERE arm = 0),
         |b AS (SELECT CAST(n AS BIGINT) AS n_b, m AS m_b, s2 AS s2_b FROM g WHERE arm = 1),
         |j AS (SELECT *, s2_a / n_a AS va, s2_b / n_b AS vb,
         |        n_a > 1 AND n_b > 1 AND (s2_a / n_a + s2_b / n_b) > 0 AS ok
         |      FROM a, b)
         |SELECT n_a, ${sparkRound("m_a", 4)} AS mean_a,
         |  n_b, ${sparkRound("m_b", 4)} AS mean_b,
         |  CASE WHEN ok THEN ${sparkRound("(m_a - m_b) / sqrt(va + vb)", 4)} END AS t_stat,
         |  CASE WHEN ok THEN ${sparkRound(
           "((va + vb) * (va + vb)) / (va * va / (n_a - 1) + vb * vb / (n_b - 1))", 2)}
         |  END AS df
         |FROM j""".stripMargin,

    "scalar_bitwise_funcs" ->
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 4096 AS b_or,
        |  xor(event_id, event_id >> 3) AS b_xor,
        |  (event_id & 1023) << 2 AS b_shl,
        |  ~event_id AS b_not,
        |  CAST(bit_count(event_id) AS BIGINT) AS n_bits
        |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin,

    // Skyline replay: distinct-value grain, running max over strictly
    // greater values, frontier = (no greater-value point at >= time) AND
    // group-max time; duplicates counted, equal points co-survive.
    "sort_skyline_pareto" ->
      """WITH p AS (SELECT value, epoch_us(ts) AS tus FROM events
        |           WHERE event_type = 'purchase' AND value IS NOT NULL),
        |g AS (SELECT value, max(tus) AS mxt FROM p GROUP BY value),
        |r AS (SELECT value, mxt, max(mxt) OVER (ORDER BY value DESC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS gm FROM g),
        |f AS (SELECT value, mxt FROM r WHERE gm IS NULL OR gm < mxt)
        |SELECT p.value, p.tus, CAST(count(*) AS BIGINT) AS n_dups
        |FROM p JOIN f ON p.value = f.value AND p.tus = f.mxt
        |GROUP BY p.value, p.tus ORDER BY p.value DESC, p.tus""".stripMargin,

    // Weighted-median replay: same distinct-value prefix sums (exact —
    // integer-valued weights), same lower-median crossing rule. The
    // bucketed sibling is exact by construction (the two-phase bucket
    // split only reorders which partial sums are taken, every sum stays
    // integer-exact), so BOTH lanes replay against this one SQL.
    "agg_weighted_median" -> weightedMedianOracle,
    "agg_weighted_median_bucketed" -> weightedMedianOracle,

    // Gini replay: identical tie-grouped exact-LONG rank sums, two final
    // divisions.
    "diag_gini_activity" ->
      s"""WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS x
         |           FROM events GROUP BY user_id),
         |lvl AS (SELECT x, CAST(count(*) AS BIGINT) AS m FROM u GROUP BY x),
         |r AS (SELECT x, m,
         |        coalesce(CAST(sum(m) OVER (ORDER BY x
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
         |          0) AS cprev
         |      FROM lvl),
         |t AS (SELECT CAST(sum(m) AS BIGINT) AS n,
         |        CAST(sum(x * m) AS BIGINT) AS sx,
         |        CAST(sum(x * (m * cprev + m * (m + 1) // 2)) AS BIGINT) AS t
         |      FROM r)
         |SELECT n AS n_users, sx AS total_events,
         |  ${sparkRound(
           "2.0 * CAST(t AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE)",
           6)} AS gini
         |FROM t""".stripMargin,
  )
}
