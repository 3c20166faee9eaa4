package graft.ext

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Catalog stats fed from the profile lane actually change plans: the
  * broadcast decision follows fed sizeInBytes in both directions, and
  * rowCount/NDV flow into optimizedPlan.stats under CBO. */
class CboStatsSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def recreate(name: String, n: Int, dim: Boolean = false): Unit = {
    import spark.implicits._
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val df = (0 until n).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
    (if (dim) df.select(col("id"), col("name")) else df)
      .write.saveAsTable(name)
  }

  /** The STATIC physical plan — the choice catalog stats drive. (AQE can
    * later re-plan from runtime sizes; that corrects bad stats, it doesn't
    * read the catalog.) */
  private def joinPlan(dim: String, facts: String) =
    spark.table(facts).join(spark.table(dim), "id")
      .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan

  test("fed sizeInBytes flips the join strategy in both directions") {
    recreate("cbo_dim", 50, dim = true)
    recreate("cbo_facts", 5000)
    // physically tiny tables -> broadcast by default
    val before = joinPlan("cbo_dim", "cbo_facts")
    assert(collectWithSubqueries(before) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"tiny dim should broadcast before any stats feed:\n$before")
    // feed stats claiming BOTH sides are huge -> no broadcast candidate
    // left, the planner must fall back to the shuffle join
    CboStats.feed(spark, "cbo_dim", rows = 500000000L,
      sizeInBytes = Some(20L * 1024 * 1024 * 1024))
    CboStats.feed(spark, "cbo_facts", rows = 900000000L,
      sizeInBytes = Some(40L * 1024 * 1024 * 1024))
    val big = joinPlan("cbo_dim", "cbo_facts")
    assert(collectWithSubqueries(big) { case j: SortMergeJoinExec => j }.nonEmpty &&
      collectWithSubqueries(big) { case j: BroadcastHashJoinExec => j }.isEmpty,
      s"20/40 GB catalog stats must force the shuffle join:\n$big")
    // feed the true (tiny) stats back -> broadcast returns
    CboStats.feed(spark, "cbo_dim", rows = 50L)
    CboStats.feed(spark, "cbo_facts", rows = 5000L)
    val small = joinPlan("cbo_dim", "cbo_facts")
    assert(collectWithSubqueries(small) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"true stats must restore the broadcast:\n$small")
  }

  test("profile-fed rowCount and NDV land in the catalog and in optimizedPlan.stats under CBO") {
    recreate("cbo_prof", 800)
    val (rows, ndv, nulls) =
      CboStats.feedFromProfile(spark, "cbo_prof", Seq("id", "grp"))
    assert(rows === 800L)
    assert(nulls === Map("id" -> 0L, "grp" -> 0L))
    // HLL estimates: id ~800 distinct (within sketch error), grp exactly-ish 7
    assert(math.abs(ndv("id") - 800L) <= 80L, s"ndv(id)=${ndv("id")}")
    assert(ndv("grp") >= 6L && ndv("grp") <= 8L, s"ndv(grp)=${ndv("grp")}")
    val catStats = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("cbo_prof")).stats.get
    assert(catStats.rowCount === Some(BigInt(800)))
    assert(catStats.colStats("grp").distinctCount === Some(BigInt(ndv("grp"))))
    val prev = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val plan = spark.table("cbo_prof").queryExecution.optimizedPlan
      assert(plan.stats.rowCount === Some(BigInt(800)),
        s"CBO must see the fed rowCount, stats=${plan.stats}")
    } finally spark.conf.set("spark.sql.cbo.enabled", prev)
  }

  test("real inventory lane: profile-fed TPC-H stats shape the q9 plan; the answer is unchanged") {
    // VERDICT r10 #6: the strategy-flip tests above use synthetic tables;
    // here the feed runs over the ACTUAL TPC-H fixtures and the pin is the
    // real tpch_q9_product_profit join shape. At any SF the correct shape
    // is: lineitem (the fact, largest fed sizeInBytes) only ever streams —
    // it must never be a broadcast build side — while nation and the
    // filtered part side broadcast.
    val d = "/root/testdata/sf0.001"
    val profiled = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_orderdate"),
      "part" -> Seq("p_partkey", "p_name"),
      "supplier" -> Seq("s_suppkey", "s_nationkey"),
      "nation" -> Seq("n_nationkey", "n_name"))
    profiled.foreach { case (t, cols) =>
      val name = s"cbo_tpch_$t"
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      graft.Tables.load(spark, d, t).write.saveAsTable(name)
      // the diag_profile shape (HLL leg), published to the catalog
      CboStats.feedFromProfile(spark, name, cols)
    }
    // fed rowCounts must match the fixtures exactly (count is exact in the
    // profile; only NDV is sketched)
    val catRows = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("cbo_tpch_lineitem")).stats.get.rowCount
    assert(catRows === Some(BigInt(graft.Tables.load(spark, d, "lineitem").count())))

    def t(n: String) = spark.table(s"cbo_tpch_$n")
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def q9 = t("lineitem")
      .join(t("part").filter(col("p_name").like("%red%")),
        col("l_partkey") === col("p_partkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("nation"), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(rev - col("p_retailprice") * lit(0.6) * col("l_quantity")), 2)
        .as("profit"))
      .orderBy(col("nation"), col("o_year").desc)

    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevReorder = spark.conf.get("spark.sql.cbo.joinReorder.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // CBO consumed the fed stats: every leaf relation of the optimized
      // plan carries the fed rowCount (the root estimate degrades through
      // the agg/sort visitors — the strategy decisions read the leaves)
      val leaves = q9.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.nonEmpty && leaves.forall(_.stats.rowCount.isDefined),
        s"CBO must see fed rowCounts at the scans: ${leaves.map(_.stats)}")
      // leg 1 — TRUE stats: everything at sf0.001 sits under the broadcast
      // threshold, so the reordered plan must be all-broadcast (zero SMJ)
      val tiny = q9.queryExecution.sparkPlan
      assert(collectWithSubqueries(tiny) { case j: BroadcastHashJoinExec => j }.nonEmpty
        && collectWithSubqueries(tiny) { case j: SortMergeJoinExec => j }.isEmpty,
        s"true (tiny) stats must keep every join broadcast:\n$tiny")
      // and the lane's answer is byte-identical to the parquet-path lane
      // (tpch_q9_product_profit stays green with stats in play)
      val fromCatalog = q9.collect().map(_.toString).toSeq
      val direct = graft.queries.Relational
        .queries("tpch_q9_product_profit")(spark, d).collect().map(_.toString).toSeq
      assert(fromCatalog === direct)
      // leg 2 — SCALE-truthful stats (the 100 TB layout this plan must
      // survive): facts measured huge, dims unchanged. The strategy must
      // flip exactly where the stats say: fact⋈fact joins to SMJ, every
      // broadcast build side a dimension, the facts only ever streaming.
      CboStats.feed(spark, "cbo_tpch_lineitem", rows = 6000000000L,
        sizeInBytes = Some(400L * 1024 * 1024 * 1024))
      CboStats.feed(spark, "cbo_tpch_orders", rows = 1500000000L,
        sizeInBytes = Some(100L * 1024 * 1024 * 1024))
      // regression fence for the empty-interval trap (see CboStats.feed):
      // with min/max fed, no equi-join on profiled keys may estimate zero
      q9.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
          assert(j.stats.rowCount.forall(_ > 0),
            s"join estimated zero rows — NDV-only stats poison the interval check: $j")
      }
      val atScale = q9.queryExecution.sparkPlan
      assert(collectWithSubqueries(atScale) { case j: SortMergeJoinExec => j }.nonEmpty,
        s"the lineitem⋈orders join must shuffle under fact-scale stats:\n$atScale")
      collectWithSubqueries(atScale) { case j: BroadcastHashJoinExec => j }.foreach { j =>
        val build = if (j.buildSide.toString.contains("Left")) j.left else j.right
        assert(!build.toString.contains("cbo_tpch_lineitem") &&
          !build.toString.contains("cbo_tpch_orders"),
          s"facts must stream, never broadcast, under scale stats:\n$atScale")
      }
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", prevReorder)
    }
  }

  test("equi-depth histogram stats fix a skew-blind filter estimate and flip the join strategy") {
    import spark.implicits._
    // skewed fact: 90% of the rows carry v=0, the tail spreads over 2000
    // distinct values — the distribution where rows/NDV prices an
    // equality on the HEAVY value at ~10 rows instead of ~18000
    spark.sql("DROP TABLE IF EXISTS cbo_skew")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "cbo_skew")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    (0 until 20000).map(i =>
        (i.toLong, if (i < 18000) 0L else (i - 18000 + 1).toLong))
      .toDF("id", "v").write.saveAsTable("cbo_skew")
    recreate("cbo_probe", 5000)

    // interval + NDV stats first (the r11 baseline the histogram extends)
    CboStats.feedFromProfile(spark, "cbo_skew", Seq("id", "v"))
    CboStats.feedFromProfile(spark, "cbo_probe", Seq("id"))

    def filtered = spark.table("cbo_skew").filter(col("v") === 0L)
    def plan = filtered.join(spark.table("cbo_probe"), "id")
      .groupBy(col("grp")).agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan
    val prevCbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024).toString)
      // without a histogram the uniform model estimates rows/NDV ≈ 10 —
      // the filtered side reads as broadcastable
      val blindRows = filtered.queryExecution.optimizedPlan.stats.rowCount.get
      assert(blindRows <= BigInt(200),
        s"uniform model should underestimate the heavy value, got $blindRows")
      val blind = plan
      assert(collectWithSubqueries(blind) { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"skew-blind stats should broadcast the 18000-row filter result:\n$blind")
      val blindAnswer = filtered.join(spark.table("cbo_probe"), "id")
        .groupBy(col("grp")).agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet

      // the histogram walks the bins: 18 of 20 hold only v=0, so the
      // estimate lands near the true 18000 and the broadcast flips to SMJ
      val hist = CboStats.feedHistogram(spark, "cbo_skew", "v", "id", buckets = 20)
      assert(hist.bins.length === 20)
      val informedRows = filtered.queryExecution.optimizedPlan.stats.rowCount.get
      assert(informedRows >= BigInt(15000) && informedRows <= BigInt(20000),
        s"histogram estimate must land near the true 18000, got $informedRows")
      val informed = plan
      assert(collectWithSubqueries(informed) { case j: SortMergeJoinExec => j }.nonEmpty
        && collectWithSubqueries(informed) { case j: BroadcastHashJoinExec => j }.isEmpty,
        s"histogram-priced 18000-row side must not broadcast:\n$informed")
      // the catalog column stat kept its interval/NDV fields through the
      // histogram refresh (the wipe regression feedHistogram guards)
      val cs = spark.sessionState.catalog
        .getTableMetadata(TableIdentifier("cbo_skew")).stats.get.colStats("v")
      assert(cs.histogram.isDefined && cs.distinctCount.isDefined &&
        cs.min.isDefined && cs.max.isDefined,
        s"histogram refresh must merge, not replace: $cs")
      // and the answer is plan-independent
      val informedAnswer = filtered.join(spark.table("cbo_probe"), "id")
        .groupBy(col("grp")).agg(count(lit(1)).as("n"))
        .collect().map(_.toSeq).toSet
      assert(informedAnswer === blindAnswer)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", prevCbo)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }
}
