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
}
