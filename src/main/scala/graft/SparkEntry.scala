package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (one entry per capability in
  * SURVEY §2 / §7.3); `oracleSql` is the DuckDB-equivalent SQL for each
  * SQL-expressible entry. Column names and row order are aligned between the
  * two on purpose — the driver hash-compares values after sorting columns by
  * name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue by nation: the canonical fact⋈dims join-aggregate, with the
    * dimension side broadcast so the lineitem scan never shuffles for it.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val n = Tables.nation(spark, d)
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
    val l = Tables.lineitem(spark, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("n_name"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RefShapes.queries ++
      graft.queries.Relational.queries ++
      graft.queries.FuncShapes.queries ++
      graft.queries.Streams.queries ++
      graft.queries.Extensions.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check for those).
    */
  def oracleSql: Map[String, String] =
    graft.queries.RefShapes.oracles ++
      graft.queries.Relational.oracles ++
      graft.queries.FuncShapes.oracles ++
      graft.queries.Streams.oracles ++
      graft.queries.Extensions.oracles
}
