package graft

import org.apache.spark.sql.functions._

/** Scale pattern proof: bucketed tables co-locate join keys at write time,
  * so the fact-fact join (orders ⋈ lineitem — the one join broadcast can't
  * fix) runs with ZERO shuffle exchanges at read time. On a 100 TB corpus
  * this is the difference between re-shuffling both fact tables on every
  * query and shuffling once at ingest. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans no shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, d).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, d).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      // the final groupBy(o_orderstatus) legitimately shuffles on its own
      // key; the JOIN keys must not appear in any exchange
      def joinKeyExchanges(plan: String): Int =
        "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r.findAllIn(plan).size
      assert(joinKeyExchanges(joined.queryExecution.executedPlan.toString) === 0,
        "bucketed join must not shuffle on the join keys")

      // same join unbucketed DOES shuffle — proves the assertion has teeth
      val unbucketed = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      unbucketed.collect()
      assert(joinKeyExchanges(unbucketed.queryExecution.executedPlan.toString) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
