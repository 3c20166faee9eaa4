package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale pattern proof: AQE's runtime skew-join handling. SkewJoin.saltedJoin
  * is the manual fix for broadcast-ineligible skew; this spec shows the
  * automatic one — at execution time AQE measures the shuffled partition
  * sizes, detects that one join key dwarfs the median, and splits that
  * partition across multiple tasks (`skew=true` in the final plan). On a
  * 1000-executor cluster this is what turns a single straggler task into
  * parallel work without touching the query. */
class AdaptiveSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      // force a shuffled join and lower the skew thresholds so the test's
      // ~MB-scale hot key trips the same detection a TB-scale key would
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      // 95% of the big side lands on key 7; the small side is uniform
      val big = spark.range(200000)
        .select(when(col("id") < 190000, 7L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val small = spark.range(1000)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = big.join(small, "k")
      // materialize THIS frame (count() would execute a different plan and
      // leave joined's AQE plan un-finalized)
      val n = joined.collect().length
      // ids 0..189999 collapse to key 7 (matches small's single key-7 row);
      // ids >= 190000 keep their id, beyond small's 0..999 range — no match
      assert(n === 190000, s"unexpected row count $n")

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join (plan: ${plan.take(2000)})")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
      }
    }
  }
}
