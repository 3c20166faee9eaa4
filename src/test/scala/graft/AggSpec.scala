package graft

import org.apache.spark.sql.functions._

/** approx_count_distinct has no cross-engine oracle (HLL implementations
  * differ); its contract is the relative-error bound, verified here against
  * exact distinct counts. */
class AggSpec extends SparkSpec {

  test("approx_count_distinct within HLL error bound of exact counts") {
    val d = "/root/testdata/sf0.01"
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact"))
    val approx = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
    val joined = exact.join(approx, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (e, a) = (r.getAs[Long]("exact"), r.getAs[Long]("approx"))
      val relErr = math.abs(a - e).toDouble / e
      assert(relErr < 0.05, s"${r.getString(0)}: exact=$e approx=$a relErr=$relErr")
    }
  }
}
