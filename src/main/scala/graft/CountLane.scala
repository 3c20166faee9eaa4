package graft

import org.apache.spark.sql.SparkSession

/** Counts one declared lane's result rows on a given sf dir (dev tool:
  * output-cardinality evidence for the output-driven lane class — e.g.
  * true near-dup pairs per scale point, PLANS.md r15). */
object CountLane {
  def main(args: Array[String]): Unit = {
    val (lane, dir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"LANE_COUNT $lane $dir ${SparkEntry.queries(lane)(spark, dir).count()}")
    spark.stop()
  }
}
