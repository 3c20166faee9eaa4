package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per suite; small
  * parallelism + few shuffle partitions keep unit runs fast.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  @transient protected lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // session invariant (see ext/BucketedLayout.scala): bucketed scans
    // report their sortBy order -> zero-sort SMJ on one-file buckets
    .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
    .getOrCreate()
}
