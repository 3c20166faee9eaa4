package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table loader over the driver-generated parquet dirs
  * (`/root/testdata/sf*`, schemas in FIXTURES.md §B).
  *
  * At 100 TB these reads would be partitioned parquet scans on a real
  * cluster; everything downstream is declared so Catalyst pushes
  * filters/projections into the scan (`PushedFilters`/`ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet has shipped `ts` two ways across driver generations:
    * TIMESTAMP(NANOS) (read as LONG nanos under
    * `spark.sql.legacy.parquet.nanosAsLong`) and plain µs TIMESTAMP
    * (isAdjustedToUTC=false, which Spark 4 reads as TIMESTAMP_NTZ).
    * Normalize both to the same layout every consumer already uses:
    * (event_id, ts_ns LONG, user_id, event_type, value, props,
    * ts TIMESTAMP) — `ts` µs-precision session-zone TimestampType
    * (UTC everywhere here, so the NTZ cast is value-preserving and
    * matches DuckDB's naive-timestamp reading of the same file).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ =>
        // derive, don't enumerate: withColumn preserves whatever other
        // columns a future file generation carries (the LONG branch is
        // already generic; a hardcoded 6-column select here silently
        // dropped additions and threw on renames)
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
