package graft

import org.apache.spark.sql.SparkSession

/** Measurement main (guide §1/§2.2): A/B a session-level AQE setting over
  * named lanes inside ONE JVM, so codegen/JIT/page-cache warmth cancel out.
  *
  * The hypothesis under test (VERDICT r17 #5): with
  * `coalescePartitions.parallelismFirst=true` (the default) AQE refuses to
  * coalesce KB-sized reduce stages below the session parallelism, so at
  * sf0.1 every tiny exchange pays 32-task scheduling — the reason the r17
  * suite ran FASTER on 8 cores than 32. `parallelismFirst=false` makes AQE
  * honor `advisoryPartitionSizeInBytes` (a BYTE target, scale-neutral —
  * the Spark docs themselves recommend false).
  *
  *   tools/run_main.sh graft.AqeProbe <lane> [<lane> ...]
  */
object AqeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def med3(name: String): Double = {
      time(name) // warm-up
      Seq.fill(3)(time(name)).sorted.apply(1)
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val key = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
    args.foreach { lane =>
      spark.conf.set(key, "true")
      val a = med3(lane)
      spark.conf.set(key, "false")
      val b = med3(lane)
      // second pass in reverse order so JIT-warmth asymmetry can't fake a win
      val b2 = med3(lane)
      spark.conf.set(key, "true")
      val a2 = med3(lane)
      println(s"PROBE $lane pFirst=true ${fmt(a)}/${fmt(a2)}  pFirst=false ${fmt(b)}/${fmt(b2)}")
    }
    spark.stop()
  }
}
