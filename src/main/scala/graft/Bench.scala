package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-listing paths so the first timed query
    // isn't charged session startup.
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full computation of every output column (count() would let
      // Catalyst prune unreferenced projections and under-report the work)
      val ok = try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // 3-decimal per-query times keep the full line compact (the driver
    // captures a bounded output tail; a 4 KB line risks truncation).
    // Locale.ROOT: the f-interpolator would use the default locale and
    // emit comma decimals (invalid JSON) on e.g. de_DE JVMs.
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    }.mkString("{", ",", "}")
    // -1.0 marks a failed query; exclude the sentinel from the wall total and
    // surface the failure count instead of silently shrinking the aggregate.
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failures = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    // short summary LAST: even if the long line overflows the captured
    // tail, this complete record (same metric contract, no per-query map)
    // lands inside it and stays parseable
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
