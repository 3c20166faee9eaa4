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
    // Reproducible methodology (VERDICT r4): per query, one untimed warm-up
    // pass (file listing, codegen compile, broadcast build) then `reps` timed
    // runs, reporting the MEDIAN. Single-run walls on a shared box vary up to
    // 7x with no code change (r3->r4 q8/q9), so round-over-round comparisons
    // need the median and the warm-up to mean anything.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // noop sink: full computation of every output column (count() would let
      // Catalyst prune unreferenced projections and under-report the work)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val timed = try { run(); Seq.fill(reps)(run()) }
        catch { case _: Throwable => Seq.empty }
      name -> (if (timed.nonEmpty) median(timed) else -1.0)
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
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"reps":$reps,"queries":$qs,"sf":"$sfDir"}""")
    // short summary LAST under a DISTINCT metric name (a consumer
    // aggregating by metric must not double-count the wall total): even if
    // the long line overflows the captured tail, this complete record lands
    // inside it and stays parseable
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","failures":$failures,"reps":$reps,"n_queries":${results.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
