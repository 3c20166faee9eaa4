package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement main: list every job a lane submits (description + task
  * count + duration) — the per-job breakdown behind JobProbe's counts. */
object JobListProbe {
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
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.getOrDefault(j.jobId, 0L)
        val ms = if (t0 == 0) -1.0 else (System.nanoTime() - t0) / 1e6
        events.add(f"  job ${j.jobId}%3d ${ms}%7.1f ms")
      }
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        events.add(s"    stage ${s.stageInfo.stageId} tasks=${s.stageInfo.numTasks} " +
          s.stageInfo.name.take(90))
    })
    args.foreach { lane =>
      val fn = SparkEntry.queries(lane)
      fn(spark, sfDir).write.mode("overwrite").format("noop").save() // warm
      Thread.sleep(500)
      events.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      println(f"LANE $lane $secs%.3f s, ${events.size} events")
      events.forEach(e => println(e))
    }
    spark.stop()
  }
}
