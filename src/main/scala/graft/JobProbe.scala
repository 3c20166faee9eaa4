package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Measurement main (guide §1): count Spark JOBS / STAGES / TASKS a lane
  * submits per execution, plus wall time — the scheduling-floor breakdown
  * for latency-bound lanes (VERDICT r17 #1: the iterative lanes are bound
  * by blocking driver round trips, not compute).
  *
  *   tools/run_main.sh graft.JobProbe <lane> [<lane> ...]
  */
object JobProbe {
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
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
      }
    })
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { lane =>
      run(lane) // warm-up
      Thread.sleep(300) // let listener events drain
      jobs.set(0); stages.set(0); tasks.set(0L)
      val secs = Seq.fill(3)(run(lane))
      Thread.sleep(500)
      val med = secs.sorted.apply(1)
      println(f"JOBPROBE $lane%-34s med=$med%.3f jobs=${jobs.get / 3.0}%.1f stages=${stages.get / 3.0}%.1f tasks=${tasks.get / 3.0}%.0f")
    }
    spark.stop()
  }
}
