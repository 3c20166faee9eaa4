package graft

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot check (r18): do `Dataset.observe` metrics become available when
  * the observed frame is materialized by an EAGER `localCheckpoint()` (the
  * iterative loops' barrier), rather than by a collect/write action?
  * `Dataset.checkpoint` runs under `withAction`, which should fire the
  * QueryExecutionListener that Observation waits on — verify before the
  * convergence counts in Graph.pageRank / Dedup.connectedComponents are
  * folded into their barrier jobs on that assumption.
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val obs = Observation()
    val df = (1 to 1000).toDF("x")
      .observe(obs, sum(when(col("x") % 2 === 0, 1L).otherwise(0L)).as("evens"))
      .localCheckpoint()
    // if the listener never fires this get() hangs; bound it
    val t = new Thread(() => {
      println(s"OBS RESULT: ${obs.get.mkString(", ")}")
    })
    t.setDaemon(true)
    t.start()
    t.join(15000)
    if (t.isAlive) println("OBS TIMEOUT: metrics not delivered by localCheckpoint")
    println(s"rows=${df.count()}")
    // after a real action, try again in case the checkpoint didn't deliver
    val t2 = new Thread(() => println(s"OBS AFTER COUNT: ${obs.get.mkString(", ")}"))
    t2.setDaemon(true); t2.start(); t2.join(5000)
    if (t2.isAlive) println("OBS STILL NOT DELIVERED after count()")
    spark.stop()
  }
}
