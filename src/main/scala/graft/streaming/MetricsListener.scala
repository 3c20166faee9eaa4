package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Progress metrics for the load path — the Spark-native home of the
  * reference's per-block info logging (payload size/type per processed
  * block, `src/loader.rs:164-172`, and the tracing setup of
  * `src/logging.rs`). Structured Streaming already aggregates per-batch
  * rows/duration/state metrics; this listener records them (bounded ring)
  * and logs one line per batch, instead of hand-rolled per-row logging that
  * would serialize the hot path.
  *
  * Output format is env-switched like the reference's `LogConfig`
  * (`src/logging.rs:22-42`): under an orchestrator (`K_SERVICE` or
  * `KUBERNETES_SERVICE_HOST` set) batches log as structured JSON
  * (the Stackdriver-layer analog); otherwise as a human-readable line.
  */
class MetricsListener(keep: Int = 100,
    env: String => Option[String] = sys.env.get) extends StreamingQueryListener {
  import MetricsListener.BatchMetric

  /** prod = structured logging, matching LogConfig::new's detection. */
  val structured: Boolean =
    env("K_SERVICE").isDefined || env("KUBERNETES_SERVICE_HOST").isDefined

  def formatLine(m: BatchMetric): String = {
    // Spark reports NaN/Infinity rates for 0-row/0-ms triggers; neither is a
    // valid JSON token, so the structured lane emits null for them
    val rate =
      if (java.lang.Double.isFinite(m.processedRowsPerSecond)) m.processedRowsPerSecond.toString
      else "null"
    if (structured)
      s"""{"batch":${m.batchId},"rows":${m.numInputRows},""" +
        s""""rows_per_sec":$rate,"duration_ms":${m.durationMs}}"""
    else
      f"batch ${m.batchId}: ${m.numInputRows} rows, " +
        f"${m.processedRowsPerSecond}%.1f rows/s, ${m.durationMs} ms"
  }

  private val ring = new ConcurrentLinkedQueue[BatchMetric]()

  def recent: Seq[BatchMetric] = {
    import scala.jdk.CollectionConverters._
    ring.iterator().asScala.toSeq
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val m = BatchMetric(p.batchId, p.numInputRows, p.processedRowsPerSecond,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L))
    ring.add(m)
    while (ring.size() > keep) ring.poll()
    println(formatLine(m))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}

object MetricsListener {
  final case class BatchMetric(batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double, durationMs: Long)
}
