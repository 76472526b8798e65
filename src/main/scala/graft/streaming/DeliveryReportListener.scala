package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** The reference's delivery-report side channel (the background goroutine
  * draining `producer.Events()` and logging per-message success/failure,
  * main.go:50-62) in its Spark form: a `StreamingQueryListener` observing
  * per-epoch progress — rows/s in and out per micro-batch, plus terminal
  * failure (R13, main.go:160-162). Observability, not dataflow: it never
  * touches the hot path.
  *
  * GRANULARITY DIVERGENCE (the one R-op whose granularity differs from
  * the reference): the reference logs topic/partition/offset PER MESSAGE;
  * Spark's listener surface is per MICRO-BATCH epoch, because the engine
  * owns the producer and per-record acks never reach user code. The
  * per-epoch report subsumes the per-message one for delivery accounting
  * (a failed record fails its epoch, which retries atomically under
  * checkpointing — there is no per-message partial-failure state to
  * report), but per-message offset logging is not reproducible without a
  * custom sink; consumers needing offsets should read them from Kafka.
  */
class DeliveryReportListener extends StreamingQueryListener {

  /** (batchId, numInputRows) per completed epoch — the "delivery report". */
  val reports = new ConcurrentLinkedQueue[(Long, Long)]()
  @volatile var terminalError: Option[String] = None

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    reports.add((p.batchId, p.numInputRows))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    terminalError = event.exception
}
