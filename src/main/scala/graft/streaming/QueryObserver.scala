package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Streaming observability — the Spark rendering of the reference's
  * meta-channel LoggingListener (SURVEY.md §3.3,
  * `/root/reference/subscriber/.../LoggingListener.java:24-45` and the
  * per-record debug prints `worker/lambda/app.py:92-93,110-111`): one
  * listener per session surfaces lifecycle + per-batch progress (rows in,
  * duration, watermark) instead of per-record prints — at 100 TB a
  * per-record log IS the bottleneck. */
final class QueryObserver extends StreamingQueryListener {

  final case class BatchStat(queryName: String, batchId: Long, numInputRows: Long,
      durationMs: Long)

  private val stats = new ConcurrentLinkedQueue[BatchStat]()
  private val startedN = new java.util.concurrent.atomic.AtomicInteger
  private val terminatedN = new java.util.concurrent.atomic.AtomicInteger
  def started: Int = startedN.get
  def terminated: Int = terminatedN.get

  def batches: Seq[BatchStat] = {
    val it = stats.iterator()
    val b = Seq.newBuilder[BatchStat]
    while (it.hasNext) b += it.next()
    b.result()
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = startedN.incrementAndGet()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    stats.add(BatchStat(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)))
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = terminatedN.incrementAndGet()
}

object QueryObserver {
  /** Attach a fresh observer to the session; returns it for inspection. */
  def attach(spark: SparkSession): QueryObserver = {
    val o = new QueryObserver
    spark.streams.addListener(o)
    o
  }

  def detach(spark: SparkSession, o: QueryObserver): Unit =
    spark.streams.removeListener(o)
}
