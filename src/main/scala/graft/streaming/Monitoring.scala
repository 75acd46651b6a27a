package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** One query's latest progress snapshot. */
final case class QueryHealth(
    name: String,
    batchId: Long,
    numInputRows: Long,
    processedRowsPerSecond: Double,
    alive: Boolean,
    error: Option[String])

/** R5/R9: health + metrics via `StreamingQueryListener` — the engine
  * analog of the reference's background sink health checks
  * (`KinesisSink.scala:372-420`) and StatsD registry
  * (`Collector.scala:138-160`). The collector polls its sinks; Spark
  * pushes progress events, so health is a fold over the event stream:
  * a query is healthy while it has no terminal exception. A metrics
  * exporter (StatsD etc.) would subscribe to the same snapshots.
  */
final class PipelineMonitor extends StreamingQueryListener {

  private val state = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, QueryHealth]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    state.put(e.id, QueryHealth(Option(e.name).getOrElse(e.id.toString), -1, 0, 0.0, alive = true, None))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    state.put(p.id, QueryHealth(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      p.processedRowsPerSecond, alive = true, None))
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    val prev = Option(state.get(e.id))
    state.put(e.id, prev.getOrElse(
      QueryHealth(e.id.toString, -1, 0, 0.0, alive = false, None))
      .copy(alive = false, error = e.exception))
  }

  /** Snapshot for a health endpoint / metrics export. */
  def snapshot: Map[String, QueryHealth] = {
    import scala.jdk.CollectionConverters._
    state.asScala.values.map(q => q.name -> q).toMap
  }

  /** The `/health` semantic: no tracked query died with an exception. */
  def healthy: Boolean = {
    import scala.jdk.CollectionConverters._
    state.asScala.values.forall(q => q.error.isEmpty)
  }
}
