package graft.api

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** SURVEY.md §3.2 lifecycle-hook mapping: the reference fires
  * JobStarted/JobCompleted callbacks around each mapper job [U]; on Spark,
  * action-level completion is observable through a QueryExecutionListener.
  * This bridge records one event per completed action (query name unknown to
  * Spark, so callers tag via the function name) and surfaces failures.
  */
final case class CompletedAction(funcName: String, durationNs: Long,
    error: Option[String])

class LifecycleBridge extends QueryExecutionListener {
  private val events = new ConcurrentLinkedQueue[CompletedAction]()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    events.add(CompletedAction(funcName, durationNs, None))

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    events.add(CompletedAction(funcName, 0L, Some(exception.getMessage)))

  def completed: Seq[CompletedAction] = {
    import scala.jdk.CollectionConverters._
    events.asScala.toSeq
  }
  def clear(): Unit = events.clear()
}

object LifecycleBridge {
  /** Install a bridge on the session; returns it for inspection. */
  def install(spark: SparkSession): LifecycleBridge = {
    val b = new LifecycleBridge
    spark.listenerManager.register(b)
    b
  }
}
