package graft.core

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine-side query metrics (SURVEY.md §2.8 F7: the reference hand-times
  * chunks with `time()` deltas and prints them,
  * `citibike_project/etl/ingest_data.py:173-182` — here the engine records
  * execution wall time per action via a QueryExecutionListener instead of
  * row-level math).
  */
final class Metrics extends QueryExecutionListener {

  final case class Record(funcName: String, durationNs: Long, failed: Boolean)

  private val records = new ConcurrentLinkedQueue[Record]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    records.add(Record(funcName, durationNs, failed = false))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    records.add(Record(funcName, -1L, failed = true))

  def snapshot(): Seq[Record] = {
    import scala.jdk.CollectionConverters._
    records.asScala.toSeq
  }
}

object Metrics {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): Metrics = {
    val m = new Metrics
    spark.listenerManager.register(m)
    m
  }
}
