package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Structured Streaming surface over the `events` shape (SURVEY.md §2.9):
  * watermarked tumbling/sliding windows, session windows, stateful dedup.
  * The reference's only "stream" is a chunk-at-a-time pull loop
  * (`citibike_project/etl/ingest_data.py:168-181`) — these are the real
  * micro-batch equivalents, and the batch queries in graft.operators.Events
  * (q21-q23) define the semantics they must agree with (tested in
  * StreamingSpec by running both over the same data).
  *
  * All aggregations here are watermark-bounded, so state is finite at any
  * scale: windows older than the watermark are emitted and dropped.
  */
object EventStreams {

  /** File-based stream over events-shaped parquet. Schema must be declared
    * for streaming reads; ts arrives as raw nanos (see Tables.events) and
    * is truncated to micros the same way.
    */
  def fileStream(spark: SparkSession, dir: String, globFilter: Option[String] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val r = spark.readStream.schema(Schemas.eventsRaw)
    globFilter.foreach(g => r.option("pathGlobFilter", g))
    r.parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour windowed counts/sums with a 2-hour watermark —
    * the streaming form of q21HourlyWindows.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding 2h/1h windows — streaming form of q22SlidingWindows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("win"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("n"))

  /** Session windows with a 30-minute inactivity gap per user — streaming
    * form of q23Sessionize (same gap).
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("session_start"), col("win.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Stateful dedup by event_id bounded by the watermark — the streaming
    * idempotent-load guard (reference's moral equivalent: skip-if-exists,
    * `citibike_project/etl/ingest_data.py:259-262`).
    */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
}
