package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Structured Streaming semantics: windowed aggregations over a
  * MemoryStream agree with the batch equivalents, watermark drops late
  * data, stateful dedup removes watermark-bounded duplicates.
  */
class StreamingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private case class Ev(ts: Timestamp, event_type: String, value: Double, event_id: Long, user_id: Long)
  private def t(minutes: Long) = new Timestamp(1700000000000L + minutes * 60000L)

  test("tumbling hourly counts match batch over same data") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val events = mem.toDF()
    val q = EventStreams.hourlyCounts(events)
      .writeStream.outputMode("complete").format("memory").queryName("hourly").start()
    try {
      mem.addData(Ev(t(0), "a", 1.0, 0, 1), Ev(t(10), "a", 2.0, 1, 1),
        Ev(t(70), "a", 4.0, 2, 1), Ev(t(75), "b", 8.0, 3, 2))
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select($"win_start", $"event_type", $"n", $"sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      // structural check: two 'a' windows + one 'b' window, counts correct
      assert(got.size == 3)
      assert(got.exists { case (_, et, n, s) => et == "a" && n == 2 && s == 3.0 })
      assert(got.exists { case (_, et, n, s) => et == "a" && n == 1 && s == 4.0 })
      assert(got.exists { case (_, et, n, s) => et == "b" && n == 1 && s == 8.0 })
    } finally q.stop()
  }

  test("session windows split on inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionCounts(mem.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("sess").start()
    try {
      mem.addData(Ev(t(0), "a", 1.0, 0, 1), Ev(t(10), "a", 1.0, 1, 1),
        Ev(t(60), "a", 1.0, 2, 1)) // 50min gap -> new session
      q.processAllAvailable()
      val got = spark.table("sess").collect()
      assert(got.length == 2)
      assert(got.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("file stream over harness events agrees with batch hourly windows") {
    val stream = EventStreams.fileStream(spark, sfDir, Some("events.parquet"))
    val q = EventStreams.hourlyCounts(stream)
      .writeStream.outputMode("complete").format("memory").queryName("filehourly").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("filehourly")
        .select($"win_start", $"event_type", $"n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.operators.Events.q21HourlyWindows(spark, sfDir)
        .select($"win_start", $"event_type", $"n")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes dup event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.dedupedStream(mem.toDF())
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      mem.addData(Ev(t(0), "a", 1.0, 100, 1), Ev(t(1), "a", 1.0, 100, 1),
        Ev(t(2), "b", 1.0, 101, 2))
      q.processAllAvailable()
      assert(spark.table("dedup").count() == 2)
    } finally q.stop()
  }
}
